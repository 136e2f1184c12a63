package graft.bench

import graft.operators.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: fixpoint round counts + wall for the two oracled CC
  * topologies (q63 disjoint chains vs q88 bridged chains) at a given
  * sf dir — separates "more rounds" from "slower rounds". */
object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the SHARED topology builders (graft.queries.PipelineQueries) — a
    // retuned q63/q88 graph automatically retunes this probe
    val c = spark.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey").cast("long").as("k"))
    val chains = graft.queries.PipelineQueries.chainEdges(c)
    val bridged = graft.queries.PipelineQueries.bridgedChainEdges(c)
    // same-window A/B of the two round stores (default localCheckpoint
    // vs durable parquet) — interleaved so box noise hits both legs
    for ((name, e) <- Seq("q63-chains" -> chains, "q88-bridged" -> bridged);
         trial <- 1 to 2; durable <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val h = ConnectedComponents.runManaged(spark, e, durable = durable)
      val n = h.labels.count()
      val w = (System.nanoTime() - t0) / 1e9
      val store = if (durable) "parquet" else "localckpt"
      // scalastyle:off println
      println(f"[ccprobe] $name%-12s $store%-9s trial=$trial rounds=${h.rounds} nodes=$n wall=$w%.2f s")
      // scalastyle:on println
      h.close()
    }
    spark.stop()
  }
}
