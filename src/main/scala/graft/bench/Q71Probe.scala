package graft.bench

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q71_math_transcendental's bench cost (flagged
  * 2.2x vs BENCH_r02 in round 3). Legs: scan-only, +transcendentals,
  * +round, +orderBy (the full query), each as the same noop write the
  * bench performs; 3 trials each after a warm-up. */
object Q71Probe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val li = Tables.lineitem(spark, d)
    val base = li.select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"), col("l_discount"), col("l_quantity"))
    val trans = li.select(col("l_orderkey"), col("l_linenumber"),
      log(col("l_extendedprice") + lit(1.0)).as("log_price"),
      exp(col("l_discount")).as("exp_disc"),
      pow(col("l_quantity"), lit(1.5)).as("qty_pow"))
    val rounded = li.select(col("l_orderkey"), col("l_linenumber"),
      round(log(col("l_extendedprice") + lit(1.0)), 6).as("log_price"),
      round(exp(col("l_discount")), 6).as("exp_disc"),
      round(pow(col("l_quantity"), lit(1.5)), 6).as("qty_pow"))
    val full = rounded.orderBy("l_orderkey", "l_linenumber")
    // project-after-sort: the range partitioner's sampling job executes
    // only the sort's child, so the BigDecimal round() runs ONCE
    val full2 = li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(log(col("l_extendedprice") + lit(1.0)), 6).as("log_price"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        round(pow(col("l_quantity"), lit(1.5)), 6).as("qty_pow"))
    noop(full) // warm
    val legs = Seq("scan" -> base, "trans" -> trans, "round" -> rounded,
      "full" -> full, "full2" -> full2)
    for ((name, df) <- legs) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(df); (System.nanoTime() - t0) / 1e9
      }
      // scalastyle:off println
      println(f"[q71probe] $name%-6s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      // scalastyle:on println
    }
    spark.stop()
  }
}
