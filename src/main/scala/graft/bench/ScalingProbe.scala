package graft.bench

import graft.core.{DocPipeline, FixtureGen}
import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession

/** Dev probe: isolate which layer stops scaling 8→32 cores.
  *   A: pure arithmetic loop (machine/JVM ceiling)
  *   B: generate page + full DocPipeline.process, no Spark IO (GC/alloc)
  *   C: B but reading pages from parquet (adds scan)
  * Usage: runMain graft.bench.ScalingProbe [nPages]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 400000L
    val model = KgPipeline.fixtureModel()
    Seq(8, 32).foreach { cpus =>
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"probe$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      import spark.implicits._
      val bc = spark.sparkContext.broadcast(model)
      spark.range(0, 1000, 1, 32).map(_ * 2).count() // warm
      def time(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        // scalastyle:off println
        println(f"[probe] cpus=$cpus $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // scalastyle:on println
      }
      time("A-arith") {
        spark.range(0, 32L * 80000000L, 1, 256).mapPartitions { it =>
          var h = 0L
          it.foreach(i => h ^= (i * 0x9e3779b97f4a7c15L) >>> 17)
          Iterator.single(h)
        }.count()
      }
      time("B-docpipe") {
        spark.range(0, n, 1, 256).mapPartitions { it =>
          val m = bc.value
          it.map { id =>
            val p = FixtureGen.page(id)
            DocPipeline.process(p.html, m.gaz, m.aliasMap,
              FixtureGen.profileWords).triples.length
          }
        }.agg("value" -> "sum").count()
      }
      // C: native codegen'd cosine vs composable HOF, all-pairs 2000²×64
      import org.apache.spark.sql.functions.col
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val l = emb.select(col("vec_id").as("i"), col("embedding").as("a"))
      val r = emb.select(col("vec_id").as("j"), col("embedding").as("b"))
      val pairs = l.crossJoin(r)
      time("C-cos-native") {
        pairs.select(graft.operators.Similarity.cosine(col("a"), col("b"))
          .as("c")).agg("c" -> "sum").count()
      }
      time("C-cos-hof") {
        pairs.select(graft.operators.Similarity.cosineHof(col("a"), col("b"))
          .as("c")).agg("c" -> "sum").count()
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
