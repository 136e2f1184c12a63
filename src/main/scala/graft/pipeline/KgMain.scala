package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Production spark-submit entrypoint for the resumable KG job
  * (north_rule: "run via spark-submit on a multi-executor cluster").
  *
  *   spark-submit --class graft.pipeline.KgMain <jar> \
  *     <pagesDir> <outDir> [runId] [numBuckets]
  *
  * Reads the bucketed pages table, skips buckets already recorded in the
  * output's `_manifest`, runs the narrow KG path, writes bucketed triples
  * + manifest rows. Re-running after a failure resumes exactly where it
  * stopped; re-running after success is a no-op. In this sandbox the
  * entity/alias tables are the deterministic fixtures; on a real cluster
  * they'd be read from their own Iceberg tables — same DataFrame shape.
  */
object KgMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: KgMain <pagesDir> <outDir> [runId] [numBuckets]")
    val pagesDir = args(0)
    val outDir = args(1)
    val runId = if (args.length > 2) args(2)
      else s"run-${java.util.UUID.randomUUID().toString.take(8)}"
    val numBuckets = if (args.length > 3) args(3).toInt
      else Icebergish.DefaultBuckets

    val spark = SparkSession.builder()
      .appName("graft-kg-pipeline")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = Icebergish.runResumable(spark, pagesDir, outDir,
      FixtureSpark.entities(spark), FixtureSpark.aliases(spark), runId,
      numBuckets)
    // scalastyle:off println
    println(s"""{"run_id":"$runId","pages_processed":$n}""")
    // scalastyle:on println
    spark.stop()
  }
}
