package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Ingest entrypoint: materialize the Common-Crawl-style `pages` table,
  * bucketed by `pmod(xxhash64(url), numBuckets)` (the Iceberg bucket
  * transform / north_rule's range-partitioned shuffle by url-hash).
  * In this sandbox pages are the deterministic synthetic fixtures; on a
  * real cluster this step would read WARC crawl output instead — the
  * bucketing write is the same.
  *
  *   spark-submit --class graft.pipeline.PagesIngest <jar> \
  *     <outDir> <nPages> [numBuckets] [genPartitions]
  */
object PagesIngest {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PagesIngest <outDir> <nPages> " +
      "[numBuckets] [genPartitions]")
    val outDir = args(0)
    val nPages = args(1).toLong
    val numBuckets = if (args.length > 2) args(2).toInt
      else Icebergish.DefaultBuckets
    val parts = if (args.length > 3) args(3).toInt else 256

    val spark = SparkSession.builder()
      .appName("graft-pages-ingest")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = FixtureSpark.pages(spark, nPages, parts)
    Icebergish.write(Icebergish.withBucket(pages.toDF(), numBuckets), outDir)
    // scalastyle:off println
    println(s"""{"pages":$nPages,"buckets":$numBuckets,"dir":"$outDir"}""")
    // scalastyle:on println
    spark.stop()
  }
}
