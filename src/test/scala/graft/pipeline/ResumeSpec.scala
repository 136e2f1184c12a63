package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Resume idempotence (SURVEY.md §5.2.4, north_rule "resumable from
  * checkpoint with per-partition lineage + metrics"): run the pipeline,
  * wipe SOME output partitions but keep their manifest rows absent,
  * re-run, and the union equals a single full run; already-manifested
  * buckets are skipped. */
class ResumeSpec extends SparkTestBase {

  test("resumable run: second run processes only un-manifested buckets") {
    val tmp = java.nio.file.Files.createTempDirectory("graftresume").toString
    val pagesDir = s"$tmp/pages"
    val outDir = s"$tmp/out"
    val entities = FixtureSpark.entities(spark)
    val aliases = FixtureSpark.aliases(spark)

    // pages at rest, bucketed (16 buckets to keep the test fast)
    val pages = FixtureSpark.pages(spark, 200L, 4)
    Icebergish.write(
      Icebergish.withBucket(pages.toDF(), numBuckets = 16), pagesDir)

    // full run from scratch
    val n1 = Icebergish.runResumable(spark, pagesDir, outDir, entities,
      aliases, runId = "run1", numBuckets = 16)
    assert(n1 == 200L)
    val full = spark.read.parquet(s"$outDir/triples")
      .select("subj", "pred", "obj", "url").collect().toSet
    assert(full.nonEmpty)

    // all buckets manifested → resume is a no-op
    val n2 = Icebergish.runResumable(spark, pagesDir, outDir, entities,
      aliases, runId = "run2", numBuckets = 16)
    assert(n2 == 0L)

    // simulate a partial failure: drop manifest rows for half the buckets
    // and delete those output partitions
    val manifest = spark.read.parquet(Icebergish.manifestDir(outDir))
    val keep = manifest.where(col("bucket") < 8)
    val keptPath = s"$tmp/manifest_keep"
    keep.write.parquet(keptPath)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(Icebergish.manifestDir(outDir)),
      true)
    spark.read.parquet(keptPath).write
      .parquet(Icebergish.manifestDir(outDir))
    (8 until 16).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$outDir/triples/bucket=$b"),
        true)
    }

    // resume: must process exactly the pages of buckets 8..15
    val n3 = Icebergish.runResumable(spark, pagesDir, outDir, entities,
      aliases, runId = "run3", numBuckets = 16)
    assert(n3 > 0L && n3 < 200L, s"n3=$n3")

    val resumed = spark.read.parquet(s"$outDir/triples")
      .select("subj", "pred", "obj", "url").collect().toSet
    assert(resumed == full, "resumed output must equal the full run")

    // manifest has exactly one row per (stage, bucket) that exists
    val m = spark.read.parquet(Icebergish.manifestDir(outDir))
    val dup = m.groupBy("stage", "bucket").count().where(col("count") > 1)
    assert(dup.isEmpty)
  }
}
