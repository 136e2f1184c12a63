package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style table emulation (SURVEY.md §4.4).
  *
  * No `iceberg-spark-runtime` jar exists in this zero-egress sandbox, so an
  * Iceberg table is emulated as: a parquet directory hash-partitioned by
  * `bucket = pmod(xxhash64(url), numBuckets)` (the Iceberg `bucket(N, url)`
  * transform), written with dynamic partition overwrite for idempotent
  * re-runs, plus a `_manifest` parquet table carrying per-(stage, bucket)
  * lineage: watermark, row/byte counts, wall time, run id (north_rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  * The API is deliberately thin so a real Iceberg catalog can replace it on
  * a cluster without touching pipeline code.
  */
object Icebergish {

  val DefaultBuckets = 256

  def withBucket(df: DataFrame, numBuckets: Int = DefaultBuckets): DataFrame =
    df.withColumn("bucket", pmod(xxhash64(col("url")), lit(numBuckets)).cast("int"))

  /** Bucket-partitioned write; dynamic overwrite = re-running a subset of
    * buckets replaces exactly those partitions (idempotent resume).
    *
    * The repartition on `bucket` BEFORE partitionBy is load-bearing at
    * scale: without it every task writes a file into every bucket dir
    * (tasks × buckets tiny files — 65k files at 256×256, metadata death);
    * with it each bucket is written by exactly one task → one file per
    * bucket. This is the "range-partitioned shuffle by url-hash" the
    * north rule asks for. */
  def write(df: DataFrame, dir: String): Unit =
    df.repartition(col("bucket"))
      .write
      .partitionBy("bucket")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  // ---------------- manifest ----------------

  def manifestDir(dir: String): String = s"$dir/_manifest"

  /** One lineage row per (stage, bucket) processed in this run. */
  def appendManifest(spark: SparkSession, dir: String, stage: String,
      perBucket: DataFrame, runId: String, wallMs: Long): Unit = {
    perBucket
      .withColumn("stage", lit(stage))
      .withColumn("wall_ms", lit(wallMs))
      .withColumn("run_id", lit(runId))
      .select("stage", "bucket", "watermark", "rows", "bytes", "wall_ms",
        "run_id")
      .write.mode(SaveMode.Append).parquet(manifestDir(dir))
  }

  /** Buckets already completed for `stage` (any run). */
  def doneBuckets(spark: SparkSession, dir: String, stage: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(manifestDir(dir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) spark.emptyDataFrame.selectExpr()
      .withColumn("bucket", lit(0)).limit(0)
    else spark.read.parquet(manifestDir(dir))
      .where(col("stage") === stage)
      .select("bucket").distinct()
  }

  /** Resumable triple-extraction job over a bucketed pages table:
    *   0. resume filter — LEFT ANTI join pages' buckets vs manifest
    *   1-7. KgPipeline.triples (single narrow stage)
    *   8. bucketed write (dynamic overwrite) + manifest append
    * Returns the number of pages actually processed this run.
    */
  def runResumable(spark: SparkSession, pagesDir: String, outDir: String,
      entities: DataFrame, aliases: DataFrame, runId: String,
      numBuckets: Int = DefaultBuckets,
      prepared: Option[KgPipeline.Prepared] = None): Long = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val pagesAll = read(spark, pagesDir)
    val done = doneBuckets(spark, outDir, "triples")
    val todo = pagesAll.join(broadcast(done), Seq("bucket"), "left_anti")
    val todoPages = todo.select("url", "warc_ts", "html", "text", "lang")
      .as[Page]
    def mark(name: String, since: Long): Long = {
      if (sys.env.contains("GRAFT_BENCH_VERBOSE")) {
        // scalastyle:off println
        println(f"[phase] $name%-14s ${(System.nanoTime() - since) / 1e9}%.2f s")
        // scalastyle:on println
      }
      System.nanoTime()
    }
    var t = t0
    // count on the partition column only — no html bytes read
    val nPages = todo.select("bucket").count()
    t = mark("resume-count", t)
    if (nPages == 0) return 0L

    // triples inherit their page's bucket: same hash, same modulus — so
    // the manifest's resume unit (input bucket) and the output partition
    // line up one-to-one
    val prep = prepared.getOrElse(KgPipeline.prepare(spark, entities, aliases))
    val triples = KgPipeline.run(spark, todoPages, prep)
    val prepDone = mark("prepare", t)
    t = prepDone
    val out = withBucket(triples.toDF(), numBuckets)
    out.cache()
    write(out, s"$outDir/triples")
    t = mark("map+write", t)

    val wallMs = (System.nanoTime() - t0) / 1000000L
    val perBucket = out.groupBy("bucket").agg(
      max(col("warc_ts")).as("watermark"),
      count(lit(1)).as("rows"),
      sum(length(col("subj")) + length(col("pred")) + length(col("obj")) +
        length(col("url"))).as("bytes"))
    // buckets whose pages produced zero triples still need a manifest row,
    // or resume would re-process them forever
    val allTodoBuckets = todo.select("bucket").distinct()
    val withEmpty = allTodoBuckets.join(perBucket, Seq("bucket"), "left_outer")
      .select(col("bucket"),
        coalesce(col("watermark"), lit(null).cast("timestamp")).as("watermark"),
        coalesce(col("rows"), lit(0L)).as("rows"),
        coalesce(col("bytes"), lit(0L)).as("bytes"))
    appendManifest(spark, outDir, "triples", withEmpty, runId, wallMs)
    t = mark("manifest", t)
    out.unpersist()
    nPages
  }
}
