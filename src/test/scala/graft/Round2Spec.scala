package graft

import graft.core.HtmlText
import graft.operators.{Dedup, DistributedRank, Similarity}
import graft.pipeline.{FixtureSpark, KgPipeline}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 additions: the distributed rank operators must be bit-equal to
  * Spark's single-partition window forms; the ADVICE bug fixes (minhash
  * short docs, cosine zero-norm, astral entities) get regression specs;
  * the bucketed range join and the SMJ canonicalization fallback are
  * cross-checked against their unbucketed / broadcast twins.
  */
class Round2Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // ---------------- distributed rank ----------------

  test("DistributedRank.percentRank == window percent_rank (bit-equal)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val dist = DistributedRank.percentRank(orders,
        floor(col("o_totalprice") / 10000.0),
        Seq(col("o_totalprice").asc, col("o_orderkey").asc), "pr")
      .select("o_orderkey", "pr")
    val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val plain = orders.withColumn("pr", percent_rank().over(w))
      .select("o_orderkey", "pr")
    assert(dist.except(plain).isEmpty && plain.except(dist).isEmpty)
  }

  test("DistributedRank.ntileBuckets == window ntile for ragged n % k") {
    import spark.implicits._
    // n = 10, k = 4 → bucket sizes 3,3,2,2; also n = 3 < k = 4 → 1,1,1
    for (n <- Seq(10, 3, 17); k <- Seq(4, 5)) {
      val df = (1 to n).map(i => (i.toLong, (i * 37 % n).toLong))
        .toDF("id", "v")
      val dist = DistributedRank.ntileBuckets(df, floor(col("v") / 3.0),
          Seq(col("v").asc, col("id").asc), k, "nt")
        .select("id", "nt")
      val plain = df.withColumn("nt",
          ntile(k).over(Window.orderBy(col("v").asc, col("id").asc)))
        .select("id", "nt")
      assert(dist.except(plain).isEmpty && plain.except(dist).isEmpty,
        s"n=$n k=$k")
    }
  }

  test("DistributedRank plans no single-partition window over the data") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val dist = DistributedRank.percentRank(orders,
      floor(col("o_totalprice") / 10000.0),
      Seq(col("o_totalprice").asc, col("o_orderkey").asc), "pr")
    dist.collect()
    val plan = dist.queryExecution.executedPlan.toString
    // the only SinglePartition exchange feeds the tiny bucket-count table;
    // the data-side window must be hash-partitioned by bucket
    assert(plan.contains("hashpartitioning(__rank_bucket"), plan.take(3000))
  }

  // ---------------- minhash short docs (ADVICE fix) ----------------

  test("minhash: unrelated short docs are NOT near-duplicates") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha"), (2L, "omega"), // shorter than k — used to collide
      (3L, "tiny doc"), (4L, "tiny doc") // identical short docs: keep
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, "text", "doc_id",
        k = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((1L, 2L)), s"sentinel collision: $pairs")
    assert(pairs.contains((3L, 4L)), s"identical short docs: $pairs")
  }

  test("minhash signature of a short doc matches the shingles() column") {
    import spark.implicits._
    val df = Seq((1L, "two words")).toDF("doc_id", "text")
    // shingles() emits the whole text as one shingle when size < k
    val sh = df.select(Dedup.shingles(col("text"), 3).as("sh"))
      .head().getSeq[String](0)
    assert(sh == Seq("two words"))
    val sig = Dedup.minhashSignatures(df, "text", "doc_id", 3, 8)
      .head().getSeq[Long](1)
    assert(!sig.contains(Long.MaxValue), s"sentinel survived: $sig")
  }

  // ---------------- cosine zero-norm (ADVICE fix) ----------------

  test("cosine of a zero/empty vector is null in native and HOF forms") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)),
      (2L, Seq.empty[Float], Seq(1.0f, 2.0f)),
      (3L, Seq(3.0f, 4.0f), Seq(1.0f, 0.0f))).toDF("id", "a", "b")
    val got = df.select(col("id"),
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof"))
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(got(1L) == (true, true))
    assert(got(2L) == (true, true))
    assert(got(3L) == (false, false))
  }

  test("zero vector never outranks real neighbors in top-k") {
    import spark.implicits._
    val df = (0L to 20L).map { i =>
      if (i == 7L) (i, Seq.fill(4)(0.0f))
      else (i, Seq(1.0f, i.toFloat, 2.0f, 1.0f))
    }.toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, df.where(col("vec_id") === 0),
      "vec_id", "embedding", k = 20).collect()
    // pre-fix behavior: NaN sorts above every double, so the zero vector
    // ranked FIRST; with the null guard it sinks to the very bottom
    assert(top.head.getAs[Long]("neighbor_id") != 7L)
    assert(top.last.getAs[Long]("neighbor_id") == 7L &&
      top.last.isNullAt(top.last.fieldIndex("cos")))
    val topK = Similarity.bruteForceTopK(df, df.where(col("vec_id") === 0),
      "vec_id", "embedding", k = 10).collect()
    assert(!topK.map(_.getAs[Long]("neighbor_id")).contains(7L),
      "null cosine rows must not occupy a real top-k slot")
  }

  // ---------------- astral entities (ADVICE fix) ----------------

  test("numeric entities decode supplementary-plane code points") {
    assert(HtmlText.extractFromString("a &#128512; b") == "a 😀 b")
    assert(HtmlText.extractFromString("a &#x1F600; b") == "a 😀 b")
    // lone surrogate / invalid → raw entity preserved
    assert(HtmlText.extractFromString("a &#xD800; b") == "a &#xD800; b")
    assert(HtmlText.extractFromString("a &#0; b") == "a &#0; b")
    // BMP still works
    assert(HtmlText.extractFromString("x &#233; y") == "x é y")
  }

  // ---------------- bucketed range join == plain range join ----------------

  test("q25 minute-bucketed range join equals the plain range join") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val bucketed = SparkEntry.queries("q25_range_join")(spark, sf)
    val e1 = events.select(col("event_id").as("a_id"), col("user_id"),
      col("ts").as("a_ts"))
    val e2 = events.select(col("event_id").as("b_id"), col("user_id"),
      col("ts").as("b_ts"))
    val plain = e1.join(e2, e1("user_id") === e2("user_id") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 60 SECONDS"))
      .groupBy(e1("user_id").as("user_id"))
      .agg(count(lit(1)).as("pairs"))
    assert(bucketed.except(plain).isEmpty && plain.except(bucketed).isEmpty)
  }

  // ---------------- SMJ canonicalization fallback ----------------

  test("runWithJoinedCanon == broadcast-canon run, and plans an SMJ") {
    val pages = FixtureSpark.pages(spark, 120L, 8)
    val ents = FixtureSpark.entities(spark)
    val als = FixtureSpark.aliases(spark)
    val viaBroadcast = KgPipeline.run(spark, pages, ents, als).toDF()
    val viaJoin = KgPipeline.runWithJoinedCanon(spark, pages, ents, als)
    viaJoin.collect()
    val plan = viaJoin.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    val j = viaJoin.toDF()
    assert(j.except(viaBroadcast).isEmpty && viaBroadcast.except(j).isEmpty)
  }

  test("triples stage prunes text/lang out of the parquet pages scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graftprune").toString
    FixtureSpark.pages(spark, 50L, 4).write.parquet(s"$tmp/pages")
    val pages = spark.read.parquet(s"$tmp/pages")
      .as[graft.pipeline.Page]
    val prep = KgPipeline.prepare(spark, FixtureSpark.entities(spark),
      FixtureSpark.aliases(spark))
    val t = KgPipeline.run(spark, pages, prep).toDF()
    t.collect()
    val plan = t.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan parquet"))
      .getOrElse(fail(s"no FileScan in plan: ${plan.take(1500)}"))
    // ReadSchema must carry only url/warc_ts/html — on a real pages table
    // `text` is document-sized; reading it here would double the scan
    assert(!scanLine.contains("text") && !scanLine.contains("lang"),
      scanLine)
    assert(scanLine.contains("html"), scanLine)
  }

  test("run() dispatches to the joined path above the broadcast limit") {
    val pages = FixtureSpark.pages(spark, 60L, 4)
    val ents = FixtureSpark.entities(spark)
    val als = FixtureSpark.aliases(spark)
    val small = KgPipeline.run(spark, pages, ents, als).toDF()
    val forcedJoin = KgPipeline.run(spark, pages, ents, als,
      broadcastCanonLimit = 0L).toDF()
    assert(forcedJoin.except(small).isEmpty && small.except(forcedJoin).isEmpty)
  }
}
