package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Structured Streaming over a static events dir must agree with the batch
  * aggregation of the same data (complete mode ⇒ no rows dropped). */
class StreamingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed counts == batch windowed counts") {
    // stream from a single-table dir (readStream takes a directory)
    val tmp = java.nio.file.Files.createTempDirectory("graftstream").toString
    spark.read.parquet(s"$dir/events.parquet").write.parquet(s"$tmp/ev")

    val streamed = EventsStream.runToMemory(spark,
      EventsStream.windowedCounts(spark, s"$tmp/ev"), "win_counts",
      "complete")
      .select(col("hour"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
      .toSet

    val batch = spark.read.parquet(s"$tmp/ev")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == batch)
  }

  test("stateful mapGroupsWithState matches batch per-user aggregates") {
    val tmp = java.nio.file.Files.createTempDirectory("graftstream3").toString
    spark.read.parquet(s"$dir/events.parquet").write.parquet(s"$tmp/ev")
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.statefulUserCounts(spark, s"$tmp/ev"), "user_counts",
      "update")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = spark.read.parquet(s"$tmp/ev")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionizer emits exactly the closed sessions") {
    import org.apache.spark.sql.expressions.Window
    val tmp = java.nio.file.Files.createTempDirectory("graftstream4").toString
    spark.read.parquet(s"$dir/events.parquet").write.parquet(s"$tmp/ev")

    val streamed = EventsStream.runToMemory(spark,
      EventsStream.sessionizeStream(spark, s"$tmp/ev"), "sessions", "append")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSet

    // batch oracle: lag-gap-cumsum sessions (q33 idiom — FRACTIONAL double
    // epochs, so sub-second gaps split identically in both), minus each
    // user's chronologically-last session (still open in the state store)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch").asc, col("event_id").asc)
    val sess = spark.read.parquet(s"$tmp/ev")
      .withColumn("epoch",
        col("ts").cast("timestamp_ltz").cast("double"))
      .withColumn("prev", lag(col("epoch"), 1).over(w))
      .withColumn("new_sess", when(col("prev").isNull ||
        col("epoch") - col("prev") > 1800.0, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(min(col("epoch")).as("sess_start"), max(col("epoch")).as("sess_end"),
        count(lit(1)).as("n_events"))
    val lastSess = sess.groupBy("user_id")
      .agg(max(col("sess_id")).as("sess_id"))
    val closed = sess.join(lastSess, Seq("user_id", "sess_id"), "left_anti")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(streamed == closed)
    assert(closed.nonEmpty, "fixture must contain closed sessions")
  }

  test("sessionizer splits on a sub-second gap overflow (1800.8 s)") {
    import java.sql.Timestamp
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graftstream6").toString
    // t1 = 10000.0, t2 = 11800.8 → real gap 1800.8 s (must SPLIT, like
    // q33's fractional compare); the pre-round-3 whole-second truncation
    // saw floor(11800.8) - floor(10000.0) = 1800 <= 1800 and EXTENDED
    def ev(id: Long, epochMillis: Long, user: Long) =
      (id, new Timestamp(epochMillis), user, "click", 1.0, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value",
      "props")
    Seq(ev(1, 10_000_000L, 1), ev(2, 11_800_800L, 1), ev(3, 20_000_000L, 1))
      .toDF(cols: _*).write.parquet(s"$tmp/ev")
    val out = EventsStream.runToMemory(spark,
      EventsStream.sessionizeStream(spark, s"$tmp/ev"), "sess_subsec",
      "append")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sortBy(_._2)
    assert(out == Seq((1L, 10000.0, 10000.0, 1L), (1L, 11800.8, 11800.8, 1L)),
      s"both sub-gap singleton sessions must close: $out")
  }

  test("sessionizer keeps state across triggers and drops late events") {
    import java.sql.Timestamp
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graftstream5").toString
    def ev(id: Long, epochSec: Long, user: Long) =
      (id, new Timestamp(epochSec * 1000L), user, "click", 1.0, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value",
      "props")
    // trigger 1: two events 100 s apart → one OPEN session, nothing emitted
    Seq(ev(1, 10000, 1), ev(2, 10100, 1)).toDF(cols: _*)
      .write.mode("append").parquet(s"$tmp/ev")
    val q = EventsStream.sessionizeStream(spark, s"$tmp/ev")
      .writeStream.format("memory").queryName("sess_multi")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("sess_multi").count() == 0,
      "open session must not be emitted")
    // trigger 2: an event 5000 s later closes the session; a LATE event
    // (older than the open session's end) must be dropped, not merge
    Seq(ev(3, 15100, 1), ev(4, 10050, 1)).toDF(cols: _*)
      .write.mode("append").parquet(s"$tmp/ev")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_multi").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 10000.0, 10100.0, 2L)),
      s"exactly the closed session, late event dropped: ${out.toSeq}")
  }

  test("streaming dedup within watermark emits each event once") {
    val tmp = java.nio.file.Files.createTempDirectory("graftstream2").toString
    val ev = spark.read.parquet(s"$dir/events.parquet").limit(100)
    // duplicate every event, then stream-dedup
    ev.unionByName(ev).write.parquet(s"$tmp/ev")
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.dedupStream(spark, s"$tmp/ev"), "dedup_stream", "append")
    assert(streamed.count() == 100)
    assert(streamed.select("event_id").distinct().count() == 100)
  }

  test("streaming heavy hitters == exact counts in the exact regime") {
    // exact regime: every shard's vocab ≤ capacity → the shard-summary
    // union is the exact count table (the equality licensing q107's
    // oracle); compared against the BATCH sketch, itself pinned equal
    // to exact counts in SketchesSpec
    val streamed = EventsStream.runToMemory(spark,
      DocsStream.heavyHittersStream(spark, dir,
        Some("documents.parquet"), capacity = 4096, nShards = 8),
      "hh_stream", "update")
    val got = DocsStream.latestShardCounters(streamed)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (w, c, _) => (-c, w) }.take(20)
    val want = graft.operators.Sketches.heavyHitters(
        spark.read.parquet(s"$dir/documents.parquet"), "text", 4096, 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("streaming heavy hitters accumulate across triggers") {
    // the property q87 could NOT have (its oracle needs one trigger):
    // sketch state simply accumulates, so two-trigger delivery yields
    // the same counts as one — the reader takes each shard's newest
    // (max-ver) emission
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graftstream6").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val half1 = docs.where(col("doc_id") % 2 === 0)
    val half2 = docs.where(col("doc_id") % 2 =!= 0)
    half1.write.mode("append").parquet(s"$tmp/docs")
    val q = DocsStream.heavyHittersStream(spark, s"$tmp/docs", None,
        capacity = 4096, nShards = 4)
      .writeStream.format("memory").queryName("hh_multi")
      .outputMode("update").start()
    q.processAllAvailable()
    half2.write.mode("append").parquet(s"$tmp/docs")
    q.processAllAvailable()
    q.stop()
    val tbl = spark.table("hh_multi")
    // each shard emitted in BOTH triggers (sanity: this test exercises
    // cross-trigger state, so require more emissions than shards)
    assert(tbl.count() > tbl.select("shard").distinct().count())
    val got = DocsStream.latestShardCounters(tbl)
      .select("word", "cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("streaming heavy hitters under EVICTION: bounded state + " +
      "Space-Saving guarantees across triggers") {
    // the regime nothing exercised through the state store before
    // (VERDICT r6 residual 2): shard vocab ≫ capacity, so every trigger
    // evicts — and between triggers the summary java-serialization
    // round-trips through the state store, exactly where the @transient
    // derived-index bug class lives. Synthetic skewed corpus: ~2000
    // distinct words over capacity 64 × 2 shards.
    import spark.implicits._
    val rng = new graft.core.Rng(0x57E4A11L)
    val docs = (0 until 400).map { i =>
      val words = Seq.fill(30) {
        // product-of-uniforms skew: low word ids are heavy hitters
        val w = (rng.nextInt(2000).toLong * rng.nextInt(2000)) / 2000
        s"w$w"
      }
      (i.toLong, words.mkString(" "), "en", "synth",
        words.map(_.length + 1L).sum - 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graftstream7").toString
    val capacity = 64
    docs.where(col("doc_id") < 200)
      .write.mode("append").parquet(s"$tmp/docs")
    val q = DocsStream.heavyHittersStream(spark, s"$tmp/docs", None,
        capacity = capacity, nShards = 2)
      .writeStream.format("memory").queryName("hh_evict")
      .outputMode("update").start()
    q.processAllAvailable()
    docs.where(col("doc_id") >= 200)
      .write.mode("append").parquet(s"$tmp/docs")
    q.processAllAvailable()
    q.stop()
    val tbl = spark.table("hh_evict")
    // both shards emitted in both triggers — eviction state really did
    // round-trip the store between adds
    assert(tbl.count() == 4, s"expected 2 shards x 2 triggers: ${tbl.count()}")
    // capacity cap holds per shard after multiple evicting triggers
    val sizes = tbl.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("ver").desc)))
      .where(col("rn") === 1)
      .select(size(col("counters")).as("n")).collect().map(_.getInt(0))
    assert(sizes.length == 2 && sizes.forall(_ == capacity),
      s"per-shard summaries must sit AT capacity under eviction: " +
        sizes.toSeq)
    // Space-Saving guarantee vs batch truth: est - err <= true <= est
    // for every surviving counter (truth per word is shard-local
    // because sharding partitions the key space)
    val truth = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val survivors = DocsStream.latestShardCounters(tbl)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(survivors.length == 2 * capacity)
    survivors.foreach { case (w, est, err) =>
      val t = truth(w)
      assert(t <= est && est - err <= t,
        s"$w: true $t outside [est-err, est] = [${est - err}, $est]")
    }
    // the regime is genuinely lossy: far more distinct words than
    // surviving counters, and at least one survivor overestimates
    assert(truth.size > 4 * capacity)
    assert(survivors.exists { case (w, est, _) => est > truth(w) },
      "no overestimated survivor — eviction never actually displaced " +
        "a counter, so this corpus is not in the eviction regime")
  }
}
