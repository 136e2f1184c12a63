package graft

import graft.core.UnionFind
import graft.operators.{ConnectedComponents, Dedup, Similarity}
import graft.pipeline.FixtureSpark
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** Round-4 hardening (VERDICT r3 + ADVICE r3):
  *   - hashed-key ngramJaccard candidates == exact string-key candidates
  *     on adversarial shingle sets (the documented "equal up to a 64-bit
  *     collision" claim, pinned);
  *   - CcHandle.close() frees exactly its own run dir (two concurrent
  *     managed fixpoints, driver-reuse lifecycle);
  *   - bruteForceTopK/ivfTopK fail fast on a non-integral QUERIES id
  *     (the round-3 guard covered only the vectors side);
  *   - runToMemory(requireSingleBatch) rejects multi-batch consumption
  *     (q87's oracle-equality assumption, asserted not assumed);
  *   - q88's bridged CC topology matches the union-find oracle (the
  *     DuckDB hash check runs driver-side; this is the local twin);
  *   - pagesSkewed: deterministic across parallelism, real url-hash
  *     buckets, exactly one hotFactor× bucket.
  */
class Round4Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // ---------------- ngramJaccard hash-key equivalence ----------------

  /** Candidate/jaccard computation keyed on the RAW shingle string —
    * the pre-round-3 formulation, kept here as the oracle for the
    * hashed-key rewrite. */
  private def ngramJaccardStringKeyed(docs: org.apache.spark.sql.DataFrame,
      k: Int, threshold: Double) = {
    val withSh = docs.select(col("doc_id"), col("source"),
      Dedup.shingles(col("text"), k).as("sh"))
    val sizes = withSh.select(col("doc_id"), col("source"),
      size(col("sh")).as("nsh"))
    val exploded = withSh.select(col("doc_id"), col("source"),
      explode(col("sh")).as("shingle"))
    val inter = exploded.as("l").join(exploded.as("r"),
        col("l.shingle") === col("r.shingle") &&
        col("l.source") === col("r.source") &&
        col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("nsh").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("nsh").as("nb")), "b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  test("hashed-key ngramJaccard == string-keyed on adversarial shingles") {
    import spark.implicits._
    // adversarial: shared long prefixes, unicode (multi-byte UTF-8),
    // shingles that are substrings/prefixes of other shingles, repeats
    val docs = Seq(
      (1L, "s1", "aaaa aaaa aaab aaaa aaaa"),
      (2L, "s1", "aaaa aaaa aaab aaaa aaac"),
      (3L, "s1", "aaaa aaaab aab aaaa aaaa"),
      (4L, "s1", "ユニ コード 文字 列 テスト"),
      (5L, "s1", "ユニ コード 文字 列 試験"),
      (6L, "s1", "a aa aaa aaaa aaaaa a aa aaa"),
      (7L, "s1", "a aa aaa aaaa aaaaa a aa aab"),
      (8L, "s2", "aaaa aaaa aaab aaaa aaaa"),   // same text, other block
      (9L, "s2", "naïve café déjà vu naïve café"),
      (10L, "s2", "naïve café déjà vu naïve cafe")
    ).toDF("doc_id", "source", "text")
    for (k <- Seq(2, 3)) {
      val hashed = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        "source", k = k, threshold = 0.0).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = ngramJaccardStringKeyed(docs, k, 0.0).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(hashed == exact, s"k=$k: hashed-key pairs diverge from " +
        s"string-key pairs\nhashed-only: ${hashed -- exact}\n" +
        s"string-only: ${exact -- hashed}")
      assert(hashed.nonEmpty)
    }
  }

  // ---------------- CcHandle lifecycle under driver reuse ----------------

  private def ccTmpDirs(): Set[String] = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft-cc"))
      .map(_.getName).toSet
  }

  test("durable CcHandle.close frees its own dir; a second live handle " +
      "survives") {
    import spark.implicits._
    val e1 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val e2 = Seq((10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val before = ccTmpDirs()
    val h1 = ConnectedComponents.runManaged(spark, e1, durable = true)
    val dirs1 = ccTmpDirs() -- before
    assert(dirs1.size == 1, s"expected one new run dir, got $dirs1")
    val h2 = ConnectedComponents.runManaged(spark, e2, durable = true)
    val dirs2 = ccTmpDirs() -- before -- dirs1
    assert(dirs2.size == 1)
    h1.close()
    // h1's dir is gone, h2's remains — and h2's labels stay readable
    assert((ccTmpDirs() -- before) == dirs2,
      "close() must remove exactly the closed handle's dir")
    val got2 = h2.labels.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got2 == Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
    h1.close() // idempotent
    h2.close()
    assert((ccTmpDirs() -- before).isEmpty)
  }

  test("default (localCheckpoint) CC run writes no temp dir and matches " +
      "the durable run's labels") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val before = ccTmpDirs()
    val h = ConnectedComponents.runManaged(spark, edges)
    val got = h.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ccTmpDirs() == before,
      "non-durable fixpoint must not touch the filesystem")
    val hd = ConnectedComponents.runManaged(spark, edges, durable = true)
    val want = hd.labels.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    hd.close()
    h.close()
    assert(got == want)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  // ---------------- queries-side id guard ----------------

  test("topK operators fail fast on a non-integral QUERIES id column") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    val strQueries = Seq(("q1", Seq.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(vecs, strQueries, "vec_id", "embedding", 3)
    }
    assert(e1.getMessage.contains("queries side"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(vecs, strQueries, "vec_id", "embedding", 4, 2, 3)
    }
    assert(e2.getMessage.contains("queries side"))
  }

  // ---------------- single-batch assertion ----------------

  test("runToMemory(requireSingleBatch) rejects multi-batch consumption") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r4-stream")
      .toFile.getAbsolutePath
    // two separate parquet FILES so maxFilesPerTrigger=1 forces 2 batches
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L,
        "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 1L,
        "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    def stream(maxFiles: Option[Int]) = {
      val r = spark.readStream.schema(EventsStream.eventSchema)
      maxFiles.fold(r)(m => r.option("maxFilesPerTrigger", m.toString))
        .parquet(dir).select("event_id", "user_id")
    }
    val err = intercept[IllegalArgumentException] {
      EventsStream.runToMemory(spark, stream(Some(1)), "r4_two_batches",
        "append", requireSingleBatch = true)
    }
    assert(err.getMessage.contains("micro-batches"))
    spark.catalog.dropTempView("r4_two_batches")
    // and the single-batch path passes
    val ok = EventsStream.runToMemory(spark, stream(None), "r4_one_batch",
      "append", requireSingleBatch = true)
    assert(ok.count() == 2)
    spark.catalog.dropTempView("r4_one_batch")
  }

  // ---------------- q88 bridged topology vs union-find ----------------

  test("q88's bridged chain graph matches the union-find oracle") {
    val keys = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").cast("long"))
      .collect().map(_.getLong(0))
    val edges = keys.filter(_ % 50 != 49).map(k => (k, k + 1)) ++
      keys.filter(_ % 250 == 0).map(k => (k, k + 50)) ++
      keys.filter(_ % 250 == 10).map(k => (k, k + 110)) ++
      keys.filter(_ % 250 == 75).map(k => (k, k + 50))
    // the bridges must actually fire at this sf, or the spec is vacuous
    assert(keys.count(_ % 250 == 10) > 0 && keys.count(_ % 250 == 75) > 0)
    val want = UnionFind.componentsOf(edges)
    // at least one component must span >1 chain (merge contention)
    val sizes = want.groupBy(_._2).map(_._2.size)
    assert(sizes.max > 60, s"no multi-chain component: ${sizes.toSeq.sorted}")
    val got = SparkEntry.queries("q88_cc_bridged")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  // ---------------- skewed pages generator ----------------

  test("pagesSkewed: deterministic, real url-hash buckets, one 10x bucket") {
    val n = 2650L // = 10 × (256 - 1 + 10) slots → exact counts
    val a = FixtureSpark.pagesSkewed(spark, n, 4, buckets = 256,
      hotFactor = 10)
    val b = FixtureSpark.pagesSkewed(spark, n, 13, buckets = 256,
      hotFactor = 10)
    // identical rows at different parallelism (order-insensitive compare)
    assert(a.toDF().exceptAll(b.toDF()).isEmpty &&
      b.toDF().exceptAll(a.toDF()).isEmpty)
    // the bucket column Icebergish derives from the url must show the
    // skew exactly: bucket 0 = hotFactor × every other bucket
    val hist = graft.pipeline.Icebergish.withBucket(a.toDF(), 256)
      .groupBy("bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(hist.size == 256)
    assert(hist(0) == 100L, s"hot bucket: ${hist(0)}")
    assert((1 until 256).forall(b2 => hist(b2) == 10L),
      s"cold buckets uneven: ${hist.filter(_._2 != 10L)}")
  }

  // ---------------- CC fixpoint cache hygiene ----------------

  /** The per-round step1/jump-table persists (added to keep the edge join
    * exactly-once per round — Spark does not dedupe common subplans) must
    * all be RELEASED by the time runManaged returns: a long-lived driver
    * running many fixpoints must not accumulate cached blocks. `e` and the
    * per-round caches unpersist with blocking=false, so poll briefly. */
  test("CC fixpoint releases every persisted RDD it created") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = (0L until 400L).filter(_ % 20 != 19)
      .map(k => (k, k + 1)).toDF("src", "dst")
    val h = ConnectedComponents.runManaged(spark, edges)
    assert(h.labels.count() == 400L)
    h.close()
    val deadline = System.nanoTime() + 10_000_000_000L
    var leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(200)
      leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    }
    assert(leaked.isEmpty, s"fixpoint left cached RDDs behind: $leaked")
  }
}
