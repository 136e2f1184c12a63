package graft.operators

import graft.SparkTestBase
import graft.core.Bpe
import org.apache.spark.sql.functions._

/** BPE: pure-core semantics pinned by hand-checked cases; the Spark
  * trainer asserted EQUAL to the pure reference on the driver testdata
  * corpus and on an adversarial tie-heavy corpus (q98's correctness
  * backstop — SQL cannot express the iterative re-tokenization, so this
  * equality IS the oracle).
  */
class BpeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("mergeOnce is greedy left-to-right; pairsOf counts overlaps") {
    assert(Bpe.pairsOf(Vector("a", "a", "a")).toSeq ==
      Seq(("a", "a"), ("a", "a")))
    assert(Bpe.mergeOnce(Vector("a", "a", "a"), "a", "a") ==
      Vector("aa", "a"))
    assert(Bpe.mergeOnce(Vector("a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "aa"))
    assert(Bpe.mergeOnce(Vector("x", "a", "b", "y", "a", "b"), "a", "b") ==
      Vector("x", "ab", "y", "ab"))
    assert(Bpe.pairsOf(Vector("solo")).isEmpty)
  }

  test("bestPair tie-break: count desc, then (a, b) ascending") {
    val counts = Map(("b", "x") -> 5L, ("a", "z") -> 5L, ("a", "y") -> 5L,
      ("c", "c") -> 4L)
    assert(Bpe.bestPair(counts).contains((("a", "y"), 5L)))
  }

  test("Spark trainMerges == pure reference on the documents corpus") {
    import spark.implicits._
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val ref = Bpe.train(wc, nMerges = 10)
    val got = BpeSpark.trainMerges(docs, "text", nMerges = 10)
      .map { case (_, a, b, c) => (a, b, c) }
    assert(got == ref)
  }

  test("Spark trainMerges == pure reference on a tie-heavy corpus") {
    import spark.implicits._
    // every pair count collides somewhere → the (a, b) tie-break and the
    // greedy merge both matter; repeated chars exercise overlap handling
    val tiny = Seq("abab abab baba", "aaaa bbbb abab", "ba ab ba ab")
      .toDF("text").repartition(5)
    val wc = tiny.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val ref = Bpe.train(wc, nMerges = 6)
    val got = BpeSpark.trainMerges(tiny, "text", nMerges = 6)
      .map { case (_, a, b, c) => (a, b, c) }
    assert(got == ref)
  }

  test("initialPairCounts == pure pairCounts of the symbolized vocab") {
    import spark.implicits._
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val ref = Bpe.pairCounts(wc.map { case (w, c) =>
      (Bpe.symbolize(w), c) })
    val got = BpeSpark.initialPairCounts(docs, "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(got == ref)
  }

  test("encode applies merges by RANK priority, not text order") {
    // ranks: (a,b)=0 learned first, (ab,c)=1 — "cab": no leading match,
    // then (a,b) fires mid-word, then (ab,c)? c is BEFORE ab, so no.
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1, ("c", "ab") -> 2)
    assert(Bpe.encode("abc", ranks) == Vector("abc"))   // ab, then ab+c
    assert(Bpe.encode("cab", ranks) == Vector("cab"))   // ab, then c+ab
    assert(Bpe.encode("bca", ranks) == Vector("b", "c", "a")) // nothing
    // rank priority beats leftmost position: with (b,c) ranked above
    // (a,b), "abc" must merge b+c FIRST even though a+b is leftmost
    val r2 = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(Bpe.encode("abc", r2) == Vector("a", "bc"))
  }

  test("Spark encodeTokenCounts == pure encode on the documents corpus") {
    import spark.implicits._
    val merges = BpeSpark.trainMerges(docs, "text", 10)
    val ranks = merges.map { case (rk, a, b, _) => (a, b) -> rk }.toMap
    val got = BpeSpark.encodeTokenCounts(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    val want = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().map { case (id, text) =>
        val toks = text.split(' ').toVector.flatMap(Bpe.encode(_, ranks))
        id -> ((toks.length, toks.distinct.length))
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (n, d)) =>
      assert((n, d) == want(id), s"doc $id: got ($n,$d), want ${want(id)}")
    }
  }

  test("training stops early when no pair remains") {
    import spark.implicits._
    val tiny = Seq("ab ab").toDF("text")
    // "ab": 1 merge possible, then every word is a single symbol
    val got = BpeSpark.trainMerges(tiny, "text", nMerges = 5)
    assert(got.map { case (_, a, b, _) => (a, b) } == Vector(("a", "b")))
  }

  // ---------------- batched training ----------------

  test("disjointPrefix stops at the first symbol-sharing pair") {
    val ranked = Vector(("a", "b", 9L), ("c", "d", 8L), ("b", "e", 7L),
      ("f", "g", 6L))
    // (b,e) shares b with (a,b) → prefix ends BEFORE it; (f,g) is
    // disjoint but comes after the stop, so it is NOT selected (skipping
    // would reorder vs sequential greedy)
    assert(Bpe.disjointPrefix(ranked) ==
      Vector(("a", "b", 9L), ("c", "d", 8L)))
    assert(Bpe.disjointPrefix(Vector.empty) == Vector.empty)
    // self-pair (a,a) uses one symbol; a later pair touching a conflicts
    assert(Bpe.disjointPrefix(Vector(("a", "a", 5L), ("a", "x", 4L))) ==
      Vector(("a", "a", 5L)))
  }

  test("disjointSelect rejects a pair touching an earlier FUSION product") {
    // vocab can already contain "abc" from a past round; without the
    // forward fusion check [(a,bc), (abc,d)] would both select, and
    // applying (a,bc) first creates new [abc, d] adjacencies that
    // (abc,d) then consumes beyond its recorded count
    assert(Bpe.disjointSelect(
      Vector(("a", "bc", 10L), ("abc", "d", 9L)), skipConflicts = false) ==
      Vector(("a", "bc", 10L)))
    assert(Bpe.disjointSelect(
      Vector(("a", "bc", 10L), ("abc", "d", 9L), ("x", "y", 8L)),
      skipConflicts = true) ==
      Vector(("a", "bc", 10L), ("x", "y", 8L)))
    // BACKWARD direction: a candidate whose own fusion equals an earlier
    // selection's symbol is rejected too — otherwise counts would be
    // exact only under selection-order application, a hidden ordering
    // contract on callers
    assert(Bpe.disjointSelect(
      Vector(("abc", "d", 10L), ("a", "bc", 9L)), skipConflicts = false) ==
      Vector(("abc", "d", 10L)))
    assert(Bpe.disjointSelect(
      Vector(("abc", "d", 10L), ("a", "bc", 9L), ("x", "y", 8L)),
      skipConflicts = true) ==
      Vector(("abc", "d", 10L), ("x", "y", 8L)))
  }

  test("batched trainer: every recorded count equals its round baseline") {
    // replay the trainer's own selection rule round by round and assert
    // (a) the merge stream partitions into exactly those rounds, and
    // (b) every recorded count equals the PURE pair count at the
    // round's start — the counts-stay-exact contract, checked against a
    // corpus whose vocabulary contains fusion-product symbols ("abc"
    // pre-exists while (a,bc)-shaped merges are still reachable)
    val wc = Map("abc" -> 9L, "zabcd" -> 4L, "qq" -> 6L)
    val nMerges = 6
    val batchSize = 6
    val (batched, rounds) = Bpe.trainBatched(wc, nMerges, batchSize,
      skipConflicts = true)
    var vocab = wc.toVector.map { case (w, c) => (Bpe.symbolize(w), c) }
    var idx = 0
    var replayRounds = 0
    while (idx < batched.length) {
      val counts = Bpe.pairCounts(vocab)
      val ranked = Bpe.rankPairs(counts)
        .take(math.min(batchSize, nMerges - idx))
      val batch = Bpe.disjointSelect(ranked, skipConflicts = true)
      assert(batch.nonEmpty)
      assert(batched.slice(idx, idx + batch.length) == batch,
        s"round $replayRounds at merge $idx: trainer emitted " +
          s"${batched.slice(idx, idx + batch.length)}, replay selected $batch")
      batch.foreach { case (a, b, cnt) =>
        assert(counts((a, b)) == cnt,
          s"($a,$b): recorded $cnt, baseline ${counts((a, b))}")
      }
      vocab = vocab.map { case (s, c) =>
        (batch.foldLeft(s) { case (acc, (x, y, _)) =>
          Bpe.mergeOnce(acc, x, y) }, c)
      }
      idx += batch.length
      replayRounds += 1
    }
    assert(replayRounds == rounds)
  }

  test("disjointSelect skip mode keeps scanning past conflicts") {
    val ranked = Vector(("a", "b", 9L), ("c", "d", 8L), ("b", "e", 7L),
      ("f", "g", 6L))
    // skip mode passes over (b,e) and still commits (f,g); the selected
    // set stays pairwise symbol-disjoint either way
    assert(Bpe.disjointSelect(ranked, skipConflicts = true) ==
      Vector(("a", "b", 9L), ("c", "d", 8L), ("f", "g", 6L)))
    // Spark trainer honors the flag: a tie-free corpus whose top-3 pairs
    // conflict pairwise at position 2 commits 2 pairs in round 1 under
    // skip mode vs 1+stop under prefix mode
    import spark.implicits._
    val tiny = Seq("ab ab ab ab", "bc bc bc", "de de").toDF("text")
    val wc = Map("ab" -> 4L, "bc" -> 3L, "de" -> 2L)
    // ranked: (a,b):4, (b,c):3 conflicts on b, (d,e):2 disjoint
    val (prefix, prefixRounds) =
      Bpe.trainBatched(wc, nMerges = 3, batchSize = 3)
    val (skip, skipRounds) =
      Bpe.trainBatched(wc, nMerges = 3, batchSize = 3, skipConflicts = true)
    assert(prefix.map { case (a, b, _) => (a, b) }.take(1) ==
      Vector(("a", "b")) && prefixRounds == 2)
    assert(skip.map { case (a, b, _) => (a, b) } ==
      Vector(("a", "b"), ("d", "e"), ("b", "c")) && skipRounds == 2)
    val (sparkSkip, sparkSkipRounds) = BpeSpark.trainMergesBatched(
      tiny, "text", nMerges = 3, batchSize = 3, skipConflicts = true)
    assert(sparkSkip.map { case (_, a, b, c) => (a, b, c) } == skip)
    assert(sparkSkipRounds == skipRounds)
  }

  test("pure trainBatched with batchSize=1 == exact trainer") {
    import spark.implicits._
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val (batched, rounds) = Bpe.trainBatched(wc, nMerges = 10, batchSize = 1)
    assert(batched == Bpe.train(wc, nMerges = 10))
    assert(rounds == batched.length)
  }

  test("batched == exact on a non-interacting corpus") {
    // disjoint two-letter alphabets, words of length 2: every pair is
    // symbol-disjoint from every other and no merge can CREATE a pair
    // (merged words become single symbols) → batched must equal exact
    val wc = Map("ab" -> 50L, "cd" -> 40L, "ef" -> 30L, "gh" -> 20L)
    val exact = Bpe.train(wc, nMerges = 4)
    val (batched, rounds) = Bpe.trainBatched(wc, nMerges = 4, batchSize = 4)
    assert(batched == exact)
    assert(rounds == 1) // all four merges landed in a single round
  }

  test("documented divergence: a created pair can out-rank the batch tail") {
    // exact: (a,a):40 → creates (aa,a):20 which BEATS (b,c):15, so the
    // sequential order is (a,a), (aa,a), (b,c); batched(2) commits
    // (a,a) and (b,c) in round 1 before (aa,a) exists. Divergence is in
    // merge ORDER only here — the contract documented at Bpe.trainBatched.
    val wc = Map("aaa" -> 20L, "bc" -> 15L)
    val exact = Bpe.train(wc, nMerges = 3)
    assert(exact.map { case (a, b, _) => (a, b) } ==
      Vector(("a", "a"), ("aa", "a"), ("b", "c")))
    val (batched, _) = Bpe.trainBatched(wc, nMerges = 3, batchSize = 2)
    assert(batched.map { case (a, b, _) => (a, b) } ==
      Vector(("a", "a"), ("b", "c"), ("aa", "a")))
  }

  test("Spark trainMergesBatched == pure trainBatched on documents corpus") {
    import spark.implicits._
    val wc = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val (ref, refRounds) = Bpe.trainBatched(wc, nMerges = 10, batchSize = 8)
    val (got, gotRounds) =
      BpeSpark.trainMergesBatched(docs, "text", nMerges = 10, batchSize = 8)
    assert(got.map { case (_, a, b, c) => (a, b, c) } == ref)
    assert(got.map(_._1) == got.indices.toVector) // ranks are 0..n-1
    assert(gotRounds == refRounds)
    // the point of batching: strictly fewer driver round-trips than
    // merges whenever any round commits more than one pair
    assert(gotRounds < got.length,
      s"expected round-count reduction, got $gotRounds rounds for " +
        s"${got.length} merges")
  }

  test("Spark encodeTokens == pure encode token-for-token") {
    import spark.implicits._
    val merges = BpeSpark.trainMerges(docs, "text", 10)
    val ranks = merges.map { case (rk, a, b, _) => (a, b) -> rk }.toMap
    val got = BpeSpark.encodeTokens(docs, "text", "doc_id", merges)
      .as[(Long, Seq[String])].collect().toMap
    val want = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().map { case (id, text) =>
        id -> text.split(' ').toSeq.flatMap(Bpe.encode(_, ranks))
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, toks) =>
      assert(toks == want(id), s"doc $id tokens diverge")
    }
  }

  test("encode cache cap: adversarial all-unique words, capped == uncapped") {
    import spark.implicits._
    // every word distinct → zero cache hits; with maxCacheWords=2 the
    // cache clears constantly and the output must still be identical
    val uniq = (0 until 200)
      .map(i => (i.toLong, s"w${i}a w${i}b w${i}c"))
      .toDF("doc_id", "text").repartition(3)
    val merges = BpeSpark.trainMerges(uniq, "text", 3)
    val want = BpeSpark.encodeTokenCounts(uniq, "text", "doc_id", merges)
      .orderBy("doc_id").collect().map(_.toSeq)
    val got = BpeSpark.encodeTokenCounts(uniq, "text", "doc_id", merges,
        maxCacheWords = 2)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("checkpointed training resumes after a kill to the same table") {
    // the production cadence (trainLoop scaladoc): an interrupted run
    // restarts from the newest COMMITTED round. Simulated kill: a first
    // run checkpoints every 2 rounds and stops at 6 merges (as if the
    // process died there); resume continues from disk to the full 10
    // and must equal an uninterrupted 10-merge run.
    val dir = java.nio.file.Files
      .createTempDirectory("bpe-ckpt").toString
    val (partial, _) = BpeSpark.trainMergesBatched(docs, "text",
      nMerges = 6, batchSize = 1, skipConflicts = false,
      checkpointEvery = 2, checkpointDir = dir)
    assert(partial.length == 6)
    assert(new java.io.File(s"$dir/r6/_COMMIT").exists)
    val (resumed, _) = BpeSpark.resumeMergesBatched(spark, dir,
      nMerges = 10, batchSize = 1)
    val want = BpeSpark.trainMerges(docs, "text", 10)
    assert(resumed == want)
    // the resumed run INHERITS the every-2 cadence by default — a
    // resume that silently stopped checkpointing would lose all resumed
    // work at the next crash (third review pass); rounds 8 and 10 must
    // have committed
    assert(new java.io.File(s"$dir/r10/_COMMIT").exists,
      "resumed run did not keep checkpointing at the recorded cadence")
  }

  test("a fresh run invalidates a previous run's stale checkpoints") {
    // reusing a checkpoint dir across runs must not let run 1's deeper
    // rounds out-rank run 2's progress at resume time — run 2 owns the
    // directory. Run 1 trains a DIFFERENT corpus, so its stale r6 table
    // provably differs from run 2's continuation: without the fresh-run
    // invalidation, resume would return run 1's table and the equality
    // below would fail (second review pass: the same-corpus version of
    // this test was vacuous)
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("bpe-ckpt-reuse").toString
    val otherCorpus = Seq("zq zq zq qz", "zqzq qzqz zq").toDF("text")
    BpeSpark.trainMergesBatched(otherCorpus, "text", nMerges = 6,
      batchSize = 1, checkpointEvery = 2, checkpointDir = dir)
    // run 2 on the real docs: commits only r2, then "dies"
    BpeSpark.trainMergesBatched(docs, "text", nMerges = 2, batchSize = 1,
      checkpointEvery = 2, checkpointDir = dir)
    val (resumed, _) = BpeSpark.resumeMergesBatched(spark, dir,
      nMerges = 6, batchSize = 1)
    val want = BpeSpark.trainMerges(docs, "text", 6)
    assert(want != BpeSpark.trainMerges(otherCorpus, "text", 6),
      "test setup: the two corpora must train different tables")
    assert(resumed == want)
  }

  test("resume pins selection params and the nMerges ceiling") {
    val dir = java.nio.file.Files
      .createTempDirectory("bpe-ckpt-params").toString
    BpeSpark.trainMergesBatched(docs, "text", nMerges = 6, batchSize = 1,
      checkpointEvery = 2, checkpointDir = dir)
    // different batchSize would silently change selection semantics
    intercept[IllegalArgumentException] {
      BpeSpark.resumeMergesBatched(spark, dir, nMerges = 8, batchSize = 4)
    }
    // a target the checkpoint already exceeds returns a TRUNCATED table
    // (never more than nMerges), not the checkpoint's larger one
    val (truncated, _) = BpeSpark.resumeMergesBatched(spark, dir,
      nMerges = 4, batchSize = 1)
    assert(truncated == BpeSpark.trainMerges(docs, "text", 6).take(4))
  }

  test("resume ignores an uncommitted (killed mid-write) checkpoint") {
    val dir = java.nio.file.Files
      .createTempDirectory("bpe-ckpt-dirty").toString
    BpeSpark.trainMergesBatched(docs, "text", nMerges = 4, batchSize = 1,
      checkpointEvery = 2, checkpointDir = dir)
    // fake a later round whose writes completed but whose marker never
    // landed — resume must fall back to r4, not trust r6
    val dirty = new java.io.File(s"$dir/r6/vocab")
    dirty.mkdirs()
    val (resumed, _) = BpeSpark.resumeMergesBatched(spark, dir,
      nMerges = 8, batchSize = 1)
    assert(resumed == BpeSpark.trainMerges(docs, "text", 8))
  }
}
