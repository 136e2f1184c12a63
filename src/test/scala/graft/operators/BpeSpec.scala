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
}
