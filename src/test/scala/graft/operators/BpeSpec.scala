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

  test("training stops early when no pair remains") {
    import spark.implicits._
    val tiny = Seq("ab ab").toDF("text")
    // "ab": 1 merge possible, then every word is a single symbol
    val got = BpeSpark.trainMerges(tiny, "text", nMerges = 5)
    assert(got.map { case (_, a, b, _) => (a, b) } == Vector(("a", "b")))
  }
}
