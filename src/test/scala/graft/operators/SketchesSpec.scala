package graft.operators

import graft.SparkTestBase
import graft.operators.Sketches.SpaceSaving
import org.apache.spark.sql.functions._

/** Space-Saving heavy hitters: the exact regime (capacity ≥ distinct
  * items everywhere) is asserted EQUAL to exact counting — that equality
  * is what licenses q103's DuckDB oracle — and the eviction regime is
  * verified against the algorithm's guaranteed bounds (est − err ≤ true
  * ≤ est; state never exceeds capacity), since under eviction the point
  * estimates are order-dependent by design.
  */
class SketchesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("exact regime == exact counts on the documents corpus") {
    val got = Sketches.heavyHitters(docs, "text", capacity = 4096, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w").asc).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1), 0L))
    assert(got.toSeq == want.toSeq)
  }

  test("exact regime is partitioning-invariant") {
    val a = Sketches.heavyHitters(docs.repartition(1), "text", 4096, 10)
      .collect().map(_.toSeq)
    val b = Sketches.heavyHitters(docs.repartition(13), "text", 4096, 10)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("eviction regime: bounds hold and state stays capacity-bounded") {
    // skewed stream: item "hot" appears 500×, 200 singletons churn the
    // 8 counters constantly
    val stream = new scala.util.Random(42).shuffle(
      (Vector.fill(500)("hot") ++ (0 until 200).map(i => s"u$i")).toList)
    val s = SpaceSaving.build(8, stream.iterator)
    assert(s.counters.size <= 8)
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = stream.size.toLong
    s.topK(8).foreach { case (x, est, err) =>
      val t = truth(x)
      assert(est >= t, s"$x: est $est < true $t (Space-Saving never " +
        "underestimates)")
      assert(est - err <= t, s"$x: est-err ${est - err} > true $t")
      assert(err <= n / 8 + 1, s"$x: err $err exceeds the N/capacity bound")
    }
    // the one genuinely heavy item must surface as the top counter
    assert(s.topK(1).head._1 == "hot")
  }

  test("merge: exact when neither side is full; bounds survive when full") {
    // exact merge
    val a = SpaceSaving.build(16, Iterator("x", "x", "y"))
    val b = SpaceSaving.build(16, Iterator("y", "z"))
    val m = a.merge(b)
    assert(m.topK(3) == Vector(("x", 2L, 0L), ("y", 2L, 0L), ("z", 1L, 0L)))
    // full-side merge: absent items inherit the full side's min as both
    // estimate share and error; bounds still hold vs the combined truth
    val big = SpaceSaving.build(4,
      (Vector.fill(50)("h") ++ (0 until 40).map(i => s"a$i")).iterator)
    val other = SpaceSaving.build(4, Iterator("h", "h", "b0", "b0", "b1"))
    val merged = big.merge(other)
    assert(merged.counters.size <= 4)
    val h = merged.topK(4).find(_._1 == "h").get
    assert(h._2 >= 52L && h._2 - h._3 <= 52L,
      s"h: est ${h._2} err ${h._3} vs true 52")
  }

  test("q104 licensing equality: bigram exact regime == exact counts") {
    // capacity 4096 ≫ the sf dirs' bigram vocabulary (pinned in
    // OracleAssumptionsSpec) → the sketch over bigrams equals the exact
    // q92-shape twin; this equality is what licenses q104's oracle
    val got = Sketches.heavyHittersOf(docs,
        CorpusOps.rawShingles(col("text"), 2), 4096, 20, "gram")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = CorpusOps.ngramCounts(docs, "text", k = 2, topK = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), 0L))
    assert(got.toSeq == want.toSeq)
  }

  test("eviction regime over bigrams: vocab exceeds capacity, bounds hold") {
    // the motivating regime the header advertises: the BIGRAM vocabulary
    // (thousands) exceeds the sketch capacity (256), so every partition
    // evicts and the treeReduce merge runs in its approximate regime —
    // exactly where an exact groupBy would shuffle the whole key space.
    // Zipf-ish skew (cubed uniform) gives genuine heavy hitters.
    val rnd = new scala.util.Random(7)
    def zipfWord(): String =
      s"w${math.min((math.pow(rnd.nextDouble(), 3) * 150).toInt, 149)}"
    val texts = Vector.fill(800)(
      Vector.fill(30)(zipfWord()).mkString(" "))
    import spark.implicits._
    val sdocs = texts.toDF("text").repartition(8)
    val cap = 256
    val grams = CorpusOps.rawShingles(col("text"), 2)
    val got = Sketches.heavyHittersOf(sdocs, grams, cap, cap, "gram")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = sdocs.select(explode(grams).as("g"))
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(truth.size > cap,
      s"test setup: bigram vocab ${truth.size} must exceed capacity $cap")
    assert(got.length <= cap)
    got.foreach { case (g, est, err) =>
      val t = truth(g)
      assert(est >= t, s"$g: est $est < true $t")
      assert(est - err <= t, s"$g: est-err ${est - err} > true $t")
    }
    // heavy-hitter recall: the skew head must survive eviction — the
    // top-3 TRUE bigrams each dwarf the N/capacity noise floor
    val sketch = got.map(_._1).toSet
    val top3 = truth.toVector.sortBy { case (g, c) => (-c, g) }.take(3)
    top3.foreach { case (g, c) =>
      assert(sketch.contains(g), s"true heavy hitter $g (count $c) evicted")
    }
  }
}
