package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the corpus-statistics operator class
  * where an exact answer needs a full-vocabulary shuffle but a bounded
  * summary does not. Exact top-k frequent items (words, n-grams, hosts)
  * via groupBy is fine when the key space is small; at 10^12 documents
  * the n-gram/URL key space is itself corpus-sized, and the shuffle IS
  * the cost. A Space-Saving summary caps state at `capacity` counters
  * per partition, merges associatively (Agarwal et al., "Mergeable
  * Summaries", PODS'12), and guarantees every true count c(x) satisfies
  * est(x) - err(x) <= c(x) <= est(x) with total overestimation bounded
  * by N / capacity — so the corpus never shuffles: per-partition
  * summaries tree-reduce to the driver in log depth, each message
  * capacity-bounded.
  *
  * Determinism contract: when NO counter is ever evicted (every partial
  * summary sees <= capacity distinct items), the sketch degenerates to
  * exact counting — order-independent, err = 0 everywhere, and therefore
  * DuckDB-oracleable (q103 runs in this regime; the vocab-fits-capacity
  * assumption is pinned per sf dir in OracleAssumptionsSpec). Under
  * eviction the estimates are order- and merge-shape-dependent (only the
  * BOUNDS are guaranteed), which is why the approximate regime is
  * spec-verified against its bounds, not hash-compared.
  */
object Sketches {

  /** Space-Saving summary: at most `capacity` (item, count, err)
    * counters; on overflow the minimum counter is evicted and its count
    * becomes the newcomer's overestimation bound. Mutable, serializable,
    * built per partition and tree-reduced. */
  final class SpaceSaving(val capacity: Int) extends Serializable {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    private[operators] val counters =
      scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    // min-ordered (count, item) index: eviction and minCount are
    // O(log capacity) instead of the O(capacity) minBy scan — at the
    // advertised corpus-scale capacities (4096+) the scan regime was
    // O(N·capacity) per partition in steady-state eviction (round-5
    // advice). Ordering is (count, item), so `head` is the minimum
    // counter with ties broken by key — byte-identical eviction choice
    // to the old scan at fixed input order. Built ON DEMAND (round 8):
    // the index is only ever consulted once a summary is full (eviction
    // in `add`, `minCount` in merge) — in the exact regime, the one the
    // bench queries run in, NO query ever happens, so maintaining the
    // tree cost two O(log n) tuple-boxing ops per token for nothing.
    // Adds are pure HashMap updates until the first consult builds the
    // index from `counters`; it is kept in lockstep from then on. The
    // index is a pure function of `counters` at build time, so its
    // content at any consult is identical to an always-maintained one —
    // eviction choices are byte-identical either way. @transient: also
    // derived state on the wire — serializing it would double every
    // treeReduce message (measured ~2× on the SketchBench 64k-capacity
    // probe); a deserialized sketch starts unbuilt (null) and rebuilds
    // at its next consult, exactly like a fresh one.
    @transient private var byCountIdx:
        scala.collection.mutable.TreeSet[(Long, String)] = null
    private def byCount: scala.collection.mutable.TreeSet[(Long, String)] = {
      if (byCountIdx == null) {
        val t = scala.collection.mutable.TreeSet.empty[(Long, String)]
        counters.foreach { case (k, (c, _)) => t.add((c, k)) }
        byCountIdx = t
      }
      byCountIdx
    }

    private def full: Boolean = counters.size >= capacity
    private[operators] def minCount: Long =
      if (counters.isEmpty) 0L else byCount.head._1

    private def put(x: String, c: Long, e: Long): Unit = {
      if (byCountIdx != null)
        counters.get(x).foreach { case (old, _) =>
          byCountIdx.remove((old, x)) }
      counters.update(x, (c, e))
      if (byCountIdx != null) byCountIdx.add((c, x))
    }

    def add(x: String, w: Long = 1L): this.type = {
      counters.get(x) match {
        case Some((c, e)) =>
          // inlined put minus its redundant lookup — the hot path of
          // every repeated token already holds the old (count, err)
          if (byCountIdx != null) byCountIdx.remove((c, x))
          counters.update(x, (c + w, e))
          if (byCountIdx != null) byCountIdx.add((c + w, x))
        case None if !full => put(x, w, 0L)
        case None =>
          // evict the minimum counter (ties broken by key for
          // reproducibility at fixed input order); its count bounds how
          // much the newcomer may be overestimated
          val (mc, mk) = byCount.head
          byCount.remove((mc, mk))
          counters.remove(mk)
          put(x, mc + w, mc)
      }
      this
    }

    /** Mergeable-summaries combine: an item absent from a FULL side
      * could have been evicted there with count up to that side's min,
      * so the absent side contributes its min to the estimate and to
      * the error bound; the union is then trimmed back to `capacity`
      * keeping the largest counts. Associative up to the guaranteed
      * bounds; exact (and order-independent) when neither side is
      * full. */
    def merge(o: SpaceSaving): SpaceSaving = {
      val mA = if (full) minCount else 0L
      val mB = if (o.full) o.minCount else 0L
      val out = new SpaceSaving(capacity)
      val keys = counters.keySet ++ o.counters.keySet
      val combined = keys.iterator.map { k =>
        val (ca, ea) = counters.getOrElse(k, (mA, mA))
        val (cb, eb) = o.counters.getOrElse(k, (mB, mB))
        (k, (ca + cb, ea + eb))
      }.toVector
      val kept =
        if (combined.size <= capacity) combined
        else combined.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
      kept.foreach { case (k, (c, e)) => out.put(k, c, e) }
      out
    }

    /** Top `k` by estimated count desc, then item asc — deterministic
      * given the counter state. Returns (item, est, err). */
    def topK(k: Int): Vector[(String, Long, Long)] =
      counters.iterator.map { case (x, (c, e)) => (x, c, e) }
        .toVector
        .sortBy { case (x, c, _) => (-c, x) }
        .take(k)
  }

  object SpaceSaving {
    def build(capacity: Int, it: Iterator[String]): SpaceSaving = {
      val s = new SpaceSaving(capacity)
      it.foreach(s.add(_))
      s
    }
  }

  /** Top-`k` most frequent whitespace tokens of `textCol` via
    * Space-Saving. Returns (word, cnt, err); see [[heavyHittersOf]]. */
  def heavyHitters(docs: DataFrame, textCol: String, capacity: Int,
      k: Int): DataFrame =
    heavyHittersOf(docs, split(col(textCol), " "), capacity, k, "word")

  /** Top-`k` most frequent items of an arbitrary per-row token ARRAY
    * column (words, n-gram shingles, URLs …) via Space-Saving: narrow
    * explode → one capacity-bounded summary per partition
    * (mapPartitions — genuine per-partition imperative state, the
    * documented RDD exception) → log-depth treeReduce merge. The corpus
    * never shuffles; driver traffic is O(capacity · log partitions) —
    * the shape that matters when the key space is itself corpus-sized
    * (the n-gram regime this file's header motivates: an exact groupBy
    * would shuffle the whole key space). Returns (itemCol, cnt, err) in
    * (cnt desc, item asc) order; err = 0 rows are exact. */
  def heavyHittersOf(docs: DataFrame, items: Column, capacity: Int,
      k: Int, itemCol: String): DataFrame = {
    require(k > 0 && k <= capacity,
      s"need 0 < k <= capacity, got k=$k capacity=$capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    // the item explode + per-item summary updates are CPU-amplifying —
    // spread one-split inputs across the session width first (no-op at
    // corpus scale). Summary results are unaffected by the partition
    // count in the exact regime (merge is exact addition); in the
    // eviction regime the Space-Saving error bound holds under ANY
    // merge tree (mergeable-summaries property, SketchBench-checked).
    val toks = Partitioning.spreadSmallScan(spark, docs)
      .select(explode(items).as("w")).as[String]
    val merged = toks.rdd
      .mapPartitions(it => Iterator(SpaceSaving.build(capacity, it)))
      .treeReduce((a, b) => a.merge(b), depth = 2)
    merged.topK(k).toDF(itemCol, "cnt", "err")
  }
}
