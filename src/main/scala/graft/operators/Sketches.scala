package graft.operators

import org.apache.spark.sql.DataFrame
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

    private def full: Boolean = counters.size >= capacity
    private[operators] def minCount: Long =
      if (counters.isEmpty) 0L else counters.valuesIterator.map(_._1).min

    def add(x: String, w: Long = 1L): this.type = {
      counters.get(x) match {
        case Some((c, e)) => counters.update(x, (c + w, e))
        case None if !full => counters.update(x, (w, 0L))
        case None =>
          // evict the minimum counter (ties broken by key for
          // reproducibility at fixed input order); its count bounds how
          // much the newcomer may be overestimated
          val (mk, (mc, _)) = counters.minBy { case (k, (c, _)) => (c, k) }
          counters.remove(mk)
          counters.update(x, (mc + w, mc))
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
      kept.foreach { case (k, ce) => out.counters.update(k, ce) }
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
    * Space-Saving: narrow explode → one capacity-bounded summary per
    * partition (mapPartitions — genuine per-partition imperative state,
    * the documented RDD exception) → log-depth treeReduce merge. The
    * corpus never shuffles; driver traffic is O(capacity · log
    * partitions). Returns (word, cnt, err) in (cnt desc, word asc)
    * order; err = 0 rows are exact. */
  def heavyHitters(docs: DataFrame, textCol: String, capacity: Int,
      k: Int): DataFrame = {
    require(k > 0 && k <= capacity,
      s"need 0 < k <= capacity, got k=$k capacity=$capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(col(textCol), " ")).as("w")).as[String]
    val merged = words.rdd
      .mapPartitions(it => Iterator(SpaceSaving.build(capacity, it)))
      .treeReduce((a, b) => a.merge(b), depth = 2)
    merged.topK(k).toDF("word", "cnt", "err")
  }
}
