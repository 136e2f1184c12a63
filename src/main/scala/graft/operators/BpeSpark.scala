package graft.operators

import graft.core.Bpe
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE vocabulary training — tokenizer learning at corpus
  * scale, the same driver-loop-with-distributed-state shape as the CC
  * fixpoint:
  *   - the corpus collapses ONCE to a word-frequency table (vocab-sized,
  *     stays a distributed Dataset — at 10^12 docs the vocabulary is
  *     millions of rows, never collected);
  *   - each merge round is one map-side-combinable pair-count aggregate
  *     plus a ONE-ROW collect (the argmax pair) plus a narrow typed map
  *     applying the merge — per-round driver traffic is one row, exactly
  *     like CC's accumulator convergence count;
  *   - per-round state is persisted and the previous round freed, so the
  *     plan never re-derives round k from round 0 (the common-subplan
  *     lesson from the CC fixpoint, applied from the start).
  * All pair/merge/tie-break semantics live in graft.core.Bpe, shared with
  * the in-process reference trainer — the BpeSpec equality is by
  * construction, not coincidence.
  */
object BpeSpark {

  /** (word, count) over single-space tokenization. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))

  /** Frequency-weighted adjacent symbol-pair counts of the INITIAL
    * (one-symbol-per-char) tokenization — round 1 of training, fully
    * SQL-expressible, so it carries a DuckDB oracle (q97). */
  def initialPairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val wc = wordCounts(docs, textCol)
    // pairs (word[i], word[i+1]) for i in 1..len-1; single-char words
    // contribute nothing (sequence would reverse on start > stop, so
    // guard with an empty array)
    val idx = when(length(col("word")) > 1,
      sequence(lit(1), length(col("word")) - 1))
      .otherwise(array().cast("array<int>"))
    wc.select(col("c"), explode(transform(idx, i => struct(
        col("word").substr(i, lit(1)).as("a"),
        col("word").substr(i + 1, lit(1)).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("c")).as("cnt"))
  }

  /** Train `nMerges` merges; returns (rank, a, b, cnt) in merge order.
    * Stops early when no adjacent pair remains. */
  def trainMerges(docs: DataFrame, textCol: String,
      nMerges: Int): Vector[(Int, String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    var vocab: Dataset[(Vector[String], Long)] = wordCounts(docs, textCol)
      .as[(String, Long)]
      .map { case (w, c) => (Bpe.symbolize(w), c) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    try {
      var k = 0
      var done = false
      while (k < nMerges && !done) {
        // pair counts: flatMap + groupBy(sum) — partial aggregation
        // collapses each partition's pairs before the shuffle
        val best = vocab.flatMap { case (syms, c) =>
            Bpe.pairsOf(syms).map { case (a, b) => (a, b, c) }
          }.toDF("a", "b", "c")
          .groupBy("a", "b").agg(sum(col("c")).as("cnt"))
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1) // ONE row to the driver per round
          .as[(String, String, Long)]
          .collect()
        best.headOption match {
          case None => done = true
          case Some((a, b, cnt)) =>
            merges += ((k, a, b, cnt))
            val prev = vocab
            vocab = prev.map { case (s, c) => (Bpe.mergeOnce(s, a, b), c) }
              .persist(StorageLevel.MEMORY_AND_DISK)
            vocab.count() // materialize round k before freeing round k-1
            prev.unpersist(blocking = false)
            k += 1
        }
      }
      merges.result()
    } finally vocab.unpersist(blocking = false)
  }

  /** Batched distributed training: per round, ONE pair-count aggregate,
    * one `min(batchSize, remaining)`-row TakeOrdered collect, and the
    * symbol-disjoint PREFIX of that ranked list applied in a single
    * narrow pass (selection rule + divergence contract documented at
    * Bpe.trainBatched — symbol-disjoint merges cannot perturb each
    * other's counts, so every applied merge's recorded count is exact).
    * This is what makes tokenizer training viable at a production
    * 30–50k merge vocabulary: the exact trainer's cost is dominated by
    * nMerges sequential Spark jobs (~100 ms dispatch each → hours of
    * fixed cost); batching amortizes that dispatch by up to batchSize×
    * while vocab stays a distributed Dataset and driver traffic stays
    * ≤ batchSize rows per round. Returns (merges-in-rank-order,
    * rounds-executed); batchSize = 1 is exactly `trainMerges`. */
  def trainMergesBatched(docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int): (Vector[(Int, String, String, Long)], Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    var vocab: Dataset[(Vector[String], Long)] = wordCounts(docs, textCol)
      .as[(String, Long)]
      .map { case (w, c) => (Bpe.symbolize(w), c) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    try {
      var k = 0
      var rounds = 0
      var done = false
      while (k < nMerges && !done) {
        val top = vocab.flatMap { case (syms, c) =>
            Bpe.pairsOf(syms).map { case (a, b) => (a, b, c) }
          }.toDF("a", "b", "c")
          .groupBy("a", "b").agg(sum(col("c")).as("cnt"))
          // UTF8String binary order == Bpe.Utf8Ordering (BpeSpec parity)
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(math.min(batchSize, nMerges - k))
          .as[(String, String, Long)]
          .collect().toVector
        val batch = Bpe.disjointPrefix(top)
        if (batch.isEmpty) done = true
        else {
          batch.foreach { case (a, b, cnt) =>
            merges += ((k, a, b, cnt)); k += 1
          }
          val prev = vocab
          vocab = prev.map { case (s, c) =>
            (batch.foldLeft(s) { case (acc, (a, b, _)) =>
              Bpe.mergeOnce(acc, a, b) }, c)
          }.persist(StorageLevel.MEMORY_AND_DISK)
          vocab.count() // materialize round before freeing the previous
          prev.unpersist(blocking = false)
          rounds += 1
        }
      }
      (merges.result(), rounds)
    } finally vocab.unpersist(blocking = false)
  }

  /** Default bound on the per-partition word→tokens encode cache: ~1M
    * distinct words comfortably fits an executor core's share of memory
    * (entries are short token vectors) while covering the Zipf head of
    * any real corpus partition. */
  val DefaultMaxCacheWords: Int = 1 << 20

  /** Tokenize the corpus with a learned merge table: per-doc token and
    * distinct-token counts under the trained vocabulary. The merge ranks
    * broadcast (a merge table is nMerges rows — tiny); encoding is a
    * narrow typed map, zero shuffle before the final per-doc aggregate.
    * The per-word encode is cached per partition — corpus word frequency
    * follows a Zipf law, so the hit rate is high. The cache is SIZE
    * BOUNDED at `maxCacheWords`: a pathological partition (unique-word
    * spam) would otherwise grow it without limit; on overflow it is
    * cleared — the Zipf head re-warms within a few rows, and an
    * adversarial all-unique partition degrades to cache-free encoding
    * instead of an OOM. */
  def encodeTokenCounts(docs: DataFrame, textCol: String, idCol: String,
      merges: Vector[(Int, String, String, Long)],
      maxCacheWords: Int = DefaultMaxCacheWords): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(maxCacheWords > 0,
      s"maxCacheWords must be positive, got $maxCacheWords")
    val ranks: Map[(String, String), Int] =
      merges.map { case (rank, a, b, _) => (a, b) -> rank }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val r = bc.value
        val cache = scala.collection.mutable.Map.empty[String, Vector[String]]
        it.map { case (id, text) =>
          val toks = text.split(' ').iterator
            .flatMap { w =>
              cache.get(w) match {
                case Some(t) => t
                case None =>
                  val t = Bpe.encode(w, r)
                  if (cache.size >= maxCacheWords) cache.clear()
                  cache.update(w, t)
                  t
              }
            }
            .toVector
          (id, toks.length, toks.distinct.length)
        }
      }.toDF(idCol, "n_tokens", "n_distinct_tokens")
  }

  /** The merge table as a DataFrame (driver query surface, q98). */
  def mergeTable(spark: SparkSession, docs: DataFrame, textCol: String,
      nMerges: Int): DataFrame = {
    import spark.implicits._
    trainMerges(docs, textCol, nMerges)
      .toDF("rank", "a", "b", "cnt")
  }
}
