package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators that sit above dedup/similarity in a
  * data pipeline: deterministic sampling (train/dev splits that are stable
  * across reruns and cluster sizes), TF-IDF term scoring, corpus n-gram
  * statistics, and benchmark decontamination.
  *
  * Everything here is shuffle-minimal by construction:
  *   - hash sampling is a narrow filter (no shuffle, no RNG state — the
  *     sample is a pure function of the row, so it is identical at any
  *     parallelism and resumable for free);
  *   - stratified sampling pre-reduces per partition with bounded heaps
  *     (the shuffle moves ≤ partitions × strata × quota rows, never the
  *     corpus);
  *   - TF-IDF is two map-side-combinable aggregations plus one join on
  *     term (document-frequency side is vocabulary-sized);
  *   - decontamination broadcasts the benchmark shingle set (benchmarks
  *     are tiny next to a 100 TB corpus).
  */
object CorpusOps {

  /** Deterministic Bernoulli-by-hash sample: keeps a row iff
    * `pmod(xxhash64(string(key)), 100) < pct`. The standard reproducible
    * train/dev split — no RNG seed plumbing, no `sample()` instability
    * under partition changes; membership is a pure per-row function, so
    * the same row lands on the same side of the split on every run, at
    * every parallelism, and under resume. Narrow (no shuffle). */
  def sampleByHash(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.where(pmod(xxhash64(key.cast("string")), lit(100)) < lit(pct))
  }

  /** Deterministic stratified sample: the `quota` rows of each stratum
    * with the smallest `(xxhash64(string(id)), id)` — i.e. a per-stratum
    * uniform draw that is a pure function of the data (same membership at
    * any parallelism / after resume).
    *
    * Scale shape: a naive `row_number() OVER (PARTITION BY stratum)` sorts
    * whole strata — with few strata (languages) that is a handful of
    * monster partitions at 100 TB. Instead each input partition keeps at
    * most `quota` candidates per stratum in a bounded max-heap (worse-first
    * ordering, head = weakest kept), so the exact window afterwards sees
    * ≤ partitions × strata × quota rows. Bit-identical to the naive window
    * (spec-pinned in Round4Spec).
    *
    * Returns (stratum STRING, id LONG, rn INT) with rn ∈ [1, quota] in
    * hash order — rn is the stable intra-stratum draw order, usable for
    * nested sub-splits. */
  def stratifiedSampleByHash(df: DataFrame, strataCol: String, idCol: String,
      quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    // same silent-cast trap the similarity operators guard against: a
    // string/decimal id would cast("long") to null for every row and the
    // sample would silently collapse to quota rows of null ids
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"stratifiedSampleByHash needs an integral id column, got " +
        s"$idCol: $idType — derive one first (xxhash64 / zipWithIndex)")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(
      col(strataCol).cast("string").as("stratum"),
      col(idCol).cast("long").as("id"),
      xxhash64(col(idCol).cast("string")).as("h"))
    // worse-first: the heap head is the LARGEST (h, id) kept, evicted when
    // a smaller candidate arrives
    val worseFirst = Ordering.Tuple2[Long, Long]
    val candidates = keyed.as[(String, Long, Long)].mapPartitions { it =>
      val heaps = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.PriorityQueue[(Long, Long)]]
      it.foreach { case (stratum, id, h) =>
        val heap = heaps.getOrElseUpdate(stratum,
          scala.collection.mutable.PriorityQueue.empty[(Long, Long)](worseFirst))
        if (heap.size < quota) heap.enqueue((h, id))
        else if (worseFirst.lt((h, id), heap.head)) {
          heap.dequeue(); heap.enqueue((h, id))
        }
      }
      heaps.iterator.flatMap { case (stratum, heap) =>
        heap.iterator.map { case (h, id) => (stratum, id, h) }
      }
    }.toDF("stratum", "id", "h")
    val w = Window.partitionBy("stratum").orderBy(col("h"), col("id"))
    candidates
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= quota)
      .select("stratum", "id", "rn")
  }

  /** All word k-grams of `text`, duplicates KEPT (unlike Dedup.shingles,
    * which is set-semantics for Jaccard) — frequency statistics need the
    * multiset. A document shorter than k words contributes its single
    * short gram, mirroring Dedup.shingles' boundary. */
  def rawShingles(text: Column, k: Int): Column = {
    val words = split(text, " ")
    transform(
      sequence(lit(0), greatest(size(words) - k, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(k))))
  }

  /** Corpus n-gram frequency table: top `topK` word k-grams by count
    * (count desc, gram asc). The LM-statistics / contamination-audit
    * staple. Explode → map-side-combinable count → TakeOrdered top-k;
    * no full sort, no single-partition exchange. */
  def ngramCounts(docs: DataFrame, textCol: String, k: Int,
      topK: Int): DataFrame =
    // the shingle explode is CPU-amplifying — spread one-split inputs
    // across the session width first (no-op at corpus scale; see
    // Partitioning.spreadSmallScan)
    Partitioning.spreadSmallScan(docs.sparkSession,
        docs.select(col(textCol)))
      .select(explode(rawShingles(col(textCol), k)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(topK)

  /** Per-document top-`topK` TF-IDF terms. tf = in-document term count;
    * idf = ln((1 + N) / (1 + df)) + 1 (smooth variant, never zero);
    * score = tf · idf rounded to 6 digits (cross-engine libm parity —
    * same policy as the q71 transcendental surface).
    *
    * Scale shape: tokenize-explode → (doc, term) count (map-side combine)
    * → term document-frequency (vocabulary-sized, a second combinable
    * agg) → join back on term → per-doc top-k window. The window
    * partitions at document granularity — billions of small partitions,
    * no skew. The corpus size N rides in as a broadcast singleton. */
  def tfIdf(docs: DataFrame, textCol: String, idCol: String,
      topK: Int): DataFrame = {
    // tokenize-explode on a one-split input runs one-core — spread small
    // inputs first (no-op at corpus scale)
    val toks = Partitioning.spreadSmallScan(docs.sparkSession,
        docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc"),
        explode(split(col(textCol), " ")).as("term"))
    val tf = toks.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(
        col("tf").cast("double") *
          (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) +
            lit(1.0)), 6))
    val w = Window.partitionBy("doc")
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= topK)
      .select(col("doc"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Deterministic fixed-size token chunking with overlap — the packing
    * stage that turns documents into model-context-sized training/RAG
    * windows. Chunk j covers tokens [j·stride, j·stride + chunkSize);
    * starts run 0, stride, 2·stride, … while < |tokens|, so trailing
    * chunks may be short (kept — dropping them would lose text).
    * Narrow explode, zero shuffle; chunk identity (id, chunk_idx) is a
    * pure function of the row, so downstream dedup/resume work
    * unchanged at any parallelism.
    *
    * Returns (idCol, chunk_idx INT, n_tokens INT, chunk STRING). */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got stride=$stride size=$chunkSize")
    val w = split(col(textCol), " ")
    // 3-arg sequence generates the stride-spaced starts DIRECTLY — the
    // filter-every-index alternative allocates |tokens| ints per row
    // just to discard (stride-1)/stride of them
    val starts = sequence(lit(0), size(w) - 1, lit(stride))
    val chunks = transform(starts, s => struct(
      size(slice(w, s + 1, lit(chunkSize))).as("n_tokens"),
      concat_ws(" ", slice(w, s + 1, lit(chunkSize))).as("chunk")))
    df.select(col(idCol), posexplode(chunks))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col.n_tokens").as("n_tokens"), col("col.chunk").as("chunk"))
  }

  /** Benchmark decontamination: for every corpus doc, the number of
    * distinct word k-grams it shares with ANY benchmark doc (docs with no
    * overlap are absent). The standard eval-leakage scrub before training.
    *
    * Scale shape: both sides reduce to DISTINCT shingles first; the
    * benchmark side (tiny vs a 100 TB corpus) broadcasts, so the probe is
    * a narrow BroadcastHashJoin over the corpus shingles — no corpus
    * shuffle — followed by a doc-granularity count. Join keys are the raw
    * gram strings: with a broadcast build side there is no wide-key
    * shuffle to save, so exactness costs nothing (no hash-collision
    * caveat to pin, unlike the LSH candidate joins). */
  def contaminationCounts(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, k: Int): DataFrame = {
    // both sides' shingle explodes are the CPU-amplifying stages —
    // spread one-split inputs first (no-op at corpus scale)
    val corpusSh = Partitioning.spreadSmallScan(corpus.sparkSession,
        corpus.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc"),
        explode(Dedup.shingles(col(textCol), k)).as("gram"))
    val benchSh = Partitioning.spreadSmallScan(benchmark.sparkSession,
        benchmark.select(col(textCol)))
      .select(explode(Dedup.shingles(col(textCol), k)).as("gram"))
      .distinct()
    corpusSh.join(broadcast(benchSh), "gram")
      .groupBy("doc").agg(count(lit(1)).as("n_shared"))
  }
}
