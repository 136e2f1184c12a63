package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-shape assumptions the byte-level DuckDB oracles replay
  * (q45/q46/q47 FNV + rolling hashes, q58 XXH64, q65 float block-means,
  * and the hashed-key candidate joins in q44/q45). Checked in TWO places:
  * OracleAssumptionsSpec (sbt test) and Verify.main itself — so a
  * regenerated testdata dir that violates one fails the VERIFY RUN with a
  * named reason instead of surfacing as a confusing oracle hash mismatch
  * after the driver's DuckDB compare.
  */
object OracleAssumptions {

  /** All violated assumptions for `dir` (empty = clean). Each entry names
    * the assumption and the oracles that depend on it. */
  def violations(spark: SparkSession, dir: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val nonAscii = docs
      .where(!col("text").rlike("^[\\x20-\\x7e]*$")).count()
    if (nonAscii > 0) out += s"$dir: $nonAscii non-printable-ASCII docs " +
      "— the q46/q47/q65 byte-level oracles assume ascii(char) == UTF-8 byte"

    val badSpacing = docs
      .where(col("text").startsWith(" ") || col("text").endsWith(" ") ||
        col("text").contains("  ")).count()
    if (badSpacing > 0) out += s"$dir: $badSpacing docs with irregular " +
      "spacing — Java split(' ') drops trailing empties while DuckDB " +
      "string_split keeps them (q45/q46 oracles)"

    val badName = spark.read.parquet(s"$dir/customer.parquet")
      .where(col("c_name").isNull || length(col("c_name")) >= 32 ||
        !col("c_name").rlike("^[\\x20-\\x7e]*$")).count()
    if (badName > 0) out += s"$dir: $badName c_name values outside the " +
      "q58 XXH64 oracle's sub-32-byte ASCII scope"

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val badDim = emb.where(size(col("embedding")) =!= 64).count()
    if (badDim > 0) out += s"$dir: $badDim non-64-dim embeddings " +
      "(q52's embedded hyperplanes assume dim 64)"

    // q108's Spark side excludes vectors with ANY null component (they
    // cannot be normalized), but its DuckDB oracle only drops n2 = 0 —
    // DuckDB's list_aggregate('sum') IGNORES null elements, so a vector
    // with some null components would keep a partial norm and stay in
    // the oracle's ranking while Spark drops it (ADVICE r6)
    val nullComp = emb.where(col("embedding").isNull ||
      exists(col("embedding"), x => x.isNull)).count()
    if (nullComp > 0) out += s"$dir: $nullComp embeddings with null " +
      "components — the q108 oracle's list_aggregate norm would keep " +
      "vectors the Spark side excludes as unnormalizable"

    // q44/q45 candidate joins key on 64-bit hashes while their DuckDB
    // oracles join on the exact shingle strings / band slices: equality
    // holds only while the corpus has NO 64-bit collisions among distinct
    // shingles (ADVICE r3). Pin it: distinct xxhash64(3-shingle) count
    // must equal distinct 3-shingle count. (The q45 band hash is 32-bit
    // Murmur3 over its 2-element signature slices — 32 bands of 2, the
    // parameters checked below — same pin over the band keys.)
    val sh = docs.select(
      explode(graft.operators.Dedup.shingles(col("text"), 3)).as("s"))
    val Array(nShingle, nHash) = sh
      .agg(countDistinct(col("s")), countDistinct(xxhash64(col("s"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    if (nShingle != nHash) out += s"$dir: xxhash64 collision among " +
      s"distinct 3-shingles ($nShingle strings, $nHash hashes) — the " +
      "q44/q106 hashed-key candidate join (shared shinglePairSizes " +
      "machinery) would admit pairs the exact-string oracles reject"

    // q45's exact parameters: k=2 shingles, 64 hashes, 32 bands of 2
    val sigs = graft.operators.Dedup
      .minhashSignatures(docs, "text", "doc_id", k = 2, numHashes = 64)
    val bands = sigs.select(posexplode(
      transform(sequence(lit(0), lit(31)), b =>
        struct(slice(col("signature"), b * 2 + 1, lit(2)).as("sl"),
          hash(slice(col("signature"), b * 2 + 1, lit(2)), b).as("h"))))
      .as(Seq("band", "v")))
      .select(col("band"), col("v.sl").as("sl"), col("v.h").as("h"))
    val collided = bands.groupBy("band", "h")
      .agg(countDistinct(col("sl")).as("n"))
      .where(col("n") > 1).count()
    if (collided > 0) out += s"$dir: $collided Murmur3 band-hash " +
      "collisions among distinct signature slices — the q45 banded " +
      "candidate join would admit pairs the exact-slice oracle rejects"

    // q103's Space-Saving sketch is oracle-compared against plain exact
    // counts, which is valid ONLY in the sketch's exact regime: the
    // corpus vocabulary must fit the 4096-counter capacity with margin,
    // so no partial summary ever evicts (per-partition distinct counts
    // are bounded by the global distinct count)
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w"))).collect()(0).getLong(0)
    if (vocab > 2048) out += s"$dir: $vocab distinct tokens exceeds half " +
      "the q103/q107 sketch capacity (4096) — the exact-regime oracle " +
      "assumption (no counter eviction anywhere; q107's shards can only " +
      "shrink a summary's key space) is no longer safe"

    // q105's oracle replays percentile_approx's exact regime as the
    // element at rank ⌈q·n⌉ — valid only while (a) every lang group
    // stays ≤ accuracy/2 = 5000 rows, below which the GK summary can
    // never compress/merge a sample away, and (b) n_chars is exactly
    // representable as DOUBLE (ApproximatePercentile round-trips
    // values through Double — Round6Spec demonstrates the 2^62-rounding
    // failure beyond 2^53)
    val maxGroup = docs.groupBy("lang").count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    if (maxGroup > 4999) out += s"$dir: largest lang group $maxGroup " +
      "exceeds half the q105 accuracy (10000) — the GK no-compression " +
      "exact-regime oracle assumption is no longer safe"
    val bigChars = docs
      .where(abs(col("n_chars")) > (1L << 53)).count()
    if (bigChars > 0) out += s"$dir: $bigChars n_chars values beyond " +
      "2^53 — percentile_approx round-trips through Double, so the " +
      "q105 rank-formula oracle would compare rounded values"

    // q104 runs the same sketch over word BIGRAMS (rawShingles k=2,
    // the q92 gram expression) — its exact-regime oracle needs the
    // bigram vocabulary to fit the 4096 capacity with the same margin
    val bigramVocab = docs
      .select(explode(graft.operators.CorpusOps.rawShingles(col("text"), 2))
        .as("g"))
      .agg(countDistinct(col("g"))).collect()(0).getLong(0)
    if (bigramVocab > 2048) out += s"$dir: $bigramVocab distinct bigrams " +
      "exceeds half the q104 sketch capacity (4096) — the exact-regime " +
      "oracle assumption (no counter eviction anywhere) is no longer safe"

    // q115 pins rounds=12 as the FIXPOINT of the 5-core peel on the
    // customer-key graph: the unrolled oracle is hash-correct at any
    // round count, but the query's claim is "this IS the 5-core", which
    // holds only if a 13th round would remove nothing. Replayed
    // sequentially here (node-set-sized: one long per customer row).
    locally {
      val ks = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
      val raw = Seq.newBuilder[(Long, Long)]
      for (k <- ks) {
        if (k % 30 != 29) raw += ((k, k + 1))
        if (k % 30 < 28) raw += ((k, k + 2))
        if (k % 100 != 0) {
          val l = (k / 100) * 100
          raw += ((math.min(k, l), math.max(k, l)))
        }
        if ((k / 100) % 2 == 0) {
          if (k % 30 < 27) raw += ((k, k + 3))
          if (k % 30 < 26) raw += ((k, k + 4))
        }
      }
      var e = raw.result().filter(p => p._1 != p._2).toSet
      def peelOnce(es: Set[(Long, Long)]): Set[(Long, Long)] = {
        val deg = scala.collection.mutable.Map.empty[Long, Int]
          .withDefaultValue(0)
        for ((a, b) <- es) { deg(a) += 1; deg(b) += 1 }
        es.filter { case (a, b) => deg(a) >= 5 && deg(b) >= 5 }
      }
      for (_ <- 1 to 12) e = peelOnce(e)
      if (peelOnce(e) != e) out += s"$dir: the 5-core peel has not " +
        "converged after q115's 12 pinned rounds — the query's output " +
        "is a mid-cascade state, not the 5-core; raise q115's rounds " +
        "(query AND oracle share the constant) to the new fixpoint depth"
    }

    // q116/q117/q119 hash walk-step key strings ("walk:step:cand" and
    // the weighted "walk:step:cand:copy") with XXH64; the DuckDB replay
    // (XxHash64Sql) only covers sub-32-byte ASCII inputs, so the
    // largest possible key must fit. Node ids are customer keys, steps
    // a single digit, copies ≤ 2 digits at these weights, so the bound
    // is 2·digits(max key) + 6 (step digit + copy digits + 3 colons)
    // < 32 — pinned here so a regenerated dir with huge keys fails by
    // name (past the bound the replay maps keys to NULL-hash, which
    // would surface as a confusing ordering mismatch).
    locally {
      // max walk node id = max key + 2 (triEdges' k+2 arm)
      val maxKey = spark.read.parquet(s"$dir/customer.parquet")
        .agg(max(length((col("c_custkey") + 2).cast("string"))))
        .head.getInt(0)
      if (2 * maxKey + 6 >= 32) out += s"$dir: customer keys reach " +
        s"$maxKey digits — the q116/q117/q119 walk keys would exceed " +
        "the XXH64 SQL replay's 32-byte scope"
    }

    out.result()
  }
}
