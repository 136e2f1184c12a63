package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CorpusOps: deterministic sampling, TF-IDF, n-gram stats,
  * decontamination. The samplers' cross-engine exactness is covered by the
  * q89/q90 DuckDB oracles; here we pin the *distributed-correctness*
  * properties (partition invariance, bounded-heap == naive window) and
  * exact values on hand-checkable corpora.
  */
class CorpusOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("sampleByHash membership is invariant under repartitioning") {
    val base = CorpusOps.sampleByHash(docs, col("doc_id"), 37)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(base.nonEmpty && base.size < docs.count(),
      "sample should be a proper nonempty subset")
    for (p <- Seq(1, 7)) {
      val re = CorpusOps.sampleByHash(docs.repartition(p), col("doc_id"), 37)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(re == base, s"membership changed at repartition($p)")
    }
    // complement property: pct and its complement partition the corpus
    val anti = CorpusOps.sampleByHash(docs, col("doc_id"), 100)
    assert(anti.count() == docs.count(), "pct=100 must keep everything")
    assert(CorpusOps.sampleByHash(docs, col("doc_id"), 0).count() == 0L)
  }

  test("stratifiedSampleByHash == naive window, bit-identical") {
    val quota = 20
    val got = CorpusOps.stratifiedSampleByHash(docs, "lang", "doc_id", quota)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // naive: full window over the whole stratum, no per-partition heap
    val w = Window.partitionBy("stratum").orderBy(col("h"), col("id"))
    val naive = docs.select(
        col("lang").cast("string").as("stratum"),
        col("doc_id").cast("long").as("id"),
        xxhash64(col("doc_id").cast("string")).as("h"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= quota)
      .select("stratum", "id", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == naive)
    // every stratum filled to its quota (sf0.001 has ≥ quota docs per lang)
    val perStratum = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perStratum.values.forall(_ == quota),
      s"unfilled strata: ${perStratum.filter(_._2 != quota)}")
  }

  test("stratifiedSampleByHash honors quota when a stratum is smaller") {
    import spark.implicits._
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L))
      .toDF("lang", "doc_id").repartition(4)
    val got = CorpusOps.stratifiedSampleByHash(tiny, "lang", "doc_id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("rawShingles keeps duplicates; boundary matches Dedup.shingles") {
    import spark.implicits._
    val df = Seq("x y x y", "solo").toDF("text")
    val raw = df.select(CorpusOps.rawShingles(col("text"), 2).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(raw(0) == Seq("x y", "y x", "x y"))  // multiset — dup kept
    assert(raw(1) == Seq("solo"))               // short-doc single gram
  }

  test("tfIdf exact values on a hand-checked corpus") {
    import spark.implicits._
    // 3 docs; "rare" appears in 1 doc, "common" in all 3
    val corpus = Seq(
      (1L, "common rare common"),
      (2L, "common x"),
      (3L, "common y")).toDF("doc_id", "text")
    val got = CorpusOps.tfIdf(corpus, "text", "doc_id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    def idf(df: Long) = math.log(4.0 / (1.0 + df)) + 1.0
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Set(
      (1L, "common", 2L, 3L, r6(2 * idf(3))),
      (1L, "rare", 1L, 1L, r6(idf(1))),
      (2L, "common", 1L, 3L, r6(idf(3))),
      (2L, "x", 1L, 1L, r6(idf(1))),
      (3L, "common", 1L, 3L, r6(idf(3))),
      (3L, "y", 1L, 1L, r6(idf(1))))
    assert(got == want)
  }

  test("ngramCounts exact on a tiny corpus, tie-broken by gram") {
    import spark.implicits._
    val corpus = Seq("a b a b", "a b c").toDF("text")
    val got = CorpusOps.ngramCounts(corpus, "text", 2, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // "a b": 2+1=3; "b a": 1; "b c": 1 — ties ordered gram asc
    assert(got == List(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("repetitionSignals exact on crafted docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),          // 1 distinct of 4; bigrams: "a a" ×3 of 3
      (2L, "x y x y z"),        // 3/5; bigrams: x y, y x, x y, y z → 2/4
      (3L, "unique words only") // 3/3; bigrams all distinct → 1/2
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    assert(got == Set((1L, 0.25, 1.0), (2L, 0.6, 0.5), (3L, 1.0, 0.5)))
  }

  test("repetitionSignals matches the relational formulation on " +
      "tokenizer edge cases") {
    // The round-8 per-row rewrite hand-rolls the tokenizer; pin it
    // against the OLD explode/agg/join formulation (reconstructed here
    // from the same split/rawShingles expressions) on exactly the
    // inputs where hand-rolling goes wrong: empty text, single token,
    // leading/trailing/double spaces (empty tokens), and a short doc
    // whose "bigram" is its only token (the rawShingles boundary).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, ""),                  // split -> [""]: 1 word, gram = ""
      (2L, "solo"),              // 1 word, gram = "solo"
      (3L, " lead"),             // ["", "lead"]
      (4L, "trail "),            // ["trail", ""]
      (5L, "a  b"),              // ["a", "", "b"] — double space
      (6L, "a a  a a"),          // empties + repeats interleaved
      (7L, "x y x y x")
    ).toDF("doc_id", "text")
    val w = split(col("text"), " ")
    val grams = CorpusOps.rawShingles(col("text"), 2)
    val base = docs.select(col("doc_id"),
      (size(array_distinct(w)).cast("double") / size(w).cast("double"))
        .as("distinct_word_ratio"),
      size(grams).as("n_grams"))
    val top = docs.select(col("doc_id"), explode(grams).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_cnt"))
    val want = base.join(top, Seq("doc_id"))
      .select(col("doc_id"), col("distinct_word_ratio"),
        (col("top_cnt").cast("double") / col("n_grams").cast("double"))
          .as("top_bigram_frac"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    val got = TextAnalysis.repetitionSignals(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    assert(got == want)
    assert(got.size == 7, "every doc must emit exactly one row")
  }

  test("piiRedact exact counts and replacement text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b-c@ex-1.org and d@e.io now"),
      (2L, "call 555-0123 or 555-123-4567 ok"),
      (3L, "clean text 12-34 no@tld x@y"), // near-misses must NOT match
      (4L, "both bob@x.co 555-9999"),
      // phone-shaped local part: ONE email, zero phones — counts must
      // equal the placeholder tokens actually emitted
      (5L, "reach 555-123-4567@mail.com now")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(docs, "text")
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).toSet
    assert(got == Set(
      (1L, 2, 0, "mail [EMAIL] and [EMAIL] now"),
      (2L, 0, 2, "call [PHONE] or [PHONE] ok"),
      (3L, 0, 0, "clean text 12-34 no@tld x@y"),
      (4L, 1, 1, "both [EMAIL] [PHONE]"),
      (5L, 1, 0, "reach [EMAIL] now")))
  }

  test("chunkTokens: exact windows, overlap, short-doc and tail cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                   // shorter than chunk
      (3L, "solo")                                     // single token
    ).toDF("doc_id", "text")
    val got = CorpusOps.chunkTokens(docs, "text", "doc_id",
        chunkSize = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).toSet
    val want = Set(
      (1L, 0, 4, "w1 w2 w3 w4"),
      (1L, 1, 4, "w4 w5 w6 w7"),   // stride 3 → one-token overlap
      (1L, 2, 4, "w7 w8 w9 w10"),
      (1L, 3, 1, "w10"),           // tail chunk kept, short
      (2L, 0, 3, "a b c"),
      (3L, 0, 1, "solo"))
    assert(got == want)
  }

  test("stratifiedSampleByHash rejects a non-integral id column") {
    import spark.implicits._
    val bad = Seq(("en", "not-a-number")).toDF("lang", "doc_id")
    val e = intercept[IllegalArgumentException] {
      CorpusOps.stratifiedSampleByHash(bad, "lang", "doc_id", 5)
    }
    assert(e.getMessage.contains("integral id"))
  }

  test("contaminationCounts: exact counts, broadcast probe plan") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // shares 2 grams with bench
      (2L, "totally clean document here"), // shares none — absent
      (3L, "quick brown fox quick brown fox")) // dup grams count ONCE
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a quick brown fox appears"))
      .toDF("doc_id", "text")
    val out = CorpusOps.contaminationCounts(corpus, bench, "text", "doc_id", 3)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (3L, 1L)))  // shared gram: "quick brown fox"
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "benchmark side must broadcast — the corpus must not shuffle")
    assert(!plan.contains("SortMergeJoin"))
  }
}
