package graft.queries

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation surface over `documents`: dedup family, text analysis,
  * token statistics. Every entry carries a DuckDB oracle since round 3 —
  * the signature ops (minhash/simhash/fingerprint) are replayed exactly
  * via HUGEINT mod-2^64 arithmetic (see the per-oracle comments). Those
  * byte-level oracles assume the driver corpus's verified shape: pure
  * ASCII, single-space separated, no leading/trailing whitespace (Java's
  * split(' ') drops trailing empties; DuckDB's string_split keeps them —
  * equal only on that shape).
  */
object TextQueries {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "q40_word_topk" -> ((s, d) =>
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(20)),

    "q41_token_counts" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.subwordCount(col("text")).as("subword_tokens"))
        .orderBy("doc_id")),

    "q42_quality_features" -> ((s, d) =>
      TextAnalysis.qualityFeatures(documents(s, d), "text")
        .select("doc_id", "n_words", "mean_word_len", "stopword_ratio",
          "alpha_ratio")
        .orderBy("doc_id")),

    "q43_exact_dedup" -> ((s, d) =>
      Dedup.exact(documents(s, d), "text", "doc_id")
        .groupBy("dup_count").agg(count(lit(1)).as("n_groups"))
        .orderBy("dup_count")),

    "q44_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(documents(s, d), "text", "doc_id",
          "source", k = 3, threshold = 0.03)
        .groupBy().agg(count(lit(1)).as("n_pairs"),
          Q.dsum(col("jaccard")).as("sum_jaccard"))),

    "q45_minhash_neardup" -> ((s, d) =>
      // oracled since round 3 (signatures + banding replayed in SQL);
      // estimate-vs-true-jaccard exactness asserted in OperatorsSpec
      Dedup.minhashNearDups(documents(s, d), "text", "doc_id",
          k = 2, numHashes = 64, bands = 32, threshold = 0.30)
        .orderBy("a", "b")),

    "q46_simhash" -> ((s, d) =>
      Dedup.simhash(documents(s, d), "text", "doc_id")
        .orderBy("doc_id")),

    "q47_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprint(documents(s, d), "text", "doc_id")
        .orderBy("doc_id")),

    "q48_langid" -> ((s, d) =>
      // heuristic language id over synthetic-keyword text: not meaningful
      // linguistically, but exercises the operator end to end; oracled
      // since round 3 by mirroring the vote/argmax semantics in SQL.
      // The per-word stopword vote is CPU-amplifying — spread one-split
      // inputs first (no-op at corpus scale)
      graft.operators.Partitioning.spreadSmallScan(s,
          documents(s, d).select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy("lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang_pred")),

    "q49_length_stats" -> ((s, d) =>
      documents(s, d).groupBy("lang", "source")
        .agg(count(lit(1)).as("n"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          Q.dsum(col("n_chars").cast("double")).as("sum_chars"))
        .orderBy("lang", "source"))
  )

  /** FNV-1a 64 of the ASCII string column `c`, as a DuckDB list_reduce
    * lambda: xor runs in signed BIGINT (bit-equal to unsigned xor), the
    * wrapping multiply in HUGEINT mod 2^64, wrapped back to signed —
    * shared by the q45 (shingle) and q46 (word) oracles so the
    * arithmetic can never desynchronize between them. */
  private def fnvSql(c: String): String =
    s"""list_reduce(
       |      list_prepend(-3750763034362895579,
       |        list_transform(range(1, strlen($c) + 1), i -> ascii($c[i]))),
       |      (h, c) -> CAST(
       |        CASE WHEN ((CASE WHEN xor(h, c) < 0
       |                    THEN xor(h, c)::HUGEINT
       |                         + 18446744073709551616::HUGEINT
       |                    ELSE xor(h, c)::HUGEINT END)
       |                   * 1099511628211::HUGEINT)
       |                  % 18446744073709551616::HUGEINT
       |                  >= 9223372036854775808::HUGEINT
       |          THEN ((CASE WHEN xor(h, c) < 0
       |                 THEN xor(h, c)::HUGEINT
       |                      + 18446744073709551616::HUGEINT
       |                 ELSE xor(h, c)::HUGEINT END)
       |                * 1099511628211::HUGEINT)
       |               % 18446744073709551616::HUGEINT
       |               - 18446744073709551616::HUGEINT
       |          ELSE ((CASE WHEN xor(h, c) < 0
       |                 THEN xor(h, c)::HUGEINT
       |                      + 18446744073709551616::HUGEINT
       |                 ELSE xor(h, c)::HUGEINT END)
       |                * 1099511628211::HUGEINT)
       |               % 18446744073709551616::HUGEINT
       |          END AS BIGINT))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q40_word_topk" ->
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 20""".stripMargin,

    "q41_token_counts" ->
      """SELECT doc_id,
        |CAST(len(string_split_regex(text, '\s+')) AS INT) AS ws_tokens,
        |CAST(len(regexp_extract_all(text,
        |  '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS subword_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q42_quality_features" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) AS nw,
        |  CAST(list_sum(list_transform(string_split_regex(text, '\s+'),
        |    x -> length(x))) AS DOUBLE) AS sw,
        |  CAST(length(text) AS DOUBLE) AS nc,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
        |    AS DOUBLE) AS ac,
        |  CAST(len(list_intersect(string_split_regex(text, '\s+'),
        |    ['a','an','and','auf','avec','con','dans','das','de','den',
        |     'der','die','ein','eine','el','es','est','et','for','from',
        |     'im','in','is','ist','la','las','le','les','los','mit',
        |     'nicht','of','on','para','pas','por','pour','que','se','sur',
        |     'that','the','this','to','un','una','und','une','von','with',
        |     'y','zu'])) AS DOUBLE) AS sc
        |  FROM documents)
        |SELECT doc_id, CAST(nw AS INT) AS n_words,
        |  sw / nw AS mean_word_len,
        |  sc / nw AS stopword_ratio, ac / nc AS alpha_ratio
        |FROM f ORDER BY doc_id""".stripMargin,

    "q43_exact_dedup" ->
      """SELECT dup_count, COUNT(*) AS n_groups FROM (
        |  SELECT text, MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
        |  FROM documents GROUP BY text)
        |GROUP BY dup_count ORDER BY dup_count""".stripMargin,

    "q44_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id, source, list_distinct([
         |    array_to_string(words[i:i+2], ' ')
         |    FOR i IN range(1, greatest(len(words) - 2, 1) + 1)]) AS shingles
         |  FROM (SELECT doc_id, source, string_split(text, ' ') AS words
         |        FROM documents)),
         |ex AS (SELECT doc_id, source, unnest(shingles) AS shingle FROM sh),
         |sz AS (SELECT doc_id, len(shingles) AS nsh FROM sh),
         |inter AS (
         |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS i
         |  FROM ex l JOIN ex r ON l.shingle = r.shingle
         |    AND l.source = r.source AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT a, b, CAST(i AS DOUBLE) /
         |    CAST(sa.nsh + sb.nsh - i AS DOUBLE) AS jaccard
         |  FROM inter JOIN sz sa ON inter.a = sa.doc_id
         |  JOIN sz sb ON inter.b = sb.doc_id)
         |SELECT COUNT(*) AS n_pairs,
         |  ${Q.dsumSql("jaccard")} AS sum_jaccard
         |FROM j WHERE jaccard >= 0.03""".stripMargin,

    "q49_length_stats" ->
      s"""SELECT lang, source, COUNT(*) AS n, MIN(n_chars) AS min_chars,
         |MAX(n_chars) AS max_chars,
         |${Q.dsumSql("CAST(n_chars AS DOUBLE)")} AS sum_chars
         |FROM documents GROUP BY lang, source
         |ORDER BY lang, source""".stripMargin,

    // minhash-LSH replayed exactly. The banded candidate join keys on the
    // signature SLICES themselves (Spark's hash(slice) is only an
    // equality proxy for slice equality, so no Murmur3 is needed in SQL);
    // FNV-1a shingle bases reuse q46's HUGEINT lambda; the 64 affine
    // (a, b) params are regenerated from the SAME seeded Rng stream as
    // Dedup.hashParams and embedded with a split into 32-bit halves so
    // the wrapping 64×64-bit multiply fits INT128:
    //   (a·x) mod 2^64 = (a_lo·x + ((a_hi·x) mod 2^32)·2^32) mod 2^64.
    // Mins compare SIGNED longs, exactly like the Scala loop.
    "q45_minhash_neardup" -> {
      val rng = new graft.core.Rng(0x5eed5eedL)
      val hp = (0 until 64).map { h =>
        val a = rng.nextLong() | 1L
        val b = rng.nextLong()
        s"($h, ${a >>> 32}::HUGEINT, ${a & 0xffffffffL}::HUGEINT, " +
          s"${java.lang.Long.toUnsignedString(b)}::HUGEINT)"
      }.mkString(", ")
      val fnv = fnvSql("sh")
      val mulmod =
        """((hp.al * bu + ((hp.ah * bu) % 4294967296::HUGEINT)
          |               * 4294967296::HUGEINT + hp.b)
          |              % 18446744073709551616::HUGEINT)""".stripMargin
      s"""WITH hp(h, ah, al, b) AS (VALUES $hp),
         |docs AS (
         |  SELECT doc_id, string_split(text, ' ') AS words,
         |    len(string_split(text, ' ')) AS nw
         |  FROM documents),
         |shingles AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(nw - 1, 1) + 1),
         |      i -> array_to_string(words[i:least(i + 1, nw)], ' '))) AS sh
         |  FROM docs),
         |bases AS (
         |  SELECT doc_id,
         |    CASE WHEN base < 0
         |      THEN base::HUGEINT + 18446744073709551616::HUGEINT
         |      ELSE base::HUGEINT END AS bu
         |  FROM (SELECT doc_id, $fnv AS base FROM shingles)),
         |minh AS (
         |  SELECT doc_id, hp.h,
         |    MIN(CAST(CASE WHEN $mulmod >= 9223372036854775808::HUGEINT
         |      THEN $mulmod - 18446744073709551616::HUGEINT
         |      ELSE $mulmod END AS BIGINT)) AS mh
         |  FROM bases, hp GROUP BY doc_id, hp.h),
         |sigs AS (
         |  SELECT doc_id, list(mh ORDER BY h) AS sig FROM minh
         |  GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, sig[2*b + 1 : 2*b + 2] AS band
         |  FROM sigs, range(0, 32) r(b)),
         |cands AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM banded l JOIN banded r ON l.b = r.b AND l.band = r.band
         |    AND l.doc_id < r.doc_id),
         |est AS (
         |  SELECT a, b,
         |    CAST(len(list_filter(list_zip(sa.sig, sb.sig),
         |      p -> p[1] = p[2])) AS DOUBLE) / 64.0 AS est_jaccard
         |  FROM cands JOIN sigs sa ON cands.a = sa.doc_id
         |  JOIN sigs sb ON cands.b = sb.doc_id)
         |SELECT a, b, est_jaccard FROM est WHERE est_jaccard >= 0.30
         |ORDER BY a, b""".stripMargin
    },

    // simhash replayed exactly: FNV-1a per word (xor in signed BIGINT is
    // bit-equal to unsigned xor; the wrapping multiply runs in HUGEINT
    // mod 2^64 and wraps back to signed), then ±1 votes per bit over all
    // word occurrences, then the 64-bit fingerprint reassembled with the
    // sign bit handled explicitly. ASCII-only corpus (charAt == ascii).
    "q46_simhash" ->
      s"""WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id,
        |    ${fnvSql("w")} AS h
        |  FROM words),
        |votes AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM hashed, range(0, 64) r(b)
        |  GROUP BY doc_id, b),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN v > 0 AND b < 63
        |        THEN (1::HUGEINT << b) ELSE 0 END)
        |      - CASE WHEN MAX(CASE WHEN b = 63 AND v > 0
        |            THEN 1 ELSE 0 END) = 1
        |        THEN 9223372036854775808::HUGEINT ELSE 0 END AS BIGINT)
        |      AS simhash
        |  FROM votes GROUP BY doc_id)
        |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin,

    // the 64-bit rolling hash (h = 31*h + char, wrapping) replayed in
    // HUGEINT modular arithmetic, then wrapped back to signed BIGINT.
    // Exact for the driver corpus because its text is pure ASCII, where
    // Spark's UTF-16 charAt equals DuckDB's ascii(); h*31+c stays far
    // below the HUGEINT range before each mod.
    "q47_fingerprint" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |       THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT)
        |    AS fingerprint
        |FROM (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(1125899906842597::HUGEINT,
        |        list_transform(range(1, strlen(text) + 1),
        |          i -> ascii(text[i])::HUGEINT)),
        |      (h, c) -> (h * 31 + c) % 18446744073709551616::HUGEINT) AS h
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // langId's exact semantics in SQL: each DISTINCT lowered word votes
    // for every language whose stopword list contains it; winner = max
    // (score, lang) lexicographically (Spark's greatest over structs ==
    // ORDER BY score DESC, lang DESC LIMIT 1); CJK presence short-circuits
    // to zh, no votes → und. The (word, lang) VALUES list is generated
    // from the SAME TextAnalysis.Stopwords the operator folds into its
    // literal map, so the two can never drift.
    "q48_langid" -> {
      val vals = TextAnalysis.Stopwords.toSeq.sortBy(_._1)
        .flatMap { case (lang, ws) => ws.sorted.map(w => s"('$w','$lang')") }
        .mkString(", ")
      s"""WITH sw(w, lang) AS (VALUES $vals),
         |words AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    string_split_regex(lower(text), '\\s+'))) AS w
         |  FROM documents),
         |votes AS (
         |  SELECT wo.doc_id, sw.lang, COUNT(*) AS score
         |  FROM words wo JOIN sw ON wo.w = sw.w GROUP BY 1, 2),
         |best AS (
         |  SELECT doc_id, lang FROM (
         |    SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, lang DESC) AS rn FROM votes)
         |  WHERE rn = 1),
         |pred AS (
         |  SELECT d.doc_id,
         |    CASE WHEN regexp_matches(d.text, '[\\x{4e00}-\\x{9fff}]')
         |           THEN 'zh'
         |         WHEN b.lang IS NOT NULL THEN b.lang
         |         ELSE 'und' END AS lang_pred
         |  FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id)
         |SELECT lang_pred, COUNT(*) AS n FROM pred
         |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin
    }
  )
}
