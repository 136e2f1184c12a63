package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: language id, quality
  * scoring, token counting, document fingerprinting. Everything on the hot
  * path is built-in expressions (codegen'd); the fingerprint uses a typed
  * map because it is a rolling byte hash.
  */
object TextAnalysis {

  /** Tiny closed stopword lists (public knowledge) per language. The
    * heuristic: score(lang) = |words ∩ stopwords(lang)|; CJK-character
    * ratio short-circuits zh. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "with",
      "for", "on", "that", "this", "from"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "von", "ein",
      "eine", "zu", "auf", "nicht", "den", "im"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "con", "de", "un",
      "una", "que", "por", "para", "se"),
    "fr" -> Seq("le", "la", "les", "et", "est", "avec", "de", "un", "une",
      "que", "pour", "dans", "sur", "pas"))

  /** words(text) — whitespace tokenization as a column. */
  def words(text: Column): Column = split(text, "\\s+")

  /** Language-ID heuristic, pure built-ins: argmax over stopword-overlap
    * scores, zh if CJK chars present, 'und' if no signal.
    *
    * Cost shape (round-2 rewrite): the CJK probe is `rlike` (first-match,
    * no rewrite of the whole string — the round-1 `regexp_replace` copied
    * every document just to test emptiness), and the per-language scores
    * come from ONE pass that maps each distinct word to its language via a
    * constant-folded literal map, instead of four `array_intersect` scans
    * of the full word array. Score semantics are identical: each distinct
    * word votes for at most one language, so counting votes per language
    * equals |distinct words ∩ stopwords(lang)|. */
  def langId(text: Column): Column = {
    val w = array_distinct(words(lower(text)))
    // word → array of languages claiming it (stopwords are shared across
    // languages — "de"/"la"/"un"/"que" are both es and fr — so each word
    // votes for every language that lists it, exactly like array_intersect)
    val byWord: Seq[(String, Seq[String])] = Stopwords.toSeq
      .flatMap { case (lang, sws) => sws.map(_ -> lang) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (word, ls) => word -> ls.map(_._2).sorted }
    val wordToLangs = map(byWord.flatMap { case (word, ls) =>
      Seq(lit(word), array(ls.map(lit): _*))
    }: _*)
    // try_element_at: missing-key lookups return null under BOTH default
    // and ANSI semantics (plain element_at errors on missing map keys when
    // spark.sql.ansi.enabled is on — a portability trap, since almost every
    // non-stopword word misses this map)
    val votes = flatten(filter(
      transform(w, x => try_element_at(wordToLangs, x)), a => a.isNotNull))
    val scores = Stopwords.keys.toSeq.sorted.map { lang =>
      struct(size(filter(votes, v => v === lang)).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Quality features + a composite score, all built-ins:
    * word count, mean word length, stopword ratio, alpha ratio. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val nWords = size(w).cast("double")
    val nChars = length(col(textCol)).cast("double")
    val alphaChars = length(regexp_replace(col(textCol), "[^a-zA-Z]", ""))
      .cast("double")
    val allStops = array(Stopwords.values.flatten.toSeq.distinct
      .sorted.map(lit): _*)
    val stopCount = size(array_intersect(w, allStops)).cast("double")
    // sum the TOKEN lengths directly — the closed form
    // (nChars - (nWords-1)) / nWords assumes exactly one single-space
    // separator per boundary and counts tabs/extra spaces as word length
    // on anything else
    val sumWordLen = aggregate(w, lit(0), (acc, x) => acc + length(x))
      .cast("double")
    df.withColumn("n_words", size(w))
      .withColumn("mean_word_len", sumWordLen / nWords)
      .withColumn("stopword_ratio", stopCount / nWords)
      .withColumn("alpha_ratio", alphaChars / nChars)
  }

  /** Whitespace token count (codegen'd). */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword-unit count: alpha runs, digit runs, and single
    * non-space symbols — the pre-tokenization regex families BPE vocabs
    * use. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Repetition-based quality signals (the Gopher-rules family): documents
    * dominated by one repeated phrase are boilerplate/spam.
    *   - distinct_word_ratio: |distinct words| / |words| (low = repetitive)
    *   - top_bigram_frac: occurrences of the most frequent word bigram /
    *     total bigrams (high = one phrase dominates)
    * Per-row double division of exact ints only — no aggregation-order
    * float caveats, so the DuckDB oracle compares exactly.
    *
    * Shape (round 8): fully per-row, ZERO shuffle. Both signals are
    * per-document functions of the document's own token stream, and the
    * document's tokens all live in its own row — the previous shape
    * (explode → (doc, gram) count → per-doc max → join back to the
    * per-row base) shuffled the whole corpus twice and joined, purely
    * to group tokens that were never apart. A single compiled
    * mapPartitions pass computes both counts in O(L) per document with
    * one open-addressing-backed HashMap bounded by doc length. This is
    * the documented typed-closure exception (the fingerprint /
    * Space-Saving precedent): the built-in that "fits" costs two
    * corpus-scale exchanges, the interpreted-HOF alternative
    * (array_sort + aggregate() run-length, tried first) evaluates its
    * lambda per element with per-step struct allocation and measured
    * 5.2 s vs the old plan's 3.2 s at sf0.1, and the pretty quadratic
    * (`array_max(transform(array_distinct(grams), d -> size(filter)))`)
    * measured 203 s. Tokenization matches the old expressions exactly:
    * `text.split(" ", -1)` is Spark's split(col, " ") (regex, limit -1,
    * trailing empties kept), and the i+1<|w| guard reproduces
    * rawShingles' short-doc boundary (a <2-token doc yields one "gram"
    * = its only token, so every doc emits a row, as the old inner join
    * did). The independent DuckDB oracle replays both ratios from
    * string_split — the gate pins the equivalence at both scales. */
  def repetitionSignals(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the per-doc token/bigram loop is CPU-amplifying — spread
    // one-split inputs across the session width first (no-op at corpus
    // scale; the pass is per-row, so results are partition-independent)
    Partitioning.spreadSmallScan(spark,
        df.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val words = text.split(" ", -1)
          val distinct = new java.util.HashSet[String]()
          var i = 0
          while (i < words.length) { distinct.add(words(i)); i += 1 }
          val dwr = distinct.size.toDouble / words.length.toDouble
          val nGrams = math.max(words.length - 2, 0) + 1
          val counts = new java.util.HashMap[String, Int]()
          var best = 0
          i = 0
          while (i < nGrams) {
            val gram =
              if (i + 1 < words.length) words(i) + " " + words(i + 1)
              else words(i)
            val c = counts.merge(gram, 1, Integer.sum(_, _))
            if (c > best) best = c
            i += 1
          }
          (id, dwr, best.toDouble / nGrams.toDouble)
        }
      }.toDF(idCol, "distinct_word_ratio", "top_bigram_frac")
  }

  /** Email regex shared by the Spark op and the DuckDB oracle (kept to the
    * RE2/Java-compatible subset both engines parse identically). */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Phone-ish regex (NNN-NNNN with optional NNN- prefix). */
  val PhoneRe = "\\b[0-9]{3}-(?:[0-9]{3}-)?[0-9]{4}\\b"

  /** PII scrub: replace emails/phones with typed placeholder tokens and
    * count what was redacted — the standard pre-training privacy pass.
    * Emails are redacted first, and n_phones is counted on the
    * EMAIL-REDACTED text, so the counts equal the placeholder tokens
    * actually emitted: a phone-shaped substring inside an email
    * local-part ("555-123-4567@mail.com") is one email, zero phones —
    * not a phantom phone count with no [PHONE] token. Narrow
    * projection, zero shuffle. */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailRe, "[EMAIL]")
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(afterEmail, lit(PhoneRe), lit(0))))
      .withColumn("redacted",
        regexp_replace(afterEmail, PhoneRe, "[PHONE]"))
  }

  /** 64-bit rolling (polynomial) hash fingerprint of the whole document —
    * order-sensitive, unlike a bag-of-words hash. Typed map (no UDF
    * registry), deterministic. */
  def fingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          var h = 1125899906842597L
          var i = 0
          while (i < text.length) { h = 31L * h + text.charAt(i); i += 1 }
          (id, h)
        }
      }.toDF(idCol, "fingerprint")
  }
}
