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
    * scores, zh if CJK chars present, 'und' if no signal. */
  def langId(text: Column): Column = {
    val w = words(lower(text))
    val scores = Stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(size(array_intersect(w, array(sw.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) > 0, lit("zh"))
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
    df.withColumn("n_words", size(w))
      .withColumn("mean_word_len",
        (nChars - (nWords - lit(1.0))) / nWords)
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
