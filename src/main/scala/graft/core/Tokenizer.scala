package graft.core

/** A token with its character offsets into the sentence it came from. */
final case class Token(text: String, begin: Int, end: Int)

/** Deterministic sentence splitting + tokenization with character offsets.
  *
  * Contract (property-tested): token offsets are strictly increasing,
  * non-overlapping, and `sentence.substring(begin, end) == text` for every
  * token. Sentence boundaries: '.', '!', '?' end a sentence; '\n' always
  * ends a sentence (lines of extracted text never span sentences).
  */
object Tokenizer {

  /** Split extracted text into sentences (non-empty, trimmed).
    *
    * Index-based: each sentence is ONE substring of the input instead of a
    * StringBuilder copy + toString + trim (three copies of the whole text
    * per document). The document path is allocation-bandwidth-bound at
    * high core counts (BASELINE.md), so every removed copy is wall time.
    * Semantics identical to the original builder form ('\n' is always a
    * boundary and never part of a sentence; '.', '!', '?' end a sentence
    * inclusively; edges trimmed of chars <= U+0020, String.trim's rule).
    */
  def sentences(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val n = text.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\n') { emitTrimmed(text, start, i, out); start = i + 1 }
      else if (c == '.' || c == '!' || c == '?') {
        emitTrimmed(text, start, i + 1, out); start = i + 1
      }
      i += 1
    }
    emitTrimmed(text, start, n, out)
    out.result()
  }

  private def emitTrimmed(text: String, from: Int, until: Int,
      out: collection.mutable.Builder[String, Vector[String]]): Unit = {
    var a = from
    var b = until
    while (a < b && text.charAt(a) <= ' ') a += 1
    while (b > a && text.charAt(b - 1) <= ' ') b -= 1
    if (b > a) out += text.substring(a, b)
  }

  /** Interned single-char strings for ASCII punctuation tokens — commas
    * and periods are among the most frequent tokens, and a fresh String
    * per occurrence is pure allocation-bandwidth waste. */
  private val SingleChar: Array[String] =
    Array.tabulate(128)(i => String.valueOf(i.toChar))

  /** Tokenize one sentence: maximal runs of letters/digits; every
    * punctuation character is its own token; whitespace separates. */
  def tokenize(sentence: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = sentence.length
    while (i < n) {
      val c = sentence.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetterOrDigit) {
        val start = i
        while (i < n && sentence.charAt(i).isLetterOrDigit) i += 1
        out += Token(sentence.substring(start, i), start, i)
      } else {
        val s = if (c < 128) SingleChar(c) else String.valueOf(c)
        out += Token(s, i, i + 1)
        i += 1
      }
    }
    out.result()
  }
}
