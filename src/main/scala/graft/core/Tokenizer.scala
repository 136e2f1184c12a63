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

  /** Split extracted text into sentences (non-empty, trimmed). */
  def sentences(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\n') { flush(cur, out) }
      else {
        cur.append(c)
        if (c == '.' || c == '!' || c == '?') flush(cur, out)
      }
      i += 1
    }
    flush(cur, out)
    out.result()
  }

  private def flush(cur: StringBuilder, out: collection.mutable.Builder[String, Vector[String]]): Unit = {
    val s = cur.toString.trim
    if (s.nonEmpty) out += s
    cur.clear()
  }

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
        out += Token(c.toString, i, i + 1)
        i += 1
      }
    }
    out.result()
  }
}
