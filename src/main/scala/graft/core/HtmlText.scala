package graft.core

import java.nio.charset.StandardCharsets

/** Deterministic HTML → text extraction.
  *
  * Pure `Array[Byte] => String` (UTF-8 in, unicode out) so the byte-identical
  * per-url invariant (BASELINE.json input_hint) is testable without Spark and
  * holds trivially when the same function runs inside a typed Dataset map.
  *
  * Normalization contract (the ONE place where text bytes are decided —
  * SURVEY.md §7 "Byte-identical text"):
  *   1. drop `<!-- -->` comments, `<script>`/`<style>` elements incl. content
  *   2. block-level tags (p, div, h1..h6, li, ul, ol, br, tr, table, title,
  *      head, body, html, blockquote, pre, section, article) become '\n';
  *      all other tags become the empty string
  *   3. decode entities: named (amp lt gt quot apos nbsp) + numeric
  *      (&#dd; and &#xhh;)
  *   4. normalize \r\n and \r to \n; collapse runs of spaces/tabs to one
  *      space; trim each line; drop empty lines; join with '\n'
  *
  * Implementation note: extraction and whitespace normalization are FUSED
  * into one pass with a small state machine (pendingNewline/pendingSpace) —
  * the document hot path is allocation-bandwidth-bound at high core counts
  * (BASELINE.md), and the fused form writes the output exactly once instead
  * of copying the text ~4×. `normalizeWhitespace` keeps the original
  * multi-pass reference semantics and the property tests assert both agree.
  */
object HtmlText {

  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol", "br",
    "tr", "table", "title", "head", "body", "html", "blockquote", "pre",
    "section", "article")

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  def extract(html: Array[Byte]): String =
    extractFromString(new String(html, StandardCharsets.UTF_8))

  def extractBytes(html: Array[Byte]): Array[Byte] =
    extract(html).getBytes(StandardCharsets.UTF_8)

  /** Fused extraction + SENTENCE splitting: the triples narrow stage only
    * needs sentences, so skipping the full normalized-text String (one
    * whole-document StringBuilder + toString per page) is a measurable
    * allocation-bandwidth win at high core counts (BASELINE.md). Produces
    * exactly `Tokenizer.sentences(extract(html))` — property-tested in
    * CoreSpec over fixture pages and adversarial HTML. */
  def extractSentences(html: Array[Byte]): Vector[String] =
    extractSentencesFromString(new String(html, StandardCharsets.UTF_8))

  def extractSentencesFromString(html: String): Vector[String] = {
    val sink = new SentenceSink
    scanHtml(html, sink)
    sink.result()
  }

  /** Fused extraction + whitespace-normalization state machine. */
  def extractFromString(html: String): String = {
    val sink = new TextSink(math.min(html.length, 1 << 16))
    scanHtml(html, sink)
    sink.result()
  }

  private sealed trait CharSink { def emit(c: Char): Unit }

  /** Normalizing sink: '\n' between content blocks, single spaces, no
    * leading/trailing whitespace per line (the byte-identical contract). */
  private final class TextSink(capacity: Int) extends CharSink {
    private val sb = new StringBuilder(capacity)
    private var pendingNewline = false
    private var pendingSpace = false

    def emit(c: Char): Unit = {
      if (c == '\n' || c == '\r') {
        pendingNewline = true
        pendingSpace = false
      } else if (c == ' ' || c == '\t') {
        if (!pendingNewline && sb.nonEmpty &&
          sb.charAt(sb.length - 1) != '\n') pendingSpace = true
      } else {
        if (pendingNewline) {
          if (sb.nonEmpty) sb.append('\n')
          pendingNewline = false
          pendingSpace = false
        } else if (pendingSpace) {
          sb.append(' ')
          pendingSpace = false
        }
        sb.append(c)
      }
    }

    def result(): String = sb.toString
  }

  /** Sentence sink: emits trimmed sentences directly — equivalent to
    * running Tokenizer.sentences over TextSink's output ('\n' is always a
    * boundary; '.', '!', '?' close a sentence inclusively; space runs
    * collapse; edges trimmed of chars <= U+0020). */
  private final class SentenceSink extends CharSink {
    private val out = Vector.newBuilder[String]
    private val sb = new java.lang.StringBuilder(256)
    private var pendingSpace = false

    private def flush(): Unit = {
      var a = 0
      var b = sb.length
      while (a < b && sb.charAt(a) <= ' ') a += 1
      while (b > a && sb.charAt(b - 1) <= ' ') b -= 1
      if (b > a) out += sb.substring(a, b)
      sb.setLength(0)
      pendingSpace = false
    }

    def emit(c: Char): Unit = {
      if (c == '\n' || c == '\r') flush()
      else if (c == ' ' || c == '\t') {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        if (c == '.' || c == '!' || c == '?') flush()
      }
    }

    def result(): Vector[String] = { flush(); out.result() }
  }

  /** The tag/comment/script/entity scanner, shared by both sinks so the
    * text and sentence paths can never drift structurally. */
  private def scanHtml(html: String, sink: CharSink): Unit = {
    @inline def emit(c: Char): Unit = sink.emit(c)
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = html.indexOf('>', i)
          if (close < 0) { i = n } // truncated tag: drop remainder
          else {
            val inner = html.substring(i + 1, close)
            val name = tagName(inner)
            if ((name == "script" || name == "style") && !inner.startsWith("/")
                && !inner.endsWith("/")) {
              val endTag = "</" + name
              val end = indexOfIgnoreCase(html, endTag, close + 1)
              if (end < 0) { i = n }
              else {
                val endClose = html.indexOf('>', end)
                i = if (endClose < 0) n else endClose + 1
              }
            } else {
              if (BlockTags.contains(name)) emit('\n')
              i = close + 1
            }
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = html.substring(i + 1, semi)
          decodeEntity(body) match {
            case Some(s) => { var j = 0; while (j < s.length) { emit(s.charAt(j)); j += 1 }; i = semi + 1 }
            case None    => emit(c); i += 1
          }
        } else { emit(c); i += 1 }
      } else { emit(c); i += 1 }
    }
  }

  private def tagName(inner: String): String = {
    val t = inner.trim
    val s = if (t.startsWith("/")) t.substring(1) else t
    var j = 0
    while (j < s.length && (s.charAt(j).isLetterOrDigit)) j += 1
    s.substring(0, j).toLowerCase
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val nl = needle.length
    var i = math.max(from, 0)
    val last = hay.length - nl
    while (i <= last) {
      if (hay.regionMatches(true, i, needle, 0, nl)) return i
      i += 1
    }
    -1
  }

  /** Numeric references decode via Character.toChars so supplementary-plane
    * code points (e.g. &#128512; / &#x1F600;) become a proper surrogate
    * pair instead of one truncated UTF-16 unit. Invalid code points (0,
    * lone surrogates, > U+10FFFF) fall back to None → the raw entity text
    * is emitted unchanged. */
  private def fromCodePoint(cp: Int): Option[String] =
    if (cp > 0 && cp <= Character.MAX_CODE_POINT &&
        !(cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE))
      Some(new String(Character.toChars(cp)))
    else None

  private def decodeEntity(body: String): Option[String] = {
    if (body.startsWith("#x") || body.startsWith("#X")) {
      try fromCodePoint(Integer.parseInt(body.substring(2), 16))
      catch { case _: Exception => None }
    } else if (body.startsWith("#")) {
      try fromCodePoint(Integer.parseInt(body.substring(1)))
      catch { case _: Exception => None }
    } else NamedEntities.get(body)
  }

  /** Reference (multi-pass) normalization semantics: \r\n|\r → \n;
    * [ \t]+ → single space; trim lines; drop empties. The fused state
    * machine above is property-tested equivalent. */
  def normalizeWhitespace(s: String): String = {
    val unified = s.replace("\r\n", "\n").replace('\r', '\n')
    val lines = unified.split('\n')
    val out = new StringBuilder(s.length)
    var first = true
    var li = 0
    while (li < lines.length) {
      val line = collapseSpaces(lines(li))
      if (line.nonEmpty) {
        if (!first) out.append('\n')
        out.append(line)
        first = false
      }
      li += 1
    }
    out.toString
  }

  private def collapseSpaces(line: String): String = {
    val sb = new StringBuilder(line.length)
    var pendingSpace = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == ' ' || c == '\t') pendingSpace = true
      else {
        if (pendingSpace && sb.nonEmpty) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
