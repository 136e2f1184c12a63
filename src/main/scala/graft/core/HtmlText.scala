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

  /** Fused extraction + normalization state machine. */
  def extractFromString(html: String): String = {
    val sb = new StringBuilder(math.min(html.length, 1 << 16))
    var pendingNewline = false
    var pendingSpace = false

    @inline def emit(c: Char): Unit = {
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
    sb.toString
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
