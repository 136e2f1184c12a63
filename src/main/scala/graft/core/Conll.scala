package graft.core

/** CoNLL-style tagged-corpus codec (the reference repo's interchange
  * format: token/tag rows, blank line between sentences, -DOCSTART-
  * separators between documents). Pure; used for the golden_tags fixture
  * and the export operator. */
object Conll {

  /** One document: url header + per-sentence token/tag blocks. */
  def format(url: String,
      sentences: Seq[(Seq[String], Seq[String])]): String = {
    val sb = new StringBuilder
    sb.append("-DOCSTART- (").append(url).append(")\n\n")
    sentences.foreach { case (tokens, tags) =>
      require(tokens.length == tags.length)
      tokens.indices.foreach { i =>
        sb.append(tokens(i)).append('\t').append(tags(i)).append('\n')
      }
      sb.append('\n')
    }
    sb.toString
  }

  /** Inverse of format: url → sentences of (tokens, tags). */
  def parse(text: String): Vector[(String, Vector[(Vector[String], Vector[String])])] = {
    val docs = Vector.newBuilder[(String, Vector[(Vector[String], Vector[String])])]
    var url: String = null
    var sents = Vector.newBuilder[(Vector[String], Vector[String])]
    var toks = Vector.newBuilder[String]
    var tags = Vector.newBuilder[String]
    def flushSent(): Unit = {
      val t = toks.result(); val g = tags.result()
      if (t.nonEmpty) sents += ((t, g))
      toks = Vector.newBuilder; tags = Vector.newBuilder
    }
    def flushDoc(): Unit = {
      flushSent()
      if (url != null) docs += ((url, sents.result()))
      sents = Vector.newBuilder
    }
    text.split('\n').zipWithIndex.foreach { case (line, ln) =>
      if (line.startsWith("-DOCSTART-")) {
        flushDoc()
        // tolerate the bare CoNLL-2003 header form (no "(url)") — those
        // docs carry a null url and are dropped by flushDoc, matching
        // the "docs are keyed by url" contract instead of crashing
        val open = line.indexOf('(')
        val close = line.lastIndexOf(')')
        url = if (open >= 0 && close > open)
          line.substring(open + 1, close) else null
      } else if (line.isEmpty) flushSent()
      else {
        val tab = line.indexOf('\t')
        // fail with a POSITIONED message, not StringIndexOutOfBounds —
        // a whitespace-only or space-separated row is a malformed file,
        // and the parser must say which line
        require(tab >= 0,
          s"CoNLL line ${ln + 1} has no tab separator: '$line'")
        toks += line.substring(0, tab)
        tags += line.substring(tab + 1)
      }
    }
    flushDoc()
    docs.result()
  }
}
