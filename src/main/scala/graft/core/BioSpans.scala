package graft.core

/** An entity mention: token span [beginTok, endTok) in a tokenized sentence,
  * with resolved character offsets and surface form. */
final case class Span(beginTok: Int, endTok: Int, cls: String, surface: String,
    beginChar: Int, endChar: Int)

/** BIO tag-sequence ↔ entity-span conversions (CoNLL convention: a span is
  * a maximal B-x (I-x)* run; entity-level P/R compares exact spans). */
object BioSpans {

  /** Decode BIO tags + tokens into spans. Tolerates ill-formed input
    * (I-x with no preceding B-x opens a span) per CoNLL eval convention. */
  def toSpans(tokens: IndexedSeq[Token], tags: IndexedSeq[String]): Vector[Span] = {
    require(tokens.length == tags.length)
    val out = Vector.newBuilder[Span]
    var i = 0
    val n = tags.length
    while (i < n) {
      val t = tags(i)
      if (t != "O") {
        val cls = t.substring(2)
        val start = i
        i += 1
        while (i < n && tags(i) == s"I-$cls") i += 1
        val beginChar = tokens(start).begin
        val endChar = tokens(i - 1).end
        val surface = tokens.slice(start, i).map(_.text).mkString(" ")
        out += Span(start, i, cls, surface, beginChar, endChar)
      } else i += 1
    }
    out.result()
  }

  /** Encode spans back to BIO tags (inverse of toSpans for well-formed
    * non-overlapping spans — property-tested round trip). */
  def toTags(nTokens: Int, spans: Seq[Span]): Vector[String] = {
    val tags = Array.fill(nTokens)("O")
    spans.foreach { s =>
      var i = s.beginTok
      tags(i) = s"B-${s.cls}"
      i += 1
      while (i < s.endTok) { tags(i) = s"I-${s.cls}"; i += 1 }
    }
    tags.toVector
  }
}
