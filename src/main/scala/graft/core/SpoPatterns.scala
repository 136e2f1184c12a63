package graft.core

/** A candidate (subject, predicate, object) extraction: subject/object are
  * mention indices into the sentence's span list; pred is the verb lemma. */
final case class SpoCandidate(subjIdx: Int, pred: String, objIdx: Int)

/** OpenIE-style dependency-*pattern* triple extraction (north_star wording).
  * Without a learned parser, the pattern grammar is: for each ordered pair
  * of adjacent mentions (mᵢ, mᵢ₊₁) in a sentence, if exactly the tokens
  * between them contain a verb from the closed predicate lexicon, emit
  * (mᵢ, verb-lemma, mᵢ₊₁). Deterministic, pure, shared by the fixture
  * generator (oracle) and the Spark flatMap stage.
  */
object SpoPatterns {

  /** Closed predicate lexicon: surface form → lemma. */
  val Predicates: Map[String, String] = Map(
    "founded" -> "founded", "founds" -> "founded",
    "acquired" -> "acquired", "acquires" -> "acquired",
    "visited" -> "visited", "visits" -> "visited",
    "met" -> "met", "meets" -> "met",
    "leads" -> "leads", "led" -> "leads",
    "owns" -> "owns", "owned" -> "owns",
    "joined" -> "joined", "joins" -> "joined",
    "left" -> "left", "leaves" -> "left")

  def extract(tokens: IndexedSeq[Token], spans: IndexedSeq[Span]): Vector[SpoCandidate] = {
    val out = Vector.newBuilder[SpoCandidate]
    var i = 0
    while (i + 1 < spans.length) {
      val a = spans(i)
      val b = spans(i + 1)
      // verbs strictly between the two mentions, in token order
      var v: String = null
      var t = a.endTok
      while (t < b.beginTok) {
        Predicates.get(tokens(t).text.toLowerCase) match {
          case Some(lemma) if v == null => v = lemma
          case _ =>
        }
        t += 1
      }
      if (v != null) out += SpoCandidate(i, v, i + 1)
      i += 1
    }
    out.result()
  }
}
