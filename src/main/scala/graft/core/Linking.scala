package graft.core

/** Entity-disambiguation scoring, shared verbatim by the Spark stage
  * (context_score UDF, SURVEY.md §3.2 stage 6) and the golden fixtures.
  *
  * score(candidate) = alias prior + |profile(candidate) ∩ context|
  * where context = the tokens within `Window` positions of the mention
  * (mention tokens excluded). Top-1 per mention by (score desc,
  * entity_id asc) — the tiebreak is part of the determinism contract.
  */
object Linking {

  val Window = 3

  def contextTokens(tokens: IndexedSeq[String], beginTok: Int,
      endTok: Int): Set[String] = {
    val lo = math.max(0, beginTok - Window)
    val hi = math.min(tokens.length, endTok + Window)
    (tokens.slice(lo, beginTok) ++ tokens.slice(endTok, hi)).toSet
  }

  def score(prior: Double, profile: Set[String], context: Set[String]): Double =
    prior + profile.count(context.contains).toDouble

  /** Allocation-free equivalent of contextTokens+score: counts distinct
    * profile words present in the ±Window context, scanning the token
    * array directly. profile must be duplicate-free (it is — FixtureGen
    * profiles are 3 distinct words). */
  def overlapScore(prior: Double, profile: IndexedSeq[String],
      tokens: IndexedSeq[String], beginTok: Int, endTok: Int): Double = {
    val lo = math.max(0, beginTok - Window)
    val hi = math.min(tokens.length, endTok + Window)
    var hits = 0
    var p = 0
    while (p < profile.length) {
      val w = profile(p)
      var found = false
      var i = lo
      while (!found && i < beginTok) { found = tokens(i) == w; i += 1 }
      i = endTok
      while (!found && i < hi) { found = tokens(i) == w; i += 1 }
      if (found) hits += 1
      p += 1
    }
    prior + hits.toDouble
  }
}
