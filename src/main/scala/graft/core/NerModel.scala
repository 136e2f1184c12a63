package graft.core

/** BiLSTM-CRF-*style* sequence tagging, re-expressed as a deterministic
  * linear-chain model: per-token emission scores from lexical/shape features
  * (the stand-in for the learned BiLSTM encoder) + a BIO transition matrix
  * with hard constraints + exact Viterbi decoding (the CRF part). The
  * reference repo (opringle/named_entity_recognition — mount empty at survey
  * time, SURVEY.md §0) trains these scores; the determinism requirement in
  * BASELINE.json forbids stochastic training in-pipeline, so scores derive
  * from a gazetteer artifact built from the `aliases` table.
  *
  * Pure and Serializable: broadcast once per job, applied inside
  * `mapPartitions` (SURVEY.md §2.a R6).
  */
object NerModel {

  val Classes: Vector[String] = Vector("PER", "ORG", "LOC", "TIM")

  /** Tag index layout: 0 = O, then (B-cls, I-cls) pairs in Classes order. */
  val Tags: Vector[String] =
    "O" +: Classes.flatMap(c => Vector(s"B-$c", s"I-$c"))

  val TagIndex: Map[String, Int] = Tags.zipWithIndex.toMap
  private val O = 0
  @inline private def bOf(c: Int) = 1 + 2 * c
  @inline private def iOf(c: Int) = 2 + 2 * c

  private val NegInf = -1e9

  /** Lexical emission features: which classes a token can begin / continue,
    * learned here by tabulating the alias table (first token → begin,
    * later tokens → inside). */
  final case class Gazetteer(
      begin: Map[String, Set[Int]],
      inside: Map[String, Set[Int]]) extends Serializable

  object Gazetteer {
    /** Build from (alias surface, class name) pairs. Deterministic. */
    def fromAliases(aliases: Iterable[(String, String)]): Gazetteer = {
      val b = collection.mutable.Map.empty[String, Set[Int]]
      val in = collection.mutable.Map.empty[String, Set[Int]]
      aliases.foreach { case (alias, clsName) =>
        val c = Classes.indexOf(clsName)
        if (c >= 0) {
          val toks = Tokenizer.tokenize(alias).map(_.text)
          if (toks.nonEmpty) {
            b.updateWith(toks.head)(s => Some(s.getOrElse(Set.empty) + c))
            toks.tail.foreach { t =>
              in.updateWith(t)(s => Some(s.getOrElse(Set.empty) + c))
            }
          }
        }
      }
      Gazetteer(b.toMap, in.toMap)
    }
  }

  /** Emission scores for one token over all tags. */
  private def emissions(tok: String, gaz: Gazetteer): Array[Double] = {
    val e = Array.fill(Tags.length)(0.0)
    e(O) = 1.0
    val capitalized = tok.nonEmpty && tok.charAt(0).isUpper
    val beginCls = gaz.begin.getOrElse(tok, Set.empty)
    val insideCls = gaz.inside.getOrElse(tok, Set.empty)
    var c = 0
    while (c < Classes.length) {
      if (beginCls.contains(c)) e(bOf(c)) += 4.0
      if (insideCls.contains(c)) e(iOf(c)) += 4.0
      if (capitalized) { e(bOf(c)) += 0.25; e(iOf(c)) += 0.25 }
      c += 1
    }
    if (!capitalized && beginCls.isEmpty && insideCls.isEmpty) e(O) += 2.0
    e
  }

  /** BIO-constrained transition score prev→next; hard −inf for invalid
    * I-x after anything but B-x/I-x. */
  private val transition: Array[Array[Double]] = {
    val t = Array.fill(Tags.length, Tags.length)(0.0)
    var c = 0
    while (c < Classes.length) {
      val i = iOf(c)
      var p = 0
      while (p < Tags.length) {
        if (p != bOf(c) && p != i) t(p)(i) = NegInf
        p += 1
      }
      c += 1
    }
    // slight cost to open an entity: keeps stray capitalized tokens O
    var p = 0
    while (p < Tags.length) {
      var cc = 0
      while (cc < Classes.length) {
        if (t(p)(bOf(cc)) > NegInf / 2) t(p)(bOf(cc)) -= 0.5
        cc += 1
      }
      p += 1
    }
    t
  }

  /** Start scores: I-* cannot start a sentence. */
  private val start: Array[Double] = {
    val s = Array.fill(Tags.length)(0.0)
    var c = 0
    while (c < Classes.length) { s(iOf(c)) = NegInf; c += 1 }
    s
  }

  /** Exact Viterbi decode → one BIO tag per token. */
  def tag(tokens: IndexedSeq[String], gaz: Gazetteer): Vector[String] = {
    val n = tokens.length
    if (n == 0) return Vector.empty
    val k = Tags.length
    val delta = Array.ofDim[Double](n, k)
    val back = Array.ofDim[Int](n, k)
    val e0 = emissions(tokens(0), gaz)
    var j = 0
    while (j < k) { delta(0)(j) = start(j) + e0(j); j += 1 }
    var i = 1
    while (i < n) {
      val e = emissions(tokens(i), gaz)
      j = 0
      while (j < k) {
        var best = NegInf * 2
        var arg = 0
        var p = 0
        while (p < k) {
          val s = delta(i - 1)(p) + transition(p)(j)
          if (s > best) { best = s; arg = p }
          p += 1
        }
        delta(i)(j) = best + e(j)
        back(i)(j) = arg
        j += 1
      }
      i += 1
    }
    var bestLast = 0
    j = 1
    while (j < k) { if (delta(n - 1)(j) > delta(n - 1)(bestLast)) bestLast = j; j += 1 }
    val out = new Array[String](n)
    var cur = bestLast
    i = n - 1
    while (i >= 0) {
      out(i) = Tags(cur)
      cur = back(i)(cur)
      i -= 1
    }
    out.toVector
  }
}
