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
    * later tokens → inside). Class sets are Int BITMASKS (bit c = class c)
    * — membership is one branch-free bit test per class with no boxed-Set
    * probing in the per-token hot path. */
  final case class Gazetteer(
      begin: Map[String, Int],
      inside: Map[String, Int]) extends Serializable

  object Gazetteer {
    /** Build from (alias surface, class name) pairs. Deterministic. */
    def fromAliases(aliases: Iterable[(String, String)]): Gazetteer = {
      val b = collection.mutable.Map.empty[String, Int]
      val in = collection.mutable.Map.empty[String, Int]
      aliases.foreach { case (alias, clsName) =>
        val c = Classes.indexOf(clsName)
        if (c >= 0) {
          val toks = Tokenizer.tokenize(alias).map(_.text)
          if (toks.nonEmpty) {
            b.updateWith(toks.head)(m => Some(m.getOrElse(0) | (1 << c)))
            toks.tail.foreach { t =>
              in.updateWith(t)(m => Some(m.getOrElse(0) | (1 << c)))
            }
          }
        }
      }
      Gazetteer(b.toMap, in.toMap)
    }
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

  /** Reusable per-thread decode buffers — the document hot path runs one
    * DocProcessor per partition, so Viterbi tables are allocated once and
    * grown, not allocated per sentence (allocation bandwidth is the
    * scaling limiter at high core counts, BASELINE.md). */
  final class Scratch {
    private[NerModel] var delta: Array[Double] = new Array[Double](0)
    private[NerModel] var back: Array[Int] = new Array[Int](0)
    private[NerModel] var em: Array[Double] = new Array[Double](Tags.length)
    private[NerModel] def ensure(n: Int): Unit = {
      val need = n * Tags.length
      if (delta.length < need) {
        delta = new Array[Double](need)
        back = new Array[Int](need)
      }
    }
  }

  /** Exact Viterbi decode → one BIO tag per token. */
  def tag(tokens: IndexedSeq[String], gaz: Gazetteer): Vector[String] =
    tagArray(tokens, gaz, new Scratch).toVector

  /** Scratch-reusing form; returned array holds interned tag strings.
    *
    * The Viterbi step exploits the BIO transition structure instead of the
    * dense k×k scan: the O and B-* columns are UNIFORM over predecessors
    * (0 and −0.5 respectively), so their argmax is the single global max of
    * the previous row (computed once, k ops); only I-c restricts its
    * predecessors to {B-c, I-c}. Per step: ~k + 3·|Classes| ops instead of
    * k² — tie-breaking (first index wins on strict >) matches the dense
    * scan exactly, asserted against `tagArrayDense` in CoreSpec. */
  def tagArray(tokens: IndexedSeq[String], gaz: Gazetteer,
      scratch: Scratch): Array[String] = {
    val n = tokens.length
    if (n == 0) return Array.empty
    val k = Tags.length
    scratch.ensure(n)
    val delta = scratch.delta
    val back = scratch.back
    val e = scratch.em
    emissionsInto(tokens(0), gaz, e)
    var j = 0
    while (j < k) { delta(j) = start(j) + e(j); j += 1 }
    var i = 1
    while (i < n) {
      emissionsInto(tokens(i), gaz, e)
      val row = i * k
      val prev = row - k
      // global argmax of the previous row, first index wins ties — the
      // same tie-break the dense p-ascending scan produces
      var gbest = delta(prev)
      var garg = 0
      var p = 1
      while (p < k) {
        val s = delta(prev + p)
        if (s > gbest) { gbest = s; garg = p }
        p += 1
      }
      delta(row + O) = gbest + e(O)
      back(row + O) = garg
      var c = 0
      while (c < Classes.length) {
        val b = bOf(c)
        val ii = iOf(c)
        delta(row + b) = gbest - 0.5 + e(b)
        back(row + b) = garg
        val sb = delta(prev + b)
        val si = delta(prev + ii)
        if (si > sb) { delta(row + ii) = si + e(ii); back(row + ii) = ii }
        else { delta(row + ii) = sb + e(ii); back(row + ii) = b }
        c += 1
      }
      i += 1
    }
    val lastRow = (n - 1) * k
    var bestLast = 0
    j = 1
    while (j < k) {
      if (delta(lastRow + j) > delta(lastRow + bestLast)) bestLast = j
      j += 1
    }
    val out = new Array[String](n)
    var cur = bestLast
    i = n - 1
    while (i >= 0) {
      out(i) = Tags(cur)
      cur = back(i * k + cur)
      i -= 1
    }
    out
  }

  /** The dense O(k²)-per-step reference decoder over the explicit
    * transition matrix. Kept as the semantic definition the structured
    * fast path must match bit-for-bit (CoreSpec equivalence test); also
    * what a learned (non-BIO-structured) matrix would require. */
  private[graft] def tagArrayDense(tokens: IndexedSeq[String], gaz: Gazetteer,
      scratch: Scratch): Array[String] = {
    val n = tokens.length
    if (n == 0) return Array.empty
    val k = Tags.length
    scratch.ensure(n)
    val delta = scratch.delta
    val back = scratch.back
    val e = scratch.em
    emissionsInto(tokens(0), gaz, e)
    var j = 0
    while (j < k) { delta(j) = start(j) + e(j); j += 1 }
    var i = 1
    while (i < n) {
      emissionsInto(tokens(i), gaz, e)
      val row = i * k
      val prev = row - k
      j = 0
      while (j < k) {
        var best = NegInf * 2
        var arg = 0
        var p = 0
        while (p < k) {
          val s = delta(prev + p) + transition(p)(j)
          if (s > best) { best = s; arg = p }
          p += 1
        }
        delta(row + j) = best + e(j)
        back(row + j) = arg
        j += 1
      }
      i += 1
    }
    val lastRow = (n - 1) * k
    var bestLast = 0
    j = 1
    while (j < k) {
      if (delta(lastRow + j) > delta(lastRow + bestLast)) bestLast = j
      j += 1
    }
    val out = new Array[String](n)
    var cur = bestLast
    i = n - 1
    while (i >= 0) {
      out(i) = Tags(cur)
      cur = back(i * k + cur)
      i -= 1
    }
    out
  }

  /** emissions() variant writing into a reused buffer. */
  private def emissionsInto(tok: String, gaz: Gazetteer,
      e: Array[Double]): Unit = {
    java.util.Arrays.fill(e, 0.0)
    e(O) = 1.0
    val capitalized = tok.nonEmpty && tok.charAt(0).isUpper
    val beginMask = gaz.begin.getOrElse(tok, 0)
    val insideMask = gaz.inside.getOrElse(tok, 0)
    var c = 0
    while (c < Classes.length) {
      if ((beginMask & (1 << c)) != 0) e(bOf(c)) += 4.0
      if ((insideMask & (1 << c)) != 0) e(iOf(c)) += 4.0
      if (capitalized) { e(bOf(c)) += 0.25; e(iOf(c)) += 0.25 }
      c += 1
    }
    if (!capitalized && beginMask == 0 && insideMask == 0) e(O) += 2.0
  }
}
