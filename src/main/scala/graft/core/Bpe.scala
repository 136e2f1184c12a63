package graft.core

/** Byte-pair-encoding vocabulary training — the pure-Scala core shared by
  * the Spark operator (operators/BpeSpark) and the in-process reference
  * (`train`), so the two agree symbol-for-symbol by construction (the
  * HtmlText pattern: one implementation of the tricky semantics, called
  * from both sides).
  *
  * Semantics (classic BPE over a word-frequency table):
  *   - a word contributes its SYMBOL sequence (initially one symbol per
  *     character) weighted by its corpus frequency;
  *   - each round counts adjacent symbol pairs (overlapping occurrences
  *     count individually: "aaa" has two (a,a) pairs) and merges the most
  *     frequent pair everywhere, greedily left-to-right within each word;
  *   - ties break deterministically: count desc, then (a, b) ascending.
  */
object Bpe {

  /** One symbol per CODE POINT — not per UTF-16 char. Splitting a
    * supplementary-plane character (emoji) into its two surrogates
    * produces lone-surrogate strings, which are not valid UTF-8; the
    * moment such a symbol crosses into Spark it is mangled to '?' by the
    * UTF8String conversion and the distributed trainer diverges from the
    * reference (caught by the non-BMP end-to-end spec). */
  def symbolize(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Adjacent symbol pairs, overlapping occurrences included. */
  def pairsOf(syms: Vector[String]): Iterator[(String, String)] =
    if (syms.length < 2) Iterator.empty
    else syms.iterator.zip(syms.iterator.drop(1))

  /** Replace every (a, b) adjacency with the fused symbol a+b, greedily
    * left-to-right: in "a a a" merging (a,a) fuses positions 0-1, then
    * continues AFTER the fused token → ["aa", "a"]. */
  def mergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Frequency-weighted pair counts over a symbolized vocabulary. */
  def pairCounts(vocab: Iterable[(Vector[String], Long)])
      : Map[(String, String), Long] = {
    val m = scala.collection.mutable.Map.empty[(String, String), Long]
    vocab.foreach { case (syms, c) =>
      pairsOf(syms).foreach(p => m.update(p, m.getOrElse(p, 0L) + c))
    }
    m.toMap
  }

  /** UTF-8 binary string ordering — matches Spark's UTF8String
    * comparison, so the reference trainer and the distributed trainer's
    * `orderBy` break ties IDENTICALLY even on non-BMP symbols (Java's
    * UTF-16 compareTo orders supplementary-plane characters below
    * U+E000..U+FFFF; UTF-8 byte order puts them above). */
  val Utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(x: String, y: String): Int = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }

  /** The deterministic argmax: count desc, then (a, b) ascending in
    * UTF-8 byte order. */
  def bestPair(counts: Map[(String, String), Long])
      : Option[((String, String), Long)] = {
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long, Utf8Ordering, Utf8Ordering)
    if (counts.isEmpty) None
    else Some(counts.minBy { case ((a, b), c) => (-c, a, b) })
  }

  /** Encode one word with a learned merge table: repeatedly apply the
    * LOWEST-RANK merge present in the word until none applies — the
    * classic BPE inference rule (merge priority = training order, NOT
    * greedy left-to-right text order). O(|merges present| · |word|),
    * words are short. */
  def encode(word: String,
      ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = symbolize(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPairFound: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        ranks.get(p) match {
          case Some(r) if r < bestRank => bestRank = r; bestPairFound = p
          case _ => ()
        }
        i += 1
      }
      if (bestPairFound == null) continue = false
      else {
        syms = mergeOnce(syms, bestPairFound._1, bestPairFound._2)
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Longest PREFIX of a ranked pair list whose members are pairwise
    * symbol-disjoint ({a1,b1} ∩ {a2,b2} = ∅). Used by the batched
    * trainers: symbol-disjoint merges cannot create or destroy each
    * other's occurrences (merging [a,b]→[ab] never makes two other
    * symbols adjacent), so applying the whole prefix in one round leaves
    * every selected pair's count exactly what the ranking saw. Taking a
    * prefix — STOPPING at the first conflicting pair rather than skipping
    * it — keeps the selection as close as possible to sequential greedy
    * order (a skipped-over pair would have been the sequential trainer's
    * very next pick). */
  def disjointPrefix(ranked: Vector[(String, String, Long)])
      : Vector[(String, String, Long)] = disjointSelect(ranked, false)

  /** Greedy symbol-disjoint selection from a ranked pair list. With
    * `skipConflicts = false` this is `disjointPrefix` (stop at the first
    * conflict — closest to sequential greedy order). With
    * `skipConflicts = true` a conflicting pair is SKIPPED and scanning
    * continues — the standard parallel-BPE selection: it commits far
    * more merges per round on natural text (where top pairs share
    * common letters), at the cost of larger order-divergence from the
    * sequential trainer (a skipped pair would have been its very next
    * pick).
    *
    * A candidate (a, b) conflicts if ANY of a, b, or its fusion product
    * a+b intersects an earlier selection's {symbols ∪ fusion}. Both
    * fusion directions matter — the vocabulary can already contain a
    * symbol equal to a fusion product ("abc" formed in a past round):
    *   - forward: in [(a,bc), (abc,d)], applying (a,bc) CREATES new
    *     [abc, d] adjacencies that (abc,d) would consume beyond its
    *     recorded count;
    *   - backward: in [(abc,d), (a,bc)], applying (a,bc) FIRST would do
    *     the same — exact only under selection-order application.
    * Rejecting on either direction makes a selected merge unable to
    * create or destroy any other selection's occurrences, so every
    * recorded count is exact and in-batch application order is
    * genuinely irrelevant (no hidden ordering contract for callers). */
  def disjointSelect(ranked: Vector[(String, String, Long)],
      skipConflicts: Boolean): Vector[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val out = Vector.newBuilder[(String, String, Long)]
    var i = 0
    var stop = false
    while (i < ranked.length && !stop) {
      val (a, b, _) = ranked(i)
      if (used.contains(a) || used.contains(b) || used.contains(a + b)) {
        if (skipConflicts) i += 1 else stop = true
      } else { used += a; used += b; used += (a + b); out += ranked(i); i += 1 }
    }
    out.result()
  }

  private val RankedOrd: Ordering[(Long, String, String)] =
    Ordering.Tuple3(Ordering.Long, Utf8Ordering, Utf8Ordering)

  /** Pair counts ranked by the trainer's total order: count desc, then
    * (a, b) ascending in UTF-8 byte order — the same order Spark's
    * `orderBy(cnt.desc, a.asc, b.asc)` produces on UTF8Strings. */
  def rankPairs(counts: Map[(String, String), Long])
      : Vector[(String, String, Long)] =
    counts.toVector.map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }(RankedOrd)

  /** Reference BATCHED trainer (pure twin of
    * BpeSpark.trainMergesBatched): each round ranks all pairs once,
    * takes the top min(batchSize, remaining) and applies the
    * symbol-disjoint prefix of that list in a single pass. Returns
    * (merges, rounds-executed).
    *
    * Agreement with the exact single-merge trainer: IDENTICAL whenever,
    * within every round, no pair CREATED by an earlier batch member
    * (e.g. (x, ab) after merging (a,b)) would have out-ranked a later
    * batch member under the sequential trainer — a created pair's count
    * is bounded by its parent merge's count, so it CAN tie or beat the
    * batch's tail. That is the documented divergence; on corpora where
    * it cannot happen (top pairs symbol-disjoint and well-separated in
    * count from any created pair) the two trainers are equal — see
    * BpeSpec's batched-parity properties. batchSize = 1 degenerates to
    * the exact trainer by construction. */
  def trainBatched(wordCounts: Map[String, Long], nMerges: Int,
      batchSize: Int, skipConflicts: Boolean = false)
      : (Vector[(String, String, Long)], Int) = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    var vocab = wordCounts.toVector.map { case (w, c) => (symbolize(w), c) }
    val merges = Vector.newBuilder[(String, String, Long)]
    var k = 0
    var rounds = 0
    var done = false
    while (k < nMerges && !done) {
      val ranked = rankPairs(pairCounts(vocab))
        .take(math.min(batchSize, nMerges - k))
      val batch = disjointSelect(ranked, skipConflicts)
      if (batch.isEmpty) done = true
      else {
        merges ++= batch
        vocab = vocab.map { case (s, n) =>
          (batch.foldLeft(s) { case (acc, (a, b, _)) =>
            mergeOnce(acc, a, b) }, n)
        }
        k += batch.length
        rounds += 1
      }
    }
    (merges.result(), rounds)
  }

  /** Reference trainer: returns the merge table (a, b, count-at-merge)
    * in merge order. Stops early if no pair remains. */
  def train(wordCounts: Map[String, Long],
      nMerges: Int): Vector[(String, String, Long)] = {
    var vocab = wordCounts.toVector.map { case (w, c) => (symbolize(w), c) }
    val merges = Vector.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      bestPair(pairCounts(vocab)) match {
        case None => done = true
        case Some(((a, b), c)) =>
          merges += ((a, b, c))
          vocab = vocab.map { case (s, n) => (mergeOnce(s, a, b), n) }
          k += 1
      }
    }
    merges.result()
  }
}
