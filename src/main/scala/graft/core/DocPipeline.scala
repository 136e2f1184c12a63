package graft.core

/** The per-document narrow path: html → text → sentences → BIO tags →
  * mentions → linked entities → SVO triples, as ONE pure function.
  *
  * This is the 100 TB design decision (SURVEY.md §3.2): every stage here is
  * document-local, so the Spark pipeline runs it inside a single
  * `mapPartitions` over the pages scan — zero wide shuffles for the
  * document-granularity data. Candidate generation consumes a broadcast
  * alias hash map (the typed-layer realization of a broadcast hash join —
  * the staged DataFrame variant with an actual BroadcastHashJoinExec is
  * cross-checked against this in KgPipelineSpec).
  *
  * Pure and deterministic: also called by tests directly against the
  * FixtureGen goldens. Instantiate ONE DocProcessor per partition — it
  * carries reusable Viterbi scratch (allocation bandwidth is the scaling
  * limiter at high core counts, BASELINE.md).
  */
object DocPipeline {

  /** alias surface → candidate (entity_id, prior), sorted by entity_id. */
  type AliasMap = Map[String, Vector[(Long, Double)]]

  final case class DocSentence(sentIdx: Int, tokens: Seq[String],
      tags: Seq[String])
  final case class DocMention(sentIdx: Int, mentionIdx: Int, beginTok: Int,
      endTok: Int, cls: String, surface: String, entityId: Long,
      score: Double)
  final case class DocTriple(subjId: Long, pred: String, objId: Long)
  // no `text` field: the narrow stage consumes sentences/mentions/triples
  // only, and the fused html→sentences extractor (HtmlText.extractSentences)
  // never materializes the full normalized text — the extractText STAGE
  // (which must produce byte-identical text) uses HtmlText.extract directly
  final case class DocResult(sentences: Vector[DocSentence],
      mentions: Vector[DocMention], triples: Vector[DocTriple])

  /** One-shot convenience (tests); Spark stages use a DocProcessor. */
  def process(html: Array[Byte], gaz: NerModel.Gazetteer,
      aliasMap: AliasMap,
      profile: Long => IndexedSeq[String]): DocResult =
    new DocProcessor(gaz, aliasMap, profile).process(html)
}

final class DocProcessor(gaz: NerModel.Gazetteer,
    aliasMap: DocPipeline.AliasMap,
    profile: Long => IndexedSeq[String]) extends Serializable {
  import DocPipeline._

  private val scratch = new NerModel.Scratch

  /** The sentence/tag prefix of `process` — html → sentences → BIO tags,
    * STOPPING before span extraction, linking, and SPO. The sentences
    * stage only keeps tokens/tags, and paying the candidate-scan +
    * context-overlap + pattern-extraction cost per page just to discard
    * the result is pure waste in the throughput-bound hot path. */
  def processSentences(html: Array[Byte]): Vector[DocSentence] = {
    val sents = HtmlText.extractSentences(html)
    val sentences = Vector.newBuilder[DocSentence]
    var si = 0
    while (si < sents.length) {
      val toks = Tokenizer.tokenize(sents(si))
      val words: IndexedSeq[String] =
        scala.collection.immutable.ArraySeq.unsafeWrapArray(
          Array.tabulate(toks.length)(toks(_).text))
      val tagArr = NerModel.tagArray(words, gaz, scratch)
      val tags: IndexedSeq[String] =
        scala.collection.immutable.ArraySeq.unsafeWrapArray(tagArr)
      sentences += DocSentence(si, words, tags)
      si += 1
    }
    sentences.result()
  }

  def process(html: Array[Byte]): DocResult = process(html, emitTriples = true)

  /** @param emitTriples false skips SPO pattern extraction — for the
    *   mentions stage, which discards triples anyway */
  def process(html: Array[Byte], emitTriples: Boolean): DocResult = {
    // fused: sentences straight from the tag-stripping state machine —
    // equals Tokenizer.sentences(HtmlText.extract(html)), property-tested
    val sents = HtmlText.extractSentences(html)
    val sentences = Vector.newBuilder[DocSentence]
    val mentions = Vector.newBuilder[DocMention]
    val triples = Vector.newBuilder[DocTriple]
    var si = 0
    while (si < sents.length) {
      val toks = Tokenizer.tokenize(sents(si))
      val words: IndexedSeq[String] =
        scala.collection.immutable.ArraySeq.unsafeWrapArray(
          Array.tabulate(toks.length)(toks(_).text))
      val tagArr = NerModel.tagArray(words, gaz, scratch)
      val tags: IndexedSeq[String] =
        scala.collection.immutable.ArraySeq.unsafeWrapArray(tagArr)
      sentences += DocSentence(si, words, tags)
      val spans = BioSpans.toSpans(toks, tags)
      // link each span: candidates from the broadcast alias map, scored by
      // prior + windowed context overlap, top-1 by (score desc, id asc)
      val linked = spans.zipWithIndex.map { case (sp, mi) =>
        val cands = aliasMap.getOrElse(sp.surface, Vector.empty)
        // ANY candidate beats none (the staged max_by path links
        // unconditionally, and "top-1 by (score desc, id asc)" must hold
        // even when the best total score is 0.0 — seeding bestScore with
        // 0.0 and strict > silently dropped zero-prior candidates)
        var bestId = -1L
        var bestScore = Double.NegativeInfinity
        var ci = 0
        while (ci < cands.length) {
          val (id, prior) = cands(ci)
          val s = Linking.overlapScore(prior, profile(id), words,
            sp.beginTok, sp.endTok)
          if (bestId < 0 || s > bestScore || (s == bestScore && id < bestId)) {
            bestScore = s; bestId = id
          }
          ci += 1
        }
        DocMention(si, mi, sp.beginTok, sp.endTok, sp.cls, sp.surface,
          bestId, if (bestId >= 0) bestScore else 0.0)
      }
      linked.foreach(mentions += _)
      if (emitTriples) SpoPatterns.extract(toks, spans).foreach { c =>
        val s = linked(c.subjIdx)
        val o = linked(c.objIdx)
        if (s.entityId >= 0 && o.entityId >= 0)
          triples += DocTriple(s.entityId, c.pred, o.entityId)
      }
      si += 1
    }
    DocResult(sentences.result(), mentions.result(), triples.result())
  }
}
