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
  * FixtureGen goldens.
  */
object DocPipeline {

  /** alias surface → candidate (entity_id, prior), sorted by entity_id. */
  type AliasMap = Map[String, Vector[(Long, Double)]]

  final case class DocSentence(sentIdx: Int, tokens: Vector[String],
      tags: Vector[String])
  final case class DocMention(sentIdx: Int, mentionIdx: Int, beginTok: Int,
      endTok: Int, cls: String, surface: String, entityId: Long,
      score: Double)
  final case class DocTriple(subjId: Long, pred: String, objId: Long)
  final case class DocResult(text: String, sentences: Vector[DocSentence],
      mentions: Vector[DocMention], triples: Vector[DocTriple])

  def process(html: Array[Byte], gaz: NerModel.Gazetteer,
      aliasMap: AliasMap,
      profile: Long => Set[String]): DocResult = {
    val text = HtmlText.extract(html)
    val sents = Tokenizer.sentences(text)
    val sentences = Vector.newBuilder[DocSentence]
    val mentions = Vector.newBuilder[DocMention]
    val triples = Vector.newBuilder[DocTriple]
    var si = 0
    while (si < sents.length) {
      val toks = Tokenizer.tokenize(sents(si))
      val words = toks.map(_.text)
      val tags = NerModel.tag(words, gaz)
      sentences += DocSentence(si, words, tags)
      val spans = BioSpans.toSpans(toks, tags)
      // link each span: candidates from the broadcast alias map, scored by
      // prior + windowed context overlap, top-1 by (score desc, id asc)
      val linked = spans.zipWithIndex.map { case (sp, mi) =>
        val ctx = Linking.contextTokens(words, sp.beginTok, sp.endTok)
        val cands = aliasMap.getOrElse(sp.surface, Vector.empty)
        val (eid, score) =
          if (cands.isEmpty) (-1L, 0.0)
          else {
            val best = cands.map { case (id, prior) =>
              (Linking.score(prior, profile(id), ctx), id)
            }.minBy { case (s, id) => (-s, id) }
            (best._2, best._1)
          }
        DocMention(si, mi, sp.beginTok, sp.endTok, sp.cls, sp.surface,
          eid, score)
      }
      linked.foreach(mentions += _)
      SpoPatterns.extract(toks, spans).foreach { c =>
        val s = linked(c.subjIdx)
        val o = linked(c.objIdx)
        if (s.entityId >= 0 && o.entityId >= 0)
          triples += DocTriple(s.entityId, c.pred, o.entityId)
      }
      si += 1
    }
    DocResult(text, sentences.result(), mentions.result(), triples.result())
  }
}
