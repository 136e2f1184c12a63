package graft.core

import java.nio.charset.StandardCharsets

/** Deterministic fixture generator — the executable reference oracle.
  *
  * `/root/reference/` was EMPTY at survey time (SURVEY.md §0), so per
  * SURVEY.md §3.4/§5 this pure, single-threaded, seeded generator defines
  * the "reference behavior" the Spark pipeline is graded against: it
  * synthesizes Common-Crawl-style `pages` (url, warc_ts, html, text, lang —
  * exactly the BASELINE.json input_hint shape), the canonical `entities`
  * and `aliases` tables, and computes golden outputs (extracted text bytes,
  * CoNLL BIO tags, mentions, links, canonicalized triples) from the *plant*,
  * i.e. from where it deliberately put entity surface forms — NOT by running
  * the pipeline, so the P/R gates are a real check, not a tautology.
  *
  * Everything derives from (Seed, rowId) via SplitMix64 — independent of
  * iteration order, thread, or partition layout, so the same rows can be
  * generated distributed on executors for the bench (graft.bench).
  */
object FixtureGen {

  val Seed = 42L

  // ---------- world model ----------

  final case class Entity(entity_id: Long, canonical: String, cls: String)
  final case class AliasRow(alias: String, entity_id: Long, prior: Double)

  private val PerFirst = Vector("Alice", "Bob", "Carol", "David", "Emma",
    "Frank", "Grace", "Henry", "Irene", "Jack")
  private val PerLast = Vector("Johnson", "Smith", "Brown", "Davis", "Wilson",
    "Taylor", "Clark", "Lewis", "Walker", "Hall")
  private val OrgFirst = Vector("Acme", "Globex", "Initech", "Umbrella",
    "Stark", "Wayne", "Cyberdyne", "Tyrell", "Hooli", "Vandelay")
  private val OrgSecond = Vector("Corp", "Industries", "Systems", "Labs",
    "Group", "Holdings", "Partners", "Networks", "Dynamics", "Logistics")
  private val LocFirst = Vector("Springfield", "Rivertown", "Lakeside",
    "Hillcrest", "Newport", "Eastvale", "Westbrook", "Northgate",
    "Southmere", "Portvale")
  private val LocSecond = Vector("City", "Bay", "Valley", "Heights", "Falls",
    "Harbor", "Ridge", "Plains", "Grove", "Point")
  private val TimFirst = Vector("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October")
  private val TimSecond = Vector("2020", "2021", "2022", "2023", "2024",
    "2025", "2026", "2027", "2028", "2029")

  private val DupSuffix = Map(
    "PER" -> "Junior", "ORG" -> "International", "LOC" -> "County",
    "TIM" -> "Era")

  /** Filler vocabulary — lowercase, disjoint from alias tokens (which are
    * capitalized or numeric) and from SpoPatterns.Predicates keys. */
  val Fillers: Vector[String] = Vector(
    "the", "a", "an", "quick", "slow", "red", "blue", "green", "old",
    "early", "late", "small", "big", "major", "minor", "market", "report",
    "growth", "data", "trade", "price", "index", "plan", "team", "goal",
    "deal", "talk", "note", "item", "asset", "while", "during", "under",
    "over", "near", "after", "before", "with", "about", "from")

  private val VerbLemmas = Vector("founded", "acquired", "visited", "met",
    "leads", "owns", "joined")

  val Langs = Vector("en", "de", "es", "fr", "zh")

  val HubId = 500L
  val NumBase = 200
  val NumDup = 40

  def entities(): Vector[Entity] = {
    val base = (0 until NumBase).map { e =>
      val cls = NerModel.Classes(e % 4)
      val idx = e / 4
      Entity(e.toLong, canonicalFor(cls, idx), cls)
    }
    val dups = (0 until NumDup).map { d =>
      val baseId = d.toLong
      val b = base(d)
      Entity(NumBase + d.toLong, b.canonical + " " + DupSuffix(b.cls), b.cls)
    }
    (base ++ dups :+ Entity(HubId, "Wikipedia", "ORG")).toVector
  }

  private def canonicalFor(cls: String, idx: Int): String = {
    val (f, s) = cls match {
      case "PER" => (PerFirst, PerLast)
      case "ORG" => (OrgFirst, OrgSecond)
      case "LOC" => (LocFirst, LocSecond)
      case "TIM" => (TimFirst, TimSecond)
    }
    f(idx % 10) + " " + s(idx / 10)
  }

  /** canonical alias 0.9 each; first-token short alias 0.5 (ambiguous across
    * entities sharing a first token); duplicates also carry their base's
    * canonical as an 0.85 alias — those prior≥0.8 shared surfaces are the
    * same-as edges the connected-components canonicalization resolves. */
  def aliases(): Vector[AliasRow] = {
    val es = entities()
    val byId = es.map(e => e.entity_id -> e).toMap
    val rows = Vector.newBuilder[AliasRow]
    es.foreach { e =>
      rows += AliasRow(e.canonical, e.entity_id, 0.9)
      val toks = e.canonical.split(' ')
      if (toks.length >= 2) rows += AliasRow(toks.head, e.entity_id, 0.5)
      if (e.entity_id >= NumBase && e.entity_id < NumBase + NumDup) {
        val base = byId(e.entity_id - NumBase)
        rows += AliasRow(base.canonical, e.entity_id, 0.85)
      }
    }
    rows.result()
  }

  /** Deterministic per-entity context profile; the generator plants one of
    * these words per mention, and the disambiguation UDF scores candidate
    * entities by sentence∩profile overlap (SURVEY.md §3.2 stage 6). */
  def profileWords(entityId: Long): Vector[String] =
    Vector(s"pw${entityId}a", s"pw${entityId}b", s"pw${entityId}c")

  /** Same-as edges: entities sharing an alias surface with prior ≥ 0.8. */
  def sameAsEdges(): Vector[(Long, Long)] = {
    aliases().filter(_.prior >= 0.8).groupBy(_.alias).values.flatMap { g =>
      val ids = g.map(_.entity_id).sorted
      ids.tail.map(ids.head -> _)
    }.toVector.sorted
  }

  /** entity_id → canonical of its component's min-id entity (golden). */
  def canonicalComponentMap(): Map[Long, Long] = {
    val comp = UnionFind.componentsOf(sameAsEdges())
    entities().map(e => e.entity_id ->
      comp.getOrElse(e.entity_id, e.entity_id)).toMap
  }

  // ---------- page generation ----------

  final case class PlantedMention(sentIdx: Int, beginTok: Int, endTok: Int,
      cls: String, surface: String, entityId: Long)
  final case class GoldSentence(sentIdx: Int, text: String,
      tokens: Vector[String], tags: Vector[String],
      mentions: Vector[PlantedMention],
      triples: Vector[(Long, String, Long)])
  final case class GoldPage(url: String, warcTsMicros: Long, lang: String,
      html: Array[Byte], text: String, sentences: Vector[GoldSentence]) {
    def textBytes: Array[Byte] = text.getBytes(StandardCharsets.UTF_8)
  }

  private val WarcBaseMicros = 1704067200000000L // 2024-01-01T00:00:00Z

  private lazy val entitiesById: Map[Long, Entity] =
    entities().map(e => e.entity_id -> e).toMap
  private lazy val allIds: Vector[Long] =
    (0 until (NumBase + NumDup)).map(_.toLong).toVector

  private def pickAlias(rng: Rng, e: Entity): String = {
    val toks = e.canonical.split(' ')
    val r = rng.nextInt(100)
    if (e.entity_id >= NumBase && e.entity_id < NumBase + NumDup && r < 15)
      entitiesById(e.entity_id - NumBase).canonical // shared 0.85 alias
    else if (toks.length >= 2 && r < 40) toks.head  // ambiguous short alias
    else e.canonical
  }

  /** Generate page `id` and its golden outputs. Pure in (Seed, id). */
  def page(id: Long): GoldPage = {
    val rng = Rng.forRow(Seed, id)
    val lang = rng.pick(Langs)
    val isHubPage = rng.nextInt(100) < 5
    val url =
      if (isHubPage) s"https://hub.wikipedia.example/wiki/p$id"
      else s"https://site${rng.nextInt(200)}.example/p$id"
    val nSent = 2 + rng.nextInt(5)
    val title = s"Report & Data $id"

    val sentences = Vector.newBuilder[GoldSentence]
    // sentence 0 = title line (no '.'; ends at the newline), all-O
    val titleTokens = Tokenizer.tokenize(title).map(_.text)
    sentences += GoldSentence(0, title, titleTokens,
      titleTokens.map(_ => "O"), Vector.empty, Vector.empty)

    var s = 0
    while (s < nSent) {
      sentences += contentSentence(rng, s + 1)
      s += 1
    }
    val sents = sentences.result()
    val text = sents.map(_.text).mkString("\n")
    val html = renderHtml(rng, title, sents.drop(1).map(_.text))
    GoldPage(url, WarcBaseMicros + id * 37000000L, lang, html, text, sents)
  }

  private def contentSentence(rng: Rng, sentIdx: Int): GoldSentence = {
    val subjId = allIds(rng.nextInt(allIds.length))
    var objId = allIds(rng.nextInt(allIds.length))
    if (rng.nextInt(100) < 10) objId = HubId // head-entity skew
    if (objId == subjId) objId = (subjId + 1) % NumBase
    val verb = rng.pick(VerbLemmas)
    val subj = entitiesById(subjId)
    val obj = entitiesById(objId)
    val subjSurface = pickAlias(rng, subj)
    val objSurface = pickAlias(rng, obj)
    val addWikiTail = rng.nextInt(100) < 15 && objId != HubId

    // word := (text, Some((cls, isBegin, entityId))) for planted tokens
    val words = Vector.newBuilder[(String, Option[(String, Boolean, Long)])]
    def filler(n: Int): Unit =
      (0 until n).foreach(_ => words += ((rng.pick(Fillers), None)))
    def plant(e: Entity, surface: String): Unit = {
      val ts = surface.split(' ')
      ts.zipWithIndex.foreach { case (t, i) =>
        words += ((t, Some((e.cls, i == 0, e.entity_id))))
      }
    }
    filler(rng.nextInt(3))
    plant(subj, subjSurface)
    words += ((profileWords(subjId)(rng.nextInt(3)), None))
    words += ((verb, None))
    filler(1 + rng.nextInt(2))
    words += ((profileWords(objId)(rng.nextInt(3)), None))
    plant(obj, objSurface)
    filler(rng.nextInt(2))
    if (addWikiTail) {
      words += (("about", None))
      plant(entitiesById(HubId), "Wikipedia")
    }
    val ws = words.result()
    val text = ws.map(_._1).mkString(" ") + " ."
    val tokens = ws.map(_._1) :+ "."
    val tags = ws.map {
      case (_, Some((cls, isBegin, _))) => if (isBegin) s"B-$cls" else s"I-$cls"
      case _ => "O"
    } :+ "O"
    // mentions: contiguous planted runs (a run = one (entityId, begin) plant)
    val mentions = Vector.newBuilder[PlantedMention]
    var i = 0
    while (i < ws.length) {
      ws(i)._2 match {
        case Some((cls, true, eid)) =>
          val start = i
          i += 1
          while (i < ws.length && ws(i)._2.exists(a => !a._2 && a._3 == eid)) i += 1
          mentions += PlantedMention(sentIdx, start, i, cls,
            ws.slice(start, i).map(_._1).mkString(" "), eid)
        case _ => i += 1
      }
    }
    val triple = Vector((subjId, verb, objId))
    GoldSentence(sentIdx, text, tokens, tags, mentions.result(), triple)
  }

  // ---------- HTML rendering (inverse of HtmlText.extract by design) ------

  private def renderHtml(rng: Rng, title: String,
      contentSents: Vector[String]): Array[Byte] = {
    val sb = new StringBuilder
    val titleEnc = title.replace("&", "&amp;")
    sb.append("<html>\r\n<head>\r\n<title>").append(titleEnc)
      .append("</title>\r\n<style>p { margin: 0; color: #333; }</style>\r\n")
      .append("</head>\r\n<body>\r\n<!-- seeded synthetic page -->\r\n")
    contentSents.foreach { sent =>
      sb.append("<p>").append(encodeSentence(rng, sent)).append("</p>\r\n")
      if (rng.nextInt(100) < 20)
        sb.append("<script type=\"text/javascript\">var x = 1 < 2 && 3 > 2;")
          .append("</script>\r\n")
    }
    sb.append("</body>\r\n</html>\r\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Obfuscations that HtmlText.extract must undo exactly: entity-encoded
    * chars, &nbsp; spaces, inline markup, numeric char refs. */
  private def encodeSentence(rng: Rng, sent: String): String = {
    var s = sent.replace("&", "&amp;")
    val r = rng.nextInt(100)
    if (r < 30) s = s.replaceFirst(" ", "&nbsp;")
    else if (r < 55) {
      // wrap the first word in inline markup (stripped to '')
      val sp = s.indexOf(' ')
      if (sp > 0) s = "<b>" + s.substring(0, sp) + "</b>" + s.substring(sp)
    } else if (r < 75) {
      // numeric character reference for the first 'a'
      val ai = s.indexOf('a')
      if (ai >= 0) s = s.substring(0, ai) + "&#97;" + s.substring(ai + 1)
    }
    s
  }
}
