package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CoreSpec extends AnyFunSuite {

  // ---- HtmlText ----

  test("extract strips tags, scripts, styles, comments; decodes entities") {
    val html =
      ("<html>\r\n<head><title>A &amp; B</title><style>p{x:1}</style></head>" +
        "<body><!-- junk --><p>hello <b>world</b></p>" +
        "<script>var x = 1 < 2;</script><p>bye&nbsp;now &#97;nd &#x41;</p>" +
        "</body></html>").getBytes("UTF-8")
    assert(HtmlText.extract(html) == "A & B\nhello world\nbye now and A")
  }

  test("whitespace normalization: CRLF, tabs, runs, blank lines") {
    assert(HtmlText.normalizeWhitespace("a \t b\r\n\r\n  c  ") == "a b\nc")
  }

  // ---- Tokenizer ----

  test("token offsets reconstruct the sentence") {
    val s = "Alice Johnson met Acme Corp ."
    Tokenizer.tokenize(s).foreach { t =>
      assert(s.substring(t.begin, t.end) == t.text)
    }
  }

  test("sentences split on periods and newlines") {
    assert(Tokenizer.sentences("Title line\nfoo bar. baz qux .") ==
      Vector("Title line", "foo bar.", "baz qux ."))
  }

  // ---- BioSpans round trip ----

  test("spans -> tags -> spans round trip") {
    val toks = Tokenizer.tokenize("x Alice Johnson y Acme z")
    val tags = Vector("O", "B-PER", "I-PER", "O", "B-ORG", "O")
    val spans = BioSpans.toSpans(toks, tags)
    assert(spans.map(s => (s.beginTok, s.endTok, s.cls, s.surface)) ==
      Vector((1, 3, "PER", "Alice Johnson"), (4, 5, "ORG", "Acme")))
    assert(BioSpans.toTags(toks.length, spans) == tags)
  }

  // ---- NerModel / Viterbi ----

  lazy val gaz = NerModel.Gazetteer.fromAliases(
    FixtureGen.aliases().map(a =>
      a.alias -> FixtureGen.entities().find(_.entity_id == a.entity_id).get.cls))

  test("viterbi recovers planted tags on every fixture page") {
    (0L until 200L).foreach { id =>
      val p = FixtureGen.page(id)
      p.sentences.foreach { gs =>
        val got = NerModel.tag(gs.tokens, gaz)
        assert(got == gs.tags,
          s"page $id sent ${gs.sentIdx}: ${gs.tokens.mkString(" ")}")
      }
    }
  }

  test("viterbi never emits I-x after O or other-class tag") {
    (0L until 100L).foreach { id =>
      val p = FixtureGen.page(id)
      p.sentences.foreach { gs =>
        val got = NerModel.tag(gs.tokens, gaz)
        got.sliding(2).foreach {
          case Seq(prev, cur) if cur.startsWith("I-") =>
            val cls = cur.substring(2)
            assert(prev == s"B-$cls" || prev == s"I-$cls")
          case _ =>
        }
      }
    }
  }

  test("structured Viterbi == dense-matrix Viterbi (fixtures + random)") {
    val scratch = new NerModel.Scratch
    val scratch2 = new NerModel.Scratch
    (0L until 200L).foreach { id =>
      FixtureGen.page(id).sentences.foreach { gs =>
        assert(NerModel.tagArray(gs.tokens, gaz, scratch).toSeq ==
          NerModel.tagArrayDense(gs.tokens, gaz, scratch2).toSeq,
          s"page $id sent ${gs.sentIdx}")
      }
    }
    // adversarial soups: gazetteer words (begin/inside of multi-token
    // aliases), capitalized strays, plain words, punctuation
    val words = FixtureGen.aliases().flatMap(a => a.alias.split(' ')).distinct
      .take(40) ++ Vector("the", "Xyz", "zz", ".", ",", "Alice", "7")
    val rng = new Rng(0x7e57L)
    (0 until 2000).foreach { trial =>
      val n = 1 + rng.nextInt(12)
      val toks = Vector.fill(n)(words(rng.nextInt(words.length)))
      assert(NerModel.tagArray(toks, gaz, scratch).toSeq ==
        NerModel.tagArrayDense(toks, gaz, scratch2).toSeq,
        s"trial $trial toks=$toks")
    }
  }

  // ---- HtmlText ∘ render = golden text (byte-identical) ----

  test("extract(render(page)) is byte-identical to golden text") {
    (0L until 300L).foreach { id =>
      val p = FixtureGen.page(id)
      val got = HtmlText.extractBytes(p.html)
      assert(java.util.Arrays.equals(got, p.textBytes), s"page $id")
    }
  }

  test("golden sentences equal Tokenizer.sentences of golden text") {
    (0L until 200L).foreach { id =>
      val p = FixtureGen.page(id)
      assert(Tokenizer.sentences(p.text) == p.sentences.map(_.text))
      p.sentences.foreach { gs =>
        assert(Tokenizer.tokenize(gs.text).map(_.text) == gs.tokens,
          s"page $id sent ${gs.sentIdx}")
      }
    }
  }

  // ---- Linking resolves every planted mention to the true entity ----

  test("prior + windowed context overlap links every mention correctly") {
    val aliasMap = FixtureGen.aliases().groupBy(_.alias)
    (0L until 300L).foreach { id =>
      val p = FixtureGen.page(id)
      p.sentences.foreach { gs =>
        gs.mentions.foreach { m =>
          val cands = aliasMap(m.surface)
          val ctx = Linking.contextTokens(gs.tokens, m.beginTok, m.endTok)
          val best = cands.map { c =>
            val prof = FixtureGen.profileWords(c.entity_id).toSet
            (Linking.score(c.prior, prof, ctx), c.entity_id)
          }.minBy { case (s, eid) => (-s, eid) }
          assert(best._2 == m.entityId,
            s"page $id sent ${gs.sentIdx} surface '${m.surface}' " +
              s"cands=${cands.map(_.entity_id)} got=${best._2}")
        }
      }
    }
  }

  // ---- SpoPatterns recovers exactly the planted triple ----

  test("SVO pattern extraction matches planted triples") {
    (0L until 300L).foreach { id =>
      val p = FixtureGen.page(id)
      p.sentences.foreach { gs =>
        val toks = Tokenizer.tokenize(gs.text)
        val spans = BioSpans.toSpans(toks, gs.tags)
        val got = SpoPatterns.extract(toks, spans)
        val gotTriples = got.map { c =>
          (gs.mentions(c.subjIdx).entityId, c.pred,
            gs.mentions(c.objIdx).entityId)
        }
        assert(gotTriples == gs.triples,
          s"page $id sent ${gs.sentIdx}: ${gs.text}")
      }
    }
  }

  // ---- UnionFind vs sameAs edges ----

  test("union-find merges exactly the base/dup pairs") {
    val comp = FixtureGen.canonicalComponentMap()
    (0 until FixtureGen.NumDup).foreach { d =>
      assert(comp(FixtureGen.NumBase + d.toLong) == d.toLong)
      assert(comp(d.toLong) == d.toLong)
    }
    assert(comp(FixtureGen.HubId) == FixtureGen.HubId)
    // non-dup bases are singletons
    (FixtureGen.NumDup until FixtureGen.NumBase).foreach { e =>
      assert(comp(e.toLong) == e.toLong)
    }
  }

  test("fused extractor equals reference normalization on tag-free text") {
    // property: for text with no markup, extract == normalizeWhitespace
    val rng = new Rng(99L)
    val alphabet = "ab \t\n\r".toCharArray
    (0 until 500).foreach { _ =>
      val s = new String(Array.fill(rng.nextInt(60))(alphabet(rng.nextInt(6))))
      assert(HtmlText.extractFromString(s) == HtmlText.normalizeWhitespace(s),
        s"input=${s.map(c => if (c == '\n') 'N' else if (c == '\r') 'R' else if (c == '\t') 'T' else c)}")
    }
  }

  test("fused extractSentences == Tokenizer.sentences ∘ extract (fixtures)") {
    (0L until 300L).foreach { id =>
      val p = FixtureGen.page(id)
      assert(HtmlText.extractSentences(p.html) ==
        Tokenizer.sentences(HtmlText.extract(p.html)), s"page $id")
    }
  }

  test("fused extractSentences == Tokenizer.sentences ∘ extract (adversarial)") {
    // random soups of tags, comments, scripts, entities, punctuation,
    // control chars, and whitespace — the two paths share the scanner, so
    // this pins the sink equivalence (boundary, trim, space-collapse rules)
    val rng = new Rng(0xabcdL)
    val pieces = Array(
      "a", "bb", ".", "!", "?", " ", "\t", "\n", "\r\n", "<p>", "</p>",
      "<b>", "</b>", "<br>", "<div >", "&amp;", "&#97;", "&#x41;", "&nbsp;",
      "&bogus;", "&#xD800;", "<!-- c -->", "<script>x<y</script>",
      "<style>p{}</style>", "", "..", "x.y", "<", ">", "&",
      "<title>t</title>", "Report 7", "中")
    (0 until 2000).foreach { trial =>
      val n = 1 + rng.nextInt(40)
      val html = new StringBuilder
      (0 until n).foreach(_ => html.append(pieces(rng.nextInt(pieces.length))))
      val s = html.toString
      assert(HtmlText.extractSentencesFromString(s) ==
        Tokenizer.sentences(HtmlText.extractFromString(s)),
        s"trial $trial input=$s")
    }
  }

  test("determinism: same page id generates identical bytes") {
    val a = FixtureGen.page(7L)
    val b = FixtureGen.page(7L)
    assert(java.util.Arrays.equals(a.html, b.html))
    assert(a.text == b.text && a.url == b.url)
  }
}
