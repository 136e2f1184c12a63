package graft.pipeline

import graft.SparkTestBase
import graft.core.{Bpe, Conll, DocPipeline}
import graft.operators.BpeSpark
import org.apache.spark.sql.functions._

/** Regression net for the round-4 core/pipeline review findings — each
  * test reproduces the pre-fix failure exactly.
  */
class ReviewFixesSpec extends SparkTestBase {

  test("canonicalMap survives a component whose min id is a dangling " +
      "alias entity_id") {
    import spark.implicits._
    // ids 3 and 9 share an alias → one component with min label 3, but
    // entity 3 does NOT exist; pre-fix the inner rep join dropped the
    // whole component (entity 9 vanished from the map)
    val entities = Seq((7L, "Seven", "org"), (9L, "Nine", "org"))
      .toDF("entity_id", "canonical", "cls")
    val aliases = Seq(("acme", 3L, 0.9), ("acme", 9L, 0.8),
      ("seven", 7L, 1.0)).toDF("alias", "entity_id", "prior")
    val m = KgPipeline.canonicalMap(spark, entities, aliases)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m.keySet == Set(7L, 9L), s"entities dropped: $m")
    // 9's representative is the min EXISTING member (9 itself — 3 has
    // no canonical row to represent anyone)
    assert(m(9L) == "Nine" && m(7L) == "Seven")
  }

  test("fused linker selects a zero-score candidate (staged max_by parity)") {
    val html = "<p>Acme ships products.</p>".getBytes("UTF-8")
    // gazetteer knows "Acme" as an org; its only candidate has prior 0.0
    // and an empty profile → total score 0.0; pre-fix it stayed unlinked
    val gaz = graft.pipeline.KgPipeline.fixtureModel().gaz
    val aliasMap: DocPipeline.AliasMap = Map("Acme" -> Vector((42L, 0.0)))
    val res = DocPipeline.process(html, gaz, aliasMap, _ => Vector.empty)
    val acme = res.mentions.filter(_.surface == "Acme")
    assume(acme.nonEmpty, "fixture gazetteer must tag Acme")
    assert(acme.forall(_.entityId == 42L),
      s"zero-score candidate not linked: $acme")
  }

  test("runResumable handles a first run that produces ZERO triples") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("zero-triples")
    val pages = Seq.tabulate(8) { i =>
      (s"https://nothing.example/$i",
        new java.sql.Timestamp(1700000000000L + i),
        "<p>nothing of note here at all</p>".getBytes("UTF-8"),
        null.asInstanceOf[String], "en")
    }.toDF("url", "warc_ts", "html", "text", "lang")
    val pagesDir = s"$work/pages"
    Icebergish.write(Icebergish.withBucket(pages, 16), pagesDir)
    val n = Icebergish.runResumable(spark, pagesDir, s"$work/out",
      FixtureSpark.entities(spark), FixtureSpark.aliases(spark),
      runId = "zero1", numBuckets = 16)
    assert(n == 8L, "first run must process all pages")
    // the manifest must record rows=0 buckets so resume is a no-op —
    // pre-fix the stats read crashed on schema inference and the job
    // was a permanent reprocess-and-crash loop
    val again = Icebergish.runResumable(spark, pagesDir, s"$work/out",
      FixtureSpark.entities(spark), FixtureSpark.aliases(spark),
      runId = "zero2", numBuckets = 16)
    assert(again == 0L, "second run must resume to nothing")
  }

  test("runResumable rejects a numBuckets that mismatches ingestion") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("bucket-mismatch")
    val pages = FixtureSpark.pages(spark, 64L, 4)
    Icebergish.write(Icebergish.withBucket(pages.toDF(), 64),
      s"$work/pages")
    val e = intercept[IllegalArgumentException] {
      Icebergish.runResumable(spark, s"$work/pages", s"$work/out",
        FixtureSpark.entities(spark), FixtureSpark.aliases(spark),
        runId = "mm", numBuckets = 256)
    }
    assert(e.getMessage.contains("bucketing mismatch"))
  }

  test("BPE tie-break is UTF-8 byte order, identical in core and Spark") {
    import spark.implicits._
    // U+E000 (UTF-8: EE 80 80) sorts BELOW U+1F600 (F0 9F 98 80) in byte
    // order but ABOVE it in Java UTF-16 order (surrogates 0xD83D…) — a
    // tie between them picks opposite winners pre-fix
    val e000 = ""
    val emoji = new String(Character.toChars(0x1F600))
    assert(Bpe.Utf8Ordering.lt(e000, emoji), "byte order: U+E000 first")
    assert(e000.compareTo(emoji) > 0, "UTF-16 order disagrees (the trap)")
    val counts = Map((e000, "x") -> 5L, (emoji, "x") -> 5L)
    assert(Bpe.bestPair(counts).map(_._1).contains((e000, "x")))
    // end-to-end: a tie-heavy non-BMP corpus trains identically
    val corpus = Seq(s"$emoji${e000} $e000$emoji", s"$emoji$e000")
      .toDF("text")
    val wc = corpus.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val ref = Bpe.train(wc, 3)
    val got = BpeSpark.trainMerges(corpus, "text", 3)
      .map { case (_, a, b, c) => (a, b, c) }
    assert(got == ref)
  }

  test("Conll.parse: positioned error on tab-less rows, bare -DOCSTART- ok") {
    val e = intercept[IllegalArgumentException] {
      Conll.parse("-DOCSTART- (u1)\nBob\tB-per\nbad row no tab\n")
    }
    assert(e.getMessage.contains("line 3"))
    // the url-less CoNLL-2003 header form: tolerated, its doc dropped
    val docs = Conll.parse(
      "-DOCSTART-\nX\tO\n\n-DOCSTART- (u2)\nBob\tB-per\n")
    assert(docs.map(_._1) == Vector("u2"))
  }
}
