package graft.pipeline

import graft.SparkTestBase
import graft.core.FixtureGen
import org.apache.spark.sql.functions._

/** The correctness gates from BASELINE.md, against the golden fixtures
  * (the executable reference — SURVEY.md §0/§3.4):
  *   - extracted text BYTE-IDENTICAL per url (input_hint invariant)
  *   - CoNLL tag P/R ≥ 0.95 (exact here)
  *   - mention/link correctness
  *   - canonicalized triple set P/R ≥ 0.95 (exact here)
  *   - fused narrow path == staged BroadcastHashJoin path
  */
class KgPipelineSpec extends SparkTestBase {

  private val N = 400L
  private lazy val pages = FixtureSpark.pages(spark, N, 8).cache()
  private lazy val golden = (0L until N).map(FixtureGen.page)
  private lazy val model = spark.sparkContext.broadcast(KgPipeline.fixtureModel())

  test("extract_text is byte-identical per url vs golden") {
    import spark.implicits._
    val got = KgPipeline.extractText(pages).collect()
      .map(p => p.url -> p.text).toMap
    assert(got.size == N)
    golden.foreach { g =>
      assert(got.contains(g.url), s"missing ${g.url}")
      val gotBytes = got(g.url).getBytes("UTF-8")
      assert(java.util.Arrays.equals(gotBytes, g.textBytes),
        s"text bytes differ for ${g.url}")
    }
  }

  test("NER tags: precision & recall vs golden (gate 0.95; exact here)") {
    val got = KgPipeline.sentences(pages, model).collect()
      .map(s => (s.url, s.sentIdx) -> s.tags.toVector).toMap
    var tp = 0L; var n = 0L
    golden.foreach { g =>
      g.sentences.foreach { gs =>
        val tags = got.getOrElse((g.url, gs.sentIdx), Vector.empty)
        assert(tags.length == gs.tags.length,
          s"${g.url} sent ${gs.sentIdx} token count")
        tp += tags.zip(gs.tags).count { case (a, b) => a == b }
        n += gs.tags.length
      }
    }
    val acc = tp.toDouble / n
    info(s"token tag accuracy = $acc over $n tokens")
    assert(acc >= 0.95)
    assert(acc == 1.0, "designed to be exact on fixtures")
  }

  test("mentions link to the planted entity (exact)") {
    val got = KgPipeline.mentions(pages, model).collect()
      .map(m => (m.url, m.sentIdx, m.mentionIdx) -> m.entity_id).toMap
    var total = 0
    golden.foreach { g =>
      g.sentences.foreach { gs =>
        gs.mentions.zipWithIndex.foreach { case (gm, mi) =>
          total += 1
          assert(got.get((g.url, gs.sentIdx, mi)).contains(gm.entityId),
            s"${g.url} s${gs.sentIdx} m$mi '${gm.surface}'")
        }
      }
    }
    info(s"$total mentions all correctly linked")
    assert(total > 500)
  }

  test("canonicalized triple set P/R vs golden (gate 0.95; exact here)") {
    val canonMap = FixtureGen.canonicalComponentMap()
    val canonName = FixtureGen.entities().map(e => e.entity_id -> e.canonical).toMap
    val goldTriples = golden.flatMap { g =>
      g.sentences.flatMap(_.triples.map { case (s, p, o) =>
        (canonName(canonMap(s)), p, canonName(canonMap(o)), g.url)
      })
    }.toSet

    val got = KgPipeline.run(spark, pages, FixtureSpark.entities(spark),
      FixtureSpark.aliases(spark)).collect()
      .map(t => (t.subj, t.pred, t.obj, t.url)).toSet

    val tp = (got intersect goldTriples).size.toDouble
    val precision = tp / got.size
    val recall = tp / goldTriples.size
    info(s"triples: got=${got.size} gold=${goldTriples.size} " +
      s"P=$precision R=$recall")
    assert(precision >= 0.95 && recall >= 0.95)
    assert(precision == 1.0 && recall == 1.0, "designed exact on fixtures")
  }

  test("fused narrow path links == staged BroadcastHashJoin+max_by links") {
    val fused = KgPipeline.mentions(pages, model).toDF()
      .where(col("entity_id") >= 0)
      .select("url", "sentIdx", "mentionIdx", "entity_id")
    val staged = KgPipeline.stagedLinks(spark, pages,
      FixtureSpark.aliases(spark))
    assert(fused.except(staged).isEmpty && staged.except(fused).isEmpty)
  }

  test("staged variant plans a BroadcastHashJoin") {
    val staged = KgPipeline.stagedLinks(spark, pages,
      FixtureSpark.aliases(spark))
    val physical = staged.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical.take(2000))
  }

  test("pages generation is partition-count independent") {
    import spark.implicits._
    val a = FixtureSpark.pages(spark, 64L, 2).map(_.url).collect().sorted
    val b = FixtureSpark.pages(spark, 64L, 16).map(_.url).collect().sorted
    assert(a.toSeq == b.toSeq)
  }
}
