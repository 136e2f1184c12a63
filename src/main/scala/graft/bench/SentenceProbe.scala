package graft.bench

import java.util.concurrent.atomic.AtomicLong

import graft.core.{FixtureGen, HtmlText, Tokenizer}

/** Dev probe: fused html→sentences vs unfused (extract → full-text String
  * → Tokenizer.sentences), same pages, same JVM, T threads — isolates the
  * one stage the fused extractor changes from all Spark/IO noise and from
  * box drift (both variants measured seconds apart under identical load).
  * Usage: runMain graft.bench.SentenceProbe [nPages] [threads]
  */
object SentenceProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val threads = if (args.length > 1) args(1).toInt else 32
    val htmls = Array.tabulate(n)(i => FixtureGen.page(i.toLong).html)

    def run(name: String, f: Array[Byte] => Int): Unit = {
      // warm-up + 3 trials, best wall
      val walls = (0 to 3).map { trial =>
        val acc = new AtomicLong
        val next = new AtomicLong
        val ts = (0 until threads).map { _ =>
          new Thread(() => {
            var i = next.getAndIncrement().toInt
            var local = 0L
            while (i < n) {
              local += f(htmls(i))
              i = next.getAndIncrement().toInt
            }
            acc.addAndGet(local)
            ()
          })
        }
        val t0 = System.nanoTime()
        ts.foreach(_.start())
        ts.foreach(_.join())
        val w = (System.nanoTime() - t0) / 1e9
        require(acc.get() > 0)
        w
      }.drop(1).min
      // scalastyle:off println
      println(f"[sent-probe] threads=$threads $name%-8s $walls%.3f s " +
        f"(${n / walls}%.0f pages/s)")
      // scalastyle:on println
    }

    run("unfused", h => Tokenizer.sentences(HtmlText.extract(h)).length)
    run("fused", h => HtmlText.extractSentences(h).length)
    run("unfused", h => Tokenizer.sentences(HtmlText.extract(h)).length)
    run("fused", h => HtmlText.extractSentences(h).length)

    // Viterbi: structured-transition fast path vs dense k² reference
    val model = graft.pipeline.KgPipeline.fixtureModel()
    val scratchPool = new ThreadLocal[graft.core.NerModel.Scratch] {
      override def initialValue() = new graft.core.NerModel.Scratch
    }
    def sentsOf(h: Array[Byte]): Vector[Vector[String]] =
      HtmlText.extractSentences(h).map(s =>
        Tokenizer.tokenize(s).map(_.text))
    run("vit-fast", h => sentsOf(h).map(t =>
      graft.core.NerModel.tagArray(t, model.gaz, scratchPool.get()).length).sum)
    run("vit-dense", h => sentsOf(h).map(t =>
      graft.core.NerModel.tagArrayDense(t, model.gaz, scratchPool.get()).length).sum)
    run("vit-fast", h => sentsOf(h).map(t =>
      graft.core.NerModel.tagArray(t, model.gaz, scratchPool.get()).length).sum)
    run("vit-dense", h => sentsOf(h).map(t =>
      graft.core.NerModel.tagArrayDense(t, model.gaz, scratchPool.get()).length).sum)

    // the WHOLE per-document path sans Spark: separates core compute from
    // scan/encoder/write overhead when compared with the pipeline bench
    val procPool = new ThreadLocal[graft.core.DocProcessor] {
      override def initialValue() = new graft.core.DocProcessor(
        model.gaz, model.aliasMap, graft.core.FixtureGen.profileWords)
    }
    run("docpipe", h => procPool.get().process(h).triples.length)
    run("docpipe", h => procPool.get().process(h).triples.length)
  }
}
