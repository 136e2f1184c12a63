package graft.bench

import graft.operators.BpeSpark
import org.apache.spark.sql.SparkSession

/** Dev probe: exact vs batched BPE training at production-shaped merge
  * counts — the evidence row for the batched trainer's point. The exact
  * trainer is nMerges sequential Spark rounds (each a pair-count
  * aggregate + a one-row collect + a vocab re-map job); the batched
  * trainer commits the symbol-disjoint prefix of the top-`batch` pairs
  * per round, so its round count — and with it the driver-dispatch
  * fixed cost that dominates at 30–50k merges — shrinks by the mean
  * committed-batch size.
  *
  * Usage: runMain graft.bench.BpeBench [sfDir|synth:<nDocs>]
  *   [nMerges] [batch]
  * The `synth:<nDocs>` source generates a deterministic Zipf corpus
  * over a 50k-word lexicon — the sf dirs' synthetic keyword corpus
  * EXHAUSTS its mergeable vocabulary at ~90 merges, so
  * thousand-merge-scale evidence needs a corpus with natural-text-like
  * pair diversity. Prints one line per trainer: merges, rounds, wall
  * seconds.
  */
object BpeBench {

  /** Deterministic Zipf-ish corpus: `nDocs` docs × 80 words drawn from a
    * 50k-word lexicon with density concentrated on low ranks (u³ draw).
    * Pure function of (doc id, position) — identical at any
    * parallelism, no RNG state. */
  def synthDocs(spark: SparkSession, nDocs: Long)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val lexSize = 50000
    def word(rank: Int): String = {
      // base-26 encoding, 4+ letters: distinct per rank, varied lengths
      val sb = new StringBuilder
      var r = rank + 26 * 26 * 26 * 26 // force ≥ 4 letters
      while (r > 0) { sb += ('a' + r % 26).toChar; r /= 26 }
      sb.result()
    }
    spark.range(0L, nDocs, 1L, 64).map { id =>
      val words = new StringBuilder
      var x = id * 6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < 80) {
        x = x * 6364136223846793005L + 1442695040888963407L
        val u = ((x >>> 11).toDouble / (1L << 53).toDouble)
        val rank = (u * u * u * lexSize).toInt.min(lexSize - 1)
        if (i > 0) words += ' '
        words ++= word(rank)
        i += 1
      }
      words.result()
    }.toDF("text")
  }

  def main(args: Array[String]): Unit = {
    val source = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = if (args.length > 1) args(1).toInt else 60
    val batch = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs =
      if (source.startsWith("synth:"))
        synthDocs(spark, source.stripPrefix("synth:").toLong)
      else spark.read.parquet(s"$source/documents.parquet")
    // warm-up: parquet footer + codegen caches, excluded from the clock
    BpeSpark.trainMerges(docs, "text", 2)

    // the exact leg is one Spark round per merge — cap it at 200 rounds
    // and extrapolate, or a synth:2000-merge probe would spend most of
    // its wall on the baseline it exists to beat
    val exactN = math.min(nMerges, 200)
    val t0 = System.nanoTime()
    val exact = BpeSpark.trainMerges(docs, "text", exactN)
    val exactS = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val (batched, rounds) =
      BpeSpark.trainMergesBatched(docs, "text", nMerges, batch)
    val batchedS = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val (skipped, skipRounds) = BpeSpark.trainMergesBatched(docs, "text",
      nMerges, batch, skipConflicts = true)
    val skippedS = (System.nanoTime() - t2) / 1e9
    val exactSet = exact.map { case (_, a, b, _) => (a, b) }.toSet
    def overlap(m: Vector[(Int, String, String, Long)]): Int =
      m.map { case (_, a, b, _) => (a, b) }.toSet.intersect(exactSet).size
    // scalastyle:off println
    // guard the per-merge division: a corpus with no mergeable pairs
    // trains zero merges and would print NaN/Infinity (round-5 advice)
    val capNote = if (exactN < nMerges && exact.nonEmpty)
      f" (capped at $exactN of $nMerges; extrapolated " +
        f"${exactS / exact.length * nMerges}%.0f s)"
    else ""
    println(f"[bpe] exact     merges=${exact.length} " +
      f"rounds=${exact.length} wall=$exactS%.2f s$capNote")
    // same zero-merge guard as capNote: a corpus with no mergeable
    // pairs runs 0 rounds and 0/0 would print NaN
    def rate(m: Int, r: Int): Double = if (r == 0) 0.0 else m.toDouble / r
    println(f"[bpe] prefix    merges=${batched.length} rounds=$rounds " +
      f"wall=$batchedS%.2f s (batch=$batch, " +
      f"${rate(batched.length, rounds)}%.1f merges/round, " +
      f"merge-set overlap with exact ${overlap(batched)}/${exact.length})")
    println(f"[bpe] skip      merges=${skipped.length} rounds=$skipRounds " +
      f"wall=$skippedS%.2f s (batch=$batch, " +
      f"${rate(skipped.length, skipRounds)}%.1f merges/round, " +
      f"merge-set overlap with exact ${overlap(skipped)}/${exact.length})")
    // optional 4th arg: checkpoint cadence — measures what the parquet
    // durability of the prefix leg costs, and asserts it changes
    // NOTHING about the learned table
    if (args.length > 3 && args(3).toInt > 0) {
      val every = args(3).toInt
      val dir = java.nio.file.Files
        .createTempDirectory("bpe-bench-ckpt").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        graft.core.Fs.deleteRecursively(new java.io.File(dir))))
      val t3 = System.nanoTime()
      val (ck, ckRounds) = BpeSpark.trainMergesBatched(docs, "text",
        nMerges, batch, skipConflicts = false,
        checkpointEvery = every, checkpointDir = dir)
      val ckS = (System.nanoTime() - t3) / 1e9
      require(ck == batched,
        "checkpointing changed the learned merge table")
      println(f"[bpe] prefix+ck merges=${ck.length} rounds=$ckRounds " +
        f"wall=$ckS%.2f s (checkpoint every $every rounds; table " +
        f"identical to prefix leg, overhead ${ckS - batchedS}%.2f s)")
    }
    // scalastyle:on println
    spark.stop()
  }
}
