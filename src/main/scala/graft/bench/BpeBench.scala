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
  * Usage: runMain graft.bench.BpeBench [sfDir] [nMerges] [batch]
  * Prints one line per trainer: merges, rounds, wall seconds.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = if (args.length > 1) args(1).toInt else 60
    val batch = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm-up: parquet footer + codegen caches, excluded from the clock
    BpeSpark.trainMerges(docs, "text", 2)

    val t0 = System.nanoTime()
    val exact = BpeSpark.trainMerges(docs, "text", nMerges)
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
    println(f"[bpe] exact     merges=${exact.length} " +
      f"rounds=${exact.length} wall=$exactS%.2f s")
    println(f"[bpe] prefix    merges=${batched.length} rounds=$rounds " +
      f"wall=$batchedS%.2f s (batch=$batch, " +
      f"${exact.length.toDouble / rounds}%.1fx fewer rounds, " +
      f"merge-set overlap with exact ${overlap(batched)}/${exact.length})")
    println(f"[bpe] skip      merges=${skipped.length} rounds=$skipRounds " +
      f"wall=$skippedS%.2f s (batch=$batch, " +
      f"${exact.length.toDouble / skipRounds}%.1fx fewer rounds, " +
      f"merge-set overlap with exact ${overlap(skipped)}/${exact.length})")
    // scalastyle:on println
    spark.stop()
  }
}
