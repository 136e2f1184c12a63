package graft.bench

import graft.operators.{CorpusOps, Sketches}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: Space-Saving heavy hitters in the EVICTION regime — the
  * key space (word bigrams of a synthetic Zipf corpus over a 50k-word
  * lexicon) exceeds the sketch capacity, which is exactly the regime the
  * operator exists for: the exact groupBy twin must shuffle the whole
  * corpus-sized key space, while the sketch ships one capacity-bounded
  * summary per partition and tree-reduces. Reports wall time of both
  * legs, the realized bigram vocabulary, and — against the exact
  * counts — verification that every reported item honors
  * est − err ≤ true ≤ est plus the top-k recall of the sketch.
  *
  * Usage: runMain graft.bench.SketchBench [nDocs] [capacity] [k]
  */
object SketchBench {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 200000L
    val capacity = if (args.length > 1) args(1).toInt else 4096
    val k = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = BpeBench.synthDocs(spark, nDocs)
      .localCheckpoint(true) // generation cost out of both legs
    val grams = CorpusOps.rawShingles(col("text"), 2)

    val t0 = System.nanoTime()
    val sketch = Sketches
      .heavyHittersOf(docs, grams, capacity, k, "gram")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sketchS = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val exact = docs.select(explode(grams).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("g").asc).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exactS = (System.nanoTime() - t1) / 1e9

    // bound verification joins the TINY sketch (≤ capacity rows)
    // against the distributed exact counts — the full bigram vocabulary
    // never reaches the driver, in a probe whose whole point is that it
    // doesn't fit there comfortably
    import spark.implicits._
    // persisted: consumed by TWO actions below (stats + bounds join) —
    // without it each would re-run the corpus-sized aggregation
    val counts = docs.select(explode(grams).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .persist()
    val stats = counts.agg(sum(col("cnt")).as("n"),
      count(lit(1)).as("vocab")).collect()(0)
    val (n, vocabSize) = (stats.getLong(0), stats.getLong(1))
    val sketchDf = sketch.toSeq.toDF("gram", "est", "err")
    val violations = counts
      .join(broadcast(sketchDf), col("g") === col("gram"))
      .where(col("est") < col("cnt") ||
        col("est") - col("err") > col("cnt"))
      .collect()
    counts.unpersist(blocking = false)
    val recall = exact.map(_._1).count(sketch.map(_._1).toSet) // top-k hit
    // scalastyle:off println
    println(f"[sketch] docs=$nDocs bigramVocab=$vocabSize n=$n " +
      f"capacity=$capacity k=$k")
    println(f"[sketch] space-saving wall=$sketchS%.2f s " +
      f"exact-groupBy wall=$exactS%.2f s")
    println(f"[sketch] bound violations=${violations.length} " +
      f"(must be 0), top-$k recall=$recall/$k, " +
      f"maxErr=${sketch.map(_._3).max} N/cap=${n / capacity}")
    // scalastyle:on println
    spark.stop()
    if (violations.nonEmpty) sys.exit(1)
  }
}
