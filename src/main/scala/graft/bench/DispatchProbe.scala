package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev probe: raw per-job and per-shuffle dispatch latency at the bench's
  * parallelism — calibrates how much of a fixpoint query's wall clock is
  * irreducible scheduler/stage overhead on THIS box (the denominator for
  * judging per-round costs of q63/q88/q110/q115-style driver loops).
  * Usage: runMain graft.bench.DispatchProbe [nJobs]
  */
object DispatchProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // warm-up
    spark.range(1000000).toDF("x").groupBy(($"x" % 97).as("k")).count()
      .write.format("noop").mode("overwrite").save()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e6 / n
      // scalastyle:off println
      println(f"[dispatch] $label%-28s avg=$dt%8.1f ms over $n")
      // scalastyle:on println
    }
    timed("narrow-count")(spark.range(100000).count())
    timed("one-shuffle-noop")(
      spark.range(100000).toDF("x").groupBy(($"x" % 97).as("k")).count()
        .write.format("noop").mode("overwrite").save())
    timed("two-shuffle-noop")(
      spark.range(100000).toDF("x").groupBy(($"x" % 97).as("k")).count()
        .groupBy(($"k" % 7).as("j")).count()
        .write.format("noop").mode("overwrite").save())
    timed("local-checkpoint")(
      spark.range(100000).toDF("x").localCheckpoint(true))
    spark.stop()
  }
}
