package graft.bench

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev probe: time a SUBSET of SparkEntry.queries bench-style (noop write,
  * same session config as graft.Bench) in a fresh session — isolates
  * whether a slow bench entry is slow intrinsically or only inside the
  * full 91-query session (accumulated shuffle files, GC pressure).
  *
  * Usage: runMain graft.bench.BenchSubset <sfDir> <name-substring>...
  * Each query runs twice (cold + warm within the session).
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pats = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pats.exists(n.contains))
    for (name <- names; trial <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val w = (System.nanoTime() - t0) / 1e9
      // scalastyle:off println
      println(f"[subset] $name%-28s trial=$trial wall=$w%.2f s")
      // scalastyle:on println
    }
    spark.stop()
  }
}
