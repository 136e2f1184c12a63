package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: print Catalyst size estimates + adaptiveParts decisions for
  * the graph inputs the iterative operators cache — calibrates the
  * bytes-per-partition target in Partitioning.adaptiveParts.
  * Usage: runMain graft.bench.StatsProbe [sfDir] [nSynth]
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nSynth = if (args.length > 1) args(1).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def report(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val parts = graft.operators.Partitioning.adaptiveParts(spark, df)
      // scalastyle:off println
      println(f"[stats] $name%-28s est=$est%,15d B  parts=$parts")
      // scalastyle:on println
    }

    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").cast("long").as("k"))
    val tri = graft.queries.Round7Queries.triEdges(c)
    val und = tri.selectExpr("CAST(src AS BIGINT) AS a",
        "CAST(dst AS BIGINT) AS b")
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v")).distinct()
    val sym = und.select(col("u").as("w"), col("v").as("n"))
      .unionByName(und.select(col("v").as("w"), col("u").as("n")))
    report("sf tri sym-adjacency", sym)
    report("sf pr edges", graft.queries.Round7Queries.prEdges(c))

    val r = spark.range(nSynth)
    val synth = r.where("id % 500 != 499")
      .selectExpr("id AS src", "id + 1 AS dst")
      .union(r.where("id % 500 < 498").selectExpr("id AS src", "id + 2 AS dst"))
      .union(r.where("id % 500 != 0")
        .selectExpr("id AS src", "(id div 500) * 500 AS dst"))
    val work = java.nio.file.Files.createTempDirectory("statsprobe")
    synth.write.parquet(s"$work/edges")
    val pq = spark.read.parquet(s"$work/edges")
    val und2 = pq.selectExpr("CAST(src AS BIGINT) AS a",
        "CAST(dst AS BIGINT) AS b")
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v")).distinct()
    val sym2 = und2.select(col("u").as("w"), col("v").as("n"))
      .unionByName(und2.select(col("v").as("w"), col("u").as("n")))
    report(s"synth($nSynth) sym-adjacency", sym2)
    graft.core.Fs.deleteRecursively(work.toFile)
    spark.stop()
  }
}
