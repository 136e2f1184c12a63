package graft.operators

object CcDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestBase.session
    import spark.implicits._
    // mimic the suite: big CC first
    val big = graft.pipeline.FixtureSpark.ccEdges(spark, 10, 40, 500)
    ConnectedComponents.run(spark, big).count()
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 1L), (5L, 5L))
      .toDF("src", "dst")
    Seq(1, 7).foreach { p =>
      val in = edges.repartition(p)
      val sym = in.selectExpr("CAST(src AS BIGINT) AS u", "CAST(dst AS BIGINT) AS v")
      val nodes = sym.select("u").unionByName(sym.select($"v".as("u")))
        .distinct().collect().map(_.getLong(0)).sorted
      println(s"parts=$p nodes=" + nodes.mkString(","))
      val r = ConnectedComponents.run(spark, in)
      println(s"parts=$p -> " + r.collect().map(x =>
        (x.getLong(0), x.getLong(1))).sortBy(_._1).mkString(", "))
    }
    spark.stop()
  }
}
