package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components as an iterative DataFrame fixpoint
  * (SURVEY.md §2.f; north_rule: "GraphFrames or iterative DataFrame
  * self-join with salted keys" — no GraphFrames jar in the sandbox and
  * GraphX is RDD-based, so DataFrame self-join it is).
  *
  * Algorithm: min-label propagation with POINTER JUMPING — each round
  *   1. comp'(u) = min(comp(u), min over neighbors v of comp(v))
  *   2. comp''(u) = comp(comp'(u))       // halves pointer chains → O(log n)
  * until no label changes. Labels are node ids; the fixpoint label is the
  * component's minimum node id (exactly the UnionFind oracle's output).
  *
  * Scale notes (the parts that matter at 10^12 edges):
  *   - edges are symmetrized once up front and REPARTITIONED BY src so every
  *     iteration's join/groupBy reuses one hash partitioning (no re-shuffle
  *     of the big side beyond the label updates).
  *   - a reliable checkpoint every iteration cuts the lineage that would
  *     otherwise grow linearly with rounds and re-execute from the scan,
  *     and makes a multi-hour fixpoint restartable from the last round.
  *   - hub skew: the neighbor-min uses groupBy(min), which does map-side
  *     partial aggregation — a degree-10^4 hub collapses to one row per
  *     input partition before the shuffle, so no salting is needed on the
  *     aggregate. The label join is on the (unique-key) labels side, with
  *     AQE skew-join splitting enabled for the residual edge-side skew.
  */
object ConnectedComponents {

  /** @param edges DataFrame with long columns `src`, `dst`
    * @return DataFrame (node LONG, comp LONG), comp = min id in component */
  def run(spark: SparkSession, edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val parts = spark.sessionState.conf.numShufflePartitions
    // reliable (directory) checkpoints: truncate lineage each round AND are
    // re-read deterministically. (localCheckpoint showed a local-mode
    // re-read race dropping rows — see ConnectedComponentsSpec history; on
    // a cluster you want reliable checkpoints here anyway for fault
    // tolerance of a long fixpoint.)
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)

    val raw = edges.selectExpr("CAST(src AS BIGINT) AS u",
      "CAST(dst AS BIGINT) AS v")
    // every endpoint is a node (self-loops contribute a node, no edge)
    var labels = raw.select(col("u").as("node"))
      .unionByName(raw.select(col("v").as("node")))
      .distinct()
      .withColumn("comp", col("node"))
      .repartition(parts, col("node"))
      .checkpoint()
    // symmetrize; self-loops dropped from both directions
    val e = raw.unionByName(raw.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
      .repartition(parts, col("u"))
      .checkpoint()

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // 1. neighbor-min: comp of v flows to u (map-side combine on groupBy)
      val nbrMin = e.join(labels.withColumnRenamed("node", "v"), Seq("v"))
        .groupBy(col("u").as("node"))
        .agg(min(col("comp")).as("nbrComp"))
      val step1 = labels.join(nbrMin, Seq("node"), "left_outer")
        .select(col("node"), col("comp").as("oldComp"),
          least(col("comp"), coalesce(col("nbrComp"), col("comp"))).as("comp1"))
      // 2. pointer jump: comp2(u) = comp(comp1(u))
      val jump = labels.select(col("node").as("comp1"),
        col("comp").as("jumped"))
      val step2 = step1.join(jump, Seq("comp1"), "left_outer")
        .select(col("node"), col("oldComp"),
          least(col("comp1"), coalesce(col("jumped"), col("comp1"))).as("comp"))
      val next = step2
        .repartition(parts, col("node"))
        .checkpoint()
      changed = next.where(col("comp") =!= col("oldComp")).count()
      labels = next.select("node", "comp")
      iter += 1
    }
    labels
  }
}
