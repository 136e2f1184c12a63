package graft.bench

import java.nio.file.{Files, Paths}

import graft.operators.Graphs
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale evidence for the graph-analytics family (q110–q113), on synth
  * graphs big enough that the asymptotics show up in the wall clock:
  *
  *   1. PageRank (5 fixed-point iterations) at N and 4N cores on the
  *      SAME on-disk edge list — the north-rule two-cluster-size
  *      protocol applied to the graph family (PipelineBench covers the
  *      KG build; this covers the iterate-over-the-KG side).
  *   2. Triangle counting A/B: degree-ordered orientation vs naive
  *      id-ordered orientation on a graph whose block leaders sit at
  *      the LOW id of every dense block and whose mega-hub has degree
  *      n/149 — exactly the shape where id-ordering explodes (each
  *      leader fans out C(deg, 2) wedges from one task) and degree
  *      ordering provably cannot. Same triangle totals required.
  *   3. Label propagation (4 iterations) wall on the same graph.
  *
  * Usage: runMain graft.bench.GraphBench [nPr] [nTri] [outJson] [nCores]
  * Defaults: 2,000,000-node digraph (~4M edges) for PageRank;
  * 200,000-node undirected graph for triangles/LPA; N=8 cores.
  */
object GraphBench {

  def main(args: Array[String]): Unit = {
    val nPr = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nTri = if (args.length > 1) args(1).toLong else 200000L
    val outJson = if (args.length > 2) args(2) else "BENCH/graph.json"
    val nCores = if (args.length > 3) args(3).toInt else 8

    val work = Files.createTempDirectory("graft-graphbench").toString
    // generated edge lists are per-run scratch — remove on exit (the
    // PipelineBench disk-fill lesson)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.core.Fs.deleteRecursively(new java.io.File(work))))

    // ---- one-time input materialization (not timed) ----
    locally {
      val spark = session(32)
      if (nPr > 0) prEdgesSynth(spark, nPr).write.parquet(s"$work/pr_edges")
      triEdgesSynth(spark, nTri).write.parquet(s"$work/tri_edges")
      spark.stop()
    }
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // ---- PageRank at N and 4N cores (nPr = 0 skips the section —
    // the undirected-graph legs can then run standalone) ----
    val pr = if (nPr == 0) Seq.empty else Seq(nCores, 4 * nCores).map {
      cpus =>
      val spark = session(cpus)
      val edges = spark.read.parquet(s"$work/pr_edges")
      val nEdges = edges.count()
      // warm-up primes JIT/codegen; startup excluded per BASELINE.md
      Graphs.pageRank(spark,
        spark.range(1000).selectExpr("id AS src", "id + 1 AS dst"),
        iters = 2).count()
      val wall = (1 to 2).map { trial =>
        quiesce()
        val t0 = System.nanoTime()
        val rows = Graphs.pageRank(spark, edges, iters = 5).count()
        val w = (System.nanoTime() - t0) / 1e9
        // scalastyle:off println
        println(f"[pr] cpus=$cpus trial=$trial wall=$w%.2f s rows=$rows")
        // scalastyle:on println
        w
      }.min
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      (cpus, nEdges, wall, 5.0 * nEdges / wall) // edge-traversals/sec
    }
    val prJson = pr match {
      case Seq((c1, ne, wall1, thr1), (c4, _, wall4, thr4)) =>
        val prEff = (thr4 / thr1) / 4.0
        s""""pr_nodes":$nPr,"pr_edges":$ne,""" +
          s""""pagerank":{"local$c1":{"wall_s":$wall1},""" +
          s""""local$c4":{"wall_s":$wall4},""" +
          s""""edge_traversals_per_sec_local$c4":$thr4,""" +
          s""""scaling_efficiency":$prEff},"""
      case _ => ""
    }

    // ---- triangles A/B + LPA at 4N cores ----
    val spark = session(4 * nCores)
    val tedges = spark.read.parquet(s"$work/tri_edges")
    val nTriEdges = tedges.count()
    def triTotal(df: DataFrame): Long =
      df.agg(org.apache.spark.sql.functions.sum("tri")).head.getLong(0) / 3
    // warm-up
    Graphs.triangleStats(spark,
      spark.range(100).selectExpr("id AS src", "id + 1 AS dst")).count()
    // min-of-trials wall + the last trial's row count for one leg
    def leg(name: String, trials: Int = 2)(body: => Long): (Double, Long) = {
      var rows = -1L
      val wall = (1 to trials).map { trial =>
        quiesce()
        val t0 = System.nanoTime()
        rows = body
        val w = (System.nanoTime() - t0) / 1e9
        // scalastyle:off println
        println(f"[$name] trial=$trial wall=$w%.2f s rows=$rows")
        // scalastyle:on println
        w
      }.min
      (wall, rows)
    }
    val (wallDeg, triCount) = leg("tri-deg") {
      triTotal(Graphs.triangleStats(spark, tedges))
    }
    // one trial is enough for the naive leg — the point is its order of
    // magnitude, and it is expensive by construction
    val (wallId, _) = leg("tri-id", trials = 1) {
      val c = triTotal(Graphs.triangleStats(spark, tedges,
        orientByDegree = false))
      require(c == triCount,
        s"orientation changed the triangle total: $c vs $triCount")
      c
    }
    val (wallLpa, _) = leg("lpa") {
      Graphs.labelPropagation(spark, tedges, iters = 4).count()
    }
    // link prediction under the pivot cap: leaders (deg ~501) and the
    // mega-hub (deg n/149) are excluded, chain pivots (deg ≤ 9) kept —
    // still ~30 candidate pairs per node, so this measures the real
    // dense-local-structure workload. (No uncapped leg: the uncapped
    // blowup is the SAME C(deg, 2) term the triangle A/B measures.)
    val (wallLp, lpRows) = leg("linkpredict") {
      Graphs.linkPredict(spark, tedges, maxPivotDegree = 10L,
        minCommon = 2L).count()
    }
    // k-core peel: 8 synchronous rounds over the full edge set
    val (wallCore, coreRows) = leg("kcore") {
      Graphs.kCore(spark, tedges, k = 5L, rounds = 8).count()
    }
    // random walks: one 8-step walk from every 7th node — frontier is
    // walk-sized per step, candidates fan out frontier × degree and
    // collapse in the map-side argmin combine
    val (wallWalks, walkRows) = leg("walks") {
      val starts = spark.range(nTri).where("id % 7 = 0")
        .selectExpr("id AS node")
      Graphs.randomWalks(spark, tedges, starts, length = 8).count()
    }
    // multi-source BFS from the 500-block leaders, depth 6 — the
    // frontier-delta shape at a reached-set of ~all nodes
    val (wallBfs, bfsRows) = leg("bfs") {
      val seeds = spark.range(nTri).where("id % 500 = 0")
        .selectExpr("id AS node")
      Graphs.nearestSeeds(spark, tedges, seeds, maxDepth = 6).count()
    }
    // weighted walks on the same multigraph (leader edges duplicate the
    // chain edges at block starts → real weight-2 edges): measures the
    // copy-explode overhead vs the unweighted leg
    val (wallWw, wwRows) = leg("wwalks") {
      val starts = spark.range(nTri).where("id % 7 = 0")
        .selectExpr("id AS node")
      Graphs.weightedRandomWalks(spark, tedges, starts, length = 8)
        .count()
    }
    spark.stop()

    val json =
      s"""{"metric":"graph_bench",""" + prJson +
        s""""tri_nodes":$nTri,"tri_edges":$nTriEdges,""" +
        s""""triangles":{"total":$triCount,""" +
        s""""degree_ordered_wall_s":$wallDeg,""" +
        s""""id_ordered_wall_s":$wallId,""" +
        s""""speedup":${wallId / wallDeg}},""" +
        s""""lpa":{"iters":4,"wall_s":$wallLpa},""" +
        s""""linkpredict":{"cap":10,"pairs":$lpRows,"wall_s":$wallLp},""" +
        s""""kcore":{"k":5,"rounds":8,"survivors":$coreRows,""" +
        s""""wall_s":$wallCore},""" +
        s""""walks":{"length":8,"walks":$walkRows,"wall_s":$wallWalks},""" +
        s""""bfs":{"depth":6,"reached":$bfsRows,"wall_s":$wallBfs},""" +
        s""""wwalks":{"length":8,"walks":$wwRows,"wall_s":$wallWw}}"""
    // scalastyle:off println
    println(json)
    // scalastyle:on println
    Option(Paths.get(outJson).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(outJson), json + "\n")
  }

  /** Web-ish digraph: 1000-blocks chained internally, every member
    * linking its block leader (in-degree ~999), plus a global mega-hub
    * every 149th node → node 500 (in-degree n/149). */
  private def prEdgesSynth(spark: SparkSession, n: Long): DataFrame = {
    val r = spark.range(n)
    r.where("id % 1000 != 999").selectExpr("id AS src", "id + 1 AS dst")
      .union(r.where("id % 1000 != 0")
        .selectExpr("id AS src", "(id div 1000) * 1000 AS dst"))
      .union(r.where("id % 149 = 0 AND id != 500")
        .selectExpr("id AS src", "CAST(500 AS BIGINT) AS dst"))
  }

  /** Triangle-rich undirected graph engineered for the A/B: 500-blocks
    * with k—k+1 and k—k+2 chains (triangles everywhere), every member
    * linked to its block LEADER — who sits at the block's LOWEST id, so
    * id-ordered orientation fans each leader out into C(~500, 2) wedges
    * from a single task — plus a degree-n/149 mega-hub at id 250. */
  private def triEdgesSynth(spark: SparkSession, n: Long): DataFrame = {
    val r = spark.range(n)
    r.where("id % 500 != 499").selectExpr("id AS src", "id + 1 AS dst")
      .union(r.where("id % 500 < 498")
        .selectExpr("id AS src", "id + 2 AS dst"))
      .union(r.where("id % 500 != 0")
        .selectExpr("id AS src", "(id div 500) * 500 AS dst"))
      .union(r.where("id % 149 = 0 AND id != 250")
        .selectExpr("id AS src", "CAST(250 AS BIGINT) AS dst"))
  }

  private def quiesce(): Unit = {
    try {
      new ProcessBuilder("sync").start().waitFor()
      Thread.sleep(2000)
    } catch { case _: Exception => }
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-graphbench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
