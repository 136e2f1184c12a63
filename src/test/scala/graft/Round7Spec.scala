package graft

import graft.core.Rng
import graft.functions.Int8DotProduct
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Round-7 evidence: the q108 int8 path's production claims, measured
  * instead of asserted (VERDICT r6 residuals 1a/1b).
  */
class Round7Spec extends SparkTestBase {

  // ---------------- Int8DotProduct (the codegen'd BINARY kernel) -------

  test("Int8DotProduct: codegen and interpreted agree, incl. sign range") {
    import spark.implicits._
    val rows = Seq(
      (Array[Byte](127, -127, 3), Array[Byte](127, 127, -2)),
      (Array[Byte](), Array[Byte]()),
      (Array[Byte](-128, -128), Array[Byte](-128, -128)))
    val viaCodegen = rows.toDF("a", "b")
      .select(Int8DotProduct(col("a"), col("b"))).collect().map(_.get(0))
    val viaEval = rows.map { case (a, b) =>
      import org.apache.spark.sql.graft.Bridge
      Int8DotProduct(Bridge.expression(lit(a)), Bridge.expression(lit(b)))
        .nullSafeEval(a, b)
    }
    assert(viaCodegen.toSeq == viaEval)
    assert(viaCodegen(0) == 127L * 127 - 127L * 127 - 6L)
    assert(viaCodegen(1) == 0L)
    assert(viaCodegen(2) == 2L * 128 * 128)
  }

  test("Int8DotProduct: null on length mismatch and null input") {
    import spark.implicits._
    val got = Seq(
      (Array[Byte](1, 2), Array[Byte](1, 2, 3)),
      (null.asInstanceOf[Array[Byte]], Array[Byte](1)))
      .toDF("a", "b")
      .select(Int8DotProduct(col("a"), col("b"))).collect()
    assert(got.forall(_.isNullAt(0)),
      "length mismatch / null input must score null, not a partial dot")
    val bad = intercept[Exception] {
      Seq((1L, Array[Byte](1))).toDF("a", "b")
        .select(Int8DotProduct(col("a"), col("b"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("binary"))
  }

  test("quantizeCodes materializes BINARY — 1 byte/component on the wire") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val codes = graft.operators.Similarity
      .quantizeCodes(emb, "vec_id", "embedding", "id", "code")
    assert(codes.schema("code").dataType == BinaryType)
    val row = codes.limit(1).collect()(0)
    assert(row.getAs[Array[Byte]]("code").length == 64,
      "64-dim vector must quantize to exactly 64 bytes")
  }

  // ---------------- recall where quantization can actually lose -------

  /** Synth near-tie corpus: 12 "close" candidates whose exact cosines to
    * the query differ by ~1e-4 — far below int8 quantization resolution
    * (error bound: |dot_q − 127²·cos| ≤ 2·(127·0.5·√d) + d/4 = 1032 at
    * d=64, i.e. ±0.064 in cosine units, while the close cluster spans
    * ~0.002) — plus 30 "far" candidates at cosine ≤ 0.55, OUTSIDE that
    * error bound's reach of the cluster (gap ≈ 0.44 ≫ 2×0.064). So the
    * quantized ranking MUST stay inside the close cluster (the bound)
    * but is free to permute within it (the approximation). */
  private lazy val nearTie: (Seq[(Long, Array[Float])], Array[Float]) = {
    val dim = 64
    val rng = new Rng(0x7077AB1EL)
    def raw(): Array[Double] = Array.fill(dim)(rng.nextDouble() * 2 - 1)
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    def orthoUnit(u: Array[Double]): Array[Double] = {
      val r = raw()
      val proj = r.zip(u).map { case (a, b) => a * b }.sum
      normalize(r.zip(u).map { case (a, b) => a - proj * b })
    }
    def rotate(u: Array[Double], w: Array[Double], theta: Double) =
      u.zip(w).map { case (a, b) =>
        (a * math.cos(theta) + b * math.sin(theta)).toFloat
      }
    val u = normalize(raw())
    val close = (0 until 12).map { j =>
      // exact cosine = cos(θ_j): strictly decreasing in j, consecutive
      // gaps ≈ sin(0.05)·0.002 ≈ 1e-4
      (j.toLong, rotate(u, orthoUnit(u), 0.05 + j * 0.002))
    }
    val far = (0 until 30).map { j =>
      // cosines spread over [cos(1.25), cos(1.0)] ≈ [0.32, 0.54]
      (100L + j, rotate(u, orthoUnit(u), 1.0 + j * 0.008))
    }
    (close ++ far, u.map(_.toFloat))
  }

  test("q108 on near-ties: quantization observably approximates, inside " +
      "its error bound") {
    import spark.implicits._
    val (cands, qvec) = nearTie
    val vectors = cands.toDF("vec_id", "embedding")
    val queries = Seq((999L, qvec)).toDF("vec_id", "embedding")
    def top5(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rk").collect().map(_.getLong(2)).toSeq
    val exact = top5(graft.operators.Similarity.bruteForceTopK(
      vectors, queries, "vec_id", "embedding", k = 5))
    val quant = top5(graft.operators.Similarity.quantizedTopK(
      vectors, queries, "vec_id", "embedding", k = 5))
    // exact ranking resolves the 1e-4 gaps: ids 0..4 in order
    assert(exact == Seq(0L, 1L, 2L, 3L, 4L))
    // the bound: quantized top-5 never reaches across the 0.44 cosine
    // gap to a far candidate (error ≤ 0.064 per scored pair)
    assert(quant.forall(_ < 12L),
      s"quantized top-5 $quant escaped the close cluster — the ±1032 " +
        "integer-dot error bound is violated")
    // the approximation: with cluster gaps below quantization
    // resolution, the int8 ranking must NOT reproduce the exact top-5
    // verbatim — if it does, this corpus no longer exercises the lossy
    // regime and the recall pin below is vacuous again (VERDICT r6 1b)
    assert(quant.toSet != exact.toSet || quant != exact,
      "quantized ranking identical to exact — near-tie corpus is not " +
        "in the lossy regime")
    val recall = (quant.toSet intersect exact.toSet).size / 5.0
    info(s"near-tie recall@5 = $recall (quant=$quant exact=$exact)")
    // measured 0.6 on this corpus (quant keeps 0,2,3; swaps 1,4 for
    // near-tie neighbors 9,5 — the approximation approximating). The
    // HARD guarantees are the two asserts above (bound + lossy regime);
    // recall itself is floored loosely at 0.4 because within-cluster
    // order under sub-resolution gaps is legitimately permutation-like
    // (random 5-of-12 would sit at 5/12 ≈ 0.42 in expectation) and
    // math.cos in the corpus builder is only 1-ulp-specified across
    // JDKs — a tight floor would pin platform luck, not the kernel
    assert(recall >= 0.4, s"recall@5 $recall below floor on $quant")
  }

  // ---------------- resumable CC fixpoint (north-rule resume) ---------

  private def chainEdges(n: Int) = {
    import spark.implicits._
    (1 until n).map(i => (i.toLong, i + 1L)).toDF("src", "dst")
  }

  test("small-graph fast path: UnionFind labels bit-identical to the " +
      "distributed fixpoint, incl. self-loop-only nodes") {
    import spark.implicits._
    // two chains, a triangle, a self-loop-only node, duplicate +
    // reversed edges (exercises the distinct/symmetrize front end)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (10L, 11L), (11L, 12L),
      (12L, 10L), (20L, 20L), (1L, 2L)).toDF("src", "dst")
    val small = graft.operators.ConnectedComponents
      .runManaged(spark, edges, smallGraphThreshold = 1000L)
    assert(small.rounds == 0, "threshold 1000 must take the driver path")
    val dist = graft.operators.ConnectedComponents
      .runManaged(spark, edges)
    assert(dist.rounds > 0, "threshold 0 must take the distributed path")
    def m(h: graft.operators.ConnectedComponents.CcHandle) =
      h.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val (sm, dm) = (m(small), m(dist))
    small.close(); dist.close()
    assert(sm == dm)
    assert(sm == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("resumableRun: fresh run matches runManaged; close deletes the dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ccr").toString
    val edges = chainEdges(12)
    val h = graft.operators.ConnectedComponents
      .resumableRun(spark, edges, dir)
    val got = h.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = {
      val m = graft.operators.ConnectedComponents.runManaged(spark, edges)
      val w = m.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      m.close(); w
    }
    assert(got == want)
    assert(got == (1 to 12).map(i => i.toLong -> 1L).toMap)
    h.close()
    assert(!new java.io.File(dir).exists(),
      "close() must delete the consumed checkpoint dir")
  }

  // ---------------- graph analytics (q110 / q111) ---------------------

  /** Independent driver-side replay of the fixed-point PageRank — same
    * integer semantics, totally different execution (a sequential loop
    * over Scala Maps), so agreement checks the distributed plan, not a
    * shared implementation. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L,
      seeds: Option[Set[Long]] = None): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val inSeed: Long => Boolean =
      seeds match {
        case None => _ => true
        case Some(s) => v => s.contains(v)   // seed ∩ nodes via the map
      }
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val init = scale / nodes.count(inSeed)
    val base = 15L * init / 100L
    var rank = nodes.map(v => v -> (if (inSeed(v)) init else 0L)).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((s, d) <- e) inflow(d) += rank(s) / outdeg(s)
      rank = nodes.map(v => v ->
        ((if (inSeed(v)) base else 0L) + 85L * inflow(v) / 100L)).toMap
    }
    rank
  }

  test("pageRank: bit-identical to the sequential integer replay; " +
      "dangling mass leaks; edge-order/duplicate invariant") {
    import spark.implicits._
    val scale = 1000000000000L
    // ring 1→2→3→1 with chord 1→3, feeder 4→1, dangling sink 3→5
    // (5 has no out-edges: its inflow leaks), hub 6,7,8 → 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L),
      (3L, 5L), (6L, 2L), (7L, 2L), (8L, 2L))
    val got = graft.operators.Graphs
      .pageRank(spark, edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = refPageRank(edges, iters = 4)
    assert(got == want)
    // dangling leak: node 5 absorbs mass and redistributes none, so
    // total mass strictly drops below the initial `scale`
    assert(got.values.sum < scale,
      s"dangling node must leak mass: total ${got.values.sum}")
    assert(got.values.forall(_ > 0))
    // determinism under presentation: reversed order + duplicated edges
    // must produce the SAME bit-exact ranks (distinct + integer sums)
    val got2 = graft.operators.Graphs
      .pageRank(spark, (edges.reverse ++ edges).toDF("src", "dst"),
        iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got2 == got)
  }

  test("personalizedPageRank: seed-confined restart matches the replay; " +
      "out-of-graph seeds ignored; unreachable non-seeds rank 0") {
    import spark.implicits._
    // component A: seed 1 → 2 → 3 (3 dangling); component B: 10 → 11,
    // 11 → 10 (a 2-cycle NO seed can reach — its ranks must be 0)
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 10L))
    def run(seedIds: Seq[Long]): Map[Long, Long] =
      graft.operators.Graphs.personalizedPageRank(spark,
          edges.toDF("src", "dst"), seedIds.toDF("node"), iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = run(Seq(1L))
    assert(got == refPageRank(edges, iters = 3, seeds = Some(Set(1L))))
    assert(got(10L) == 0L && got(11L) == 0L,
      s"unreachable component must hold zero mass: $got")
    assert(got(2L) > 0L && got(3L) > 0L)
    // an out-of-graph seed (and a duplicate) must change NOTHING: m
    // counts seeds ∩ nodes only
    assert(run(Seq(1L, 1L, 999L)) == got)
    // two seeds: m = 2 halves init/base — a genuinely different
    // fixpoint, confirming the seed flag reaches the arithmetic
    val two = run(Seq(1L, 10L))
    assert(two == refPageRank(edges, iters = 3, seeds = Some(Set(1L, 10L))))
    assert(two(10L) > 0L)
  }

  /** Sequential peel replay for kCore: same bounded-round semantics,
    * driver-side sets. */
  private def refKCore(edges: Seq[(Long, Long)], k: Long,
      rounds: Int): Map[Long, Long] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct.toSet
    for (_ <- 1 to rounds) {
      val deg = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((a, b) <- e) { deg(a) += 1; deg(b) += 1 }
      e = e.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
    }
    val deg = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((a, b) <- e) { deg(a) += 1; deg(b) += 1 }
    deg.toMap
  }

  test("kCore: cascade peels a path inward one layer per round; the " +
      "clique survives; mid-cascade rounds match the replay exactly") {
    import spark.implicits._
    // path 1—2—3—4—5—6, K5 clique on {10..14}, pendant 14—20
    val clique = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (14L, 20L)) ++ clique
    def run(rounds: Int): Map[Long, Long] =
      graft.operators.Graphs.kCore(spark, edges.toDF("src", "dst"),
          k = 2L, rounds = rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // round 1: path ends (1, 6) and the pendant leaf peel; the path
    // interior survives WITH ITS REDUCED DEGREES — the mid-cascade
    // state is well-defined and replayable
    val r1 = run(1)
    assert(r1 == refKCore(edges, k = 2L, rounds = 1))
    assert(Seq(2L, 3L, 4L, 5L).forall(r1.contains) && !r1.contains(1L) &&
      !r1.contains(6L) && !r1.contains(20L))
    // by round 3 the whole path has cascaded away; rounds 3 and 5 agree
    // (extra rounds past the fixpoint are no-ops)
    val r3 = run(3)
    assert(r3 == refKCore(edges, k = 2L, rounds = 3))
    assert(r3 == run(5))
    assert(r3 == (10L to 14L).map(_ -> 4L).toMap,
      s"only the clique survives, at full internal degree: $r3")
  }

  /** Brute-force link-prediction replay: pivot loop over an adjacency
    * map, integer RA accumulation, explicit edge/cap/minCommon rules. */
  private def refLinkPredict(edges: Seq[(Long, Long)], cap: Long,
      minCommon: Long): Map[(Long, Long), (Long, Long)] = {
    val und = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val adj = und.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    val acc = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((w, nbrs) <- adj if nbrs.size <= cap;
         (n1, i) <- nbrs.zipWithIndex; n2 <- nbrs.drop(i + 1)) {
      val (c0, r0) = acc.getOrElse((n1, n2), (0L, 0L))
      acc((n1, n2)) = (c0 + 1, r0 + 1000000L / nbrs.size)
    }
    val eset = und.toSet
    acc.filter { case (p, (c, _)) =>
      c >= minCommon && !eset.contains(p)
    }.toMap
  }

  test("linkPredict: matches the brute-force replay; the pivot cap " +
      "excludes hubs deterministically; existing edges never predicted") {
    import spark.implicits._
    // triangle 1-2-3, chain 3-4-5, hub 100 — {1..6} (degree 6)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)) ++
      (1L to 6L).map(n => (100L, n))
    def run(cap: Long): Map[(Long, Long), (Long, Long)] =
      graft.operators.Graphs.linkPredict(spark, edges.toDF("src", "dst"),
          maxPivotDegree = cap, minCommon = 1L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
    val capped = run(5L)
    assert(capped == refLinkPredict(edges, cap = 5L, minCommon = 1L))
    // hand anchors: (1,4) share pivot 3 (deg 4 → ra 250000); (3,5)
    // share pivot 4 (deg 3 → ra 333333); the hub (deg 6 > cap) is NOT
    // a pivot, so (1,6) — shared only through the hub — must be absent
    assert(capped((1L, 4L)) == ((1L, 250000L)))
    assert(capped((3L, 5L)) == ((1L, 333333L)))
    assert(!capped.contains((1L, 6L)))
    // no predicted pair is an existing edge
    assert(!capped.contains((1L, 2L)) && !capped.contains((3L, 100L)))
    // raising the cap admits the hub pivot: (1,6) — shared ONLY through
    // the hub — appears with its 1/6 contribution, and (1,4) gains the
    // hub term on top of pivot 3's (the hub links both 1 and 4)
    val open = run(10L)
    assert(open == refLinkPredict(edges, cap = 10L, minCommon = 1L))
    assert(open((1L, 6L)) == ((1L, 166666L)))
    assert(open((1L, 4L)) == ((2L, 416666L)))
  }

  /** Sequential LPA replay: same synchronous min-tie-break semantics,
    * executed as driver-side Map folds. */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val und = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val adj = und.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var lab = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      lab = adj.map { case (v, nbrs) =>
        val counts = nbrs.groupBy(lab).view.mapValues(_.size).toMap
        // max count, ties to the smallest label
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("labelPropagation: matches the sequential replay on bridged " +
      "cliques; tie-break deterministic; direction/duplicate invariant") {
    import spark.implicits._
    // two triangles bridged by one edge, plus an isolated 2-path where
    // EVERY neighborhood is a tie (pure tie-break territory)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L), (3L, 10L),
      (20L, 21L), (21L, 22L))
    def run(es: Seq[(Long, Long)]): Map[Long, Long] =
      graft.operators.Graphs.labelPropagation(spark,
          es.toDF("src", "dst"), iters = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = run(edges)
    assert(got == refLpa(edges, iters = 4))
    // the triangle clique around 1 must agree on one label
    assert(Set(got(1L), got(2L)).size == 1)
    val messy = edges.map(_.swap) ++ edges
    assert(run(messy) == got)
  }

  /** Driver-side brute-force triangle census: id-ordered triple
    * enumeration over an adjacency set — the third independent
    * formulation after Spark's degree-ordered orientation and the
    * oracle's id-ordered SQL join. */
  private def refTriangles(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long)] = {
    val und = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val adj = und.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val tri = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((u, v) <- und; w <- adj(u) if w > v && adj(v)(w)) {
      tri(u) += 1; tri(v) += 1; tri(w) += 1
    }
    adj.map { case (n, nbrs) =>
      val d = nbrs.size.toLong
      n -> (d, tri(n))
    }
  }

  test("triangleStats: matches the brute-force census on K4 + pendant + " +
      "star hub; lcc_ppm exact; direction/duplicate invariant") {
    import spark.implicits._
    // K4 on {1,2,3,4}, pendant 5—1, triangle-free star 10—{11..15}
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val star = (11L to 15L).map(l => (10L, l))
    val edges = k4 ++ Seq((5L, 1L)) ++ star
    val got = graft.operators.Graphs
      .triangleStats(spark, edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val want = refTriangles(edges).map { case (n, (d, t)) =>
      n -> ((d, t, if (d >= 2) 2000000L * t / (d * (d - 1)) else 0L))
    }
    assert(got == want)
    // hand-checked anchors: node 2 is pure-K4 (deg 3, 3 triangles,
    // fully clustered), node 1 carries the pendant (deg 4, 3 triangles),
    // the hub sees 5 leaves and zero triangles
    assert(got(2L) == ((3L, 3L, 1000000L)))
    assert(got(1L) == ((4L, 3L, 500000L)))
    assert(got(10L) == ((5L, 0L, 0L)))
    assert(got(11L) == ((1L, 0L, 0L)))
    // orientation invariance: reversed directions + duplicates in BOTH
    // directions must not change a single row
    val messy = edges.map(_.swap) ++ edges ++ edges.map(_.swap)
    val got2 = graft.operators.Graphs
      .triangleStats(spark, messy.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got2 == got)
    // the naive id-orientation (GraphBench's A/B baseline) must count
    // the same triangles — orientation is a counting device
    val gotNaive = graft.operators.Graphs
      .triangleStats(spark, edges.toDF("src", "dst"),
        orientByDegree = false)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(gotNaive == got)
  }

  /** Sequential driver-side walk replay — the SAME keyed-hash step rule
    * (catalyst's XxHash64Function on the "walk:step:cand" key, seed 42)
    * executed as a plain loop over an adjacency Map, so agreement
    * checks the distributed frontier-join/argmin plan, not a shared
    * implementation. */
  private def refWalks(edges: Seq[(Long, Long)], starts: Seq[Long],
      length: Int): Map[Long, String] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val und = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val adj = und.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    starts.filter(adj.contains).map { w =>
      var cur = w
      val path = new StringBuilder(w.toString)
      for (t <- 1 to length) {
        cur = adj(cur).minBy { n =>
          (XxHash64Function.hash(
            UTF8String.fromString(s"$w:$t:$n"), StringType, 42L), n)
        }
        path.append(' ').append(cur)
      }
      w -> path.toString
    }.toMap
  }

  test("randomWalks: bit-identical to the sequential keyed-hash replay; " +
      "out-of-graph starts dropped; edge-presentation invariant") {
    import spark.implicits._
    // two 4-cliques bridged by 4—5, a pendant chain 8—9—10, so walks
    // see choice-rich nodes (deg 3-4) and forced moves (deg 1)
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    val edges = k4a ++ k4b ++ Seq((4L, 5L), (8L, 9L), (9L, 10L))
    val starts = Seq(1L, 5L, 10L, 999L) // 999 is not in the graph
    val got = graft.operators.Graphs
      .randomWalks(spark, edges.toDF("src", "dst"),
        starts.toDF("node"), length = 6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = refWalks(edges, starts, length = 6)
    assert(got == want)
    assert(!got.contains(999L), "out-of-graph start must be dropped")
    assert(got.keySet == Set(1L, 5L, 10L))
    // every path is length+1 tokens starting at the walk id, each hop
    // a real edge
    val undSet = (k4a ++ k4b ++ Seq((4L, 5L), (8L, 9L), (9L, 10L)))
      .flatMap(p => Seq(p, p.swap)).toSet
    for ((w, p) <- got) {
      val toks = p.split(" ").map(_.toLong)
      assert(toks.length == 7 && toks.head == w)
      toks.sliding(2).foreach { case Array(a, b) =>
        assert(undSet((a, b)), s"hop $a->$b is not an edge")
      }
    }
    // determinism under presentation: duplicated + reversed edges and a
    // different start order change nothing (the step rule is a pure
    // function of (walk, step, candidate))
    val messy = edges.map(_.swap) ++ edges ++ edges
    val got2 = graft.operators.Graphs
      .randomWalks(spark, messy.toDF("src", "dst"),
        starts.reverse.toDF("node"), length = 6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == got)
    // walks decorrelate: starts 1 and 5 sit in symmetric cliques but
    // their hash streams differ, so the SUFFIXES diverge (not just the
    // start token) — guards against a degenerate constant-choice rule
    assert(got(1L).split(" ").drop(1).toSeq !=
      got(5L).split(" ").drop(1).toSeq)
  }

  /** Driver-side multi-source BFS: layered expansion over an adjacency
    * Map with (dist, seed) lexicographic settling — the independent
    * replay for nearestSeeds. */
  private def refNearestSeeds(edges: Seq[(Long, Long)], seeds: Seq[Long],
      depth: Int): Map[Long, (Long, Long)] = {
    val und = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val adj = und.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val settled = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    var frontier = seeds.distinct.filter(adj.contains)
      .map(s => s -> (0L, s)).toMap
    settled ++= frontier
    for (r <- 1 to depth) {
      val arrivals = scala.collection.mutable.Map.empty[Long, Long]
      for ((v, (_, s)) <- frontier; n <- adj(v))
        if (!settled.contains(n))
          arrivals(n) = arrivals.get(n).fold(s)(math.min(_, s))
      frontier = arrivals.map { case (n, s) => n -> (r.toLong, s) }.toMap
      settled ++= frontier
    }
    settled.toMap
  }

  test("nearestSeeds: matches the driver BFS replay; equal-distance tie " +
      "goes to the smaller seed; beyond-depth nodes absent; " +
      "out-of-graph seeds dropped") {
    import spark.implicits._
    // path 1—2—3—4—5—6—7 with seeds 1 and 7: node 4 is equidistant
    // (dist 3) from both — tie must resolve to seed 1; plus a far tail
    // 7—8—9—10—11—12 so depth 4 leaves 12 unreached from either seed
    val edges = (1L to 6L).map(i => (i, i + 1)) ++
      (7L to 11L).map(i => (i, i + 1))
    val seeds = Seq(1L, 7L, 999L) // 999 not in the graph
    val got = graft.operators.Graphs
      .nearestSeeds(spark, edges.toDF("src", "dst"),
        seeds.toDF("node"), maxDepth = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = refNearestSeeds(edges, seeds, depth = 4)
    assert(got == want)
    assert(got(4L) == ((3L, 1L)), "equidistant tie must pick seed 1")
    assert(got(11L) == ((4L, 7L)))
    assert(!got.contains(12L), "node 12 is 5 hops out — must be absent")
    assert(!got.contains(999L))
    assert(got(1L) == ((0L, 1L)) && got(7L) == ((0L, 7L)))
    // presentation invariance: reversed + duplicated edges, seed dups
    val messy = edges.map(_.swap) ++ edges ++ edges
    val got2 = graft.operators.Graphs
      .nearestSeeds(spark, messy.toDF("src", "dst"),
        (seeds ++ seeds).toDF("node"), maxDepth = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got2 == got)
    // early exit: depth far beyond the diameter must return the full
    // reachable set (11 hops settles everything) and terminate via the
    // exhausted-frontier path, not run 32 empty rounds
    val got3 = graft.operators.Graphs
      .nearestSeeds(spark, edges.toDF("src", "dst"),
        Seq(1L).toDF("node"), maxDepth = 32)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got3 == (1L to 12L).map(n => n -> ((n - 1, 1L))).toMap)
  }

  test("lineage-cut rounds (iteration > 8) are bit-identical to the " +
      "replays — the mid-loop localCheckpoint path that no default " +
      "iteration count reaches") {
    import spark.implicits._
    // every iterative graph operator cuts lineage at i % 8 == 0; the
    // queries/benches run 4-8 rounds, so without this spec the cut
    // (checkpoint + predecessor-block free mid-loop) would ship
    // unexecuted. Ring + chords so 10 rounds keep doing real work.
    val edges = (1L to 12L).map(i => (i, i % 12 + 1)) ++
      Seq((1L, 7L), (3L, 9L), (2L, 11L))
    val prGot = graft.operators.Graphs
      .pageRank(spark, edges.toDF("src", "dst"), iters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(prGot == refPageRank(edges, iters = 10))
    val lpaGot = graft.operators.Graphs
      .labelPropagation(spark, edges.toDF("src", "dst"), iters = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lpaGot == refLpa(edges, iters = 9))
    val wGot = graft.operators.Graphs
      .randomWalks(spark, edges.toDF("src", "dst"),
        Seq(1L, 5L).toDF("node"), length = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(wGot == refWalks(edges, Seq(1L, 5L), length = 10))
  }

  /** Sequential replay of the WEIGHTED walk: min over (hash of
    * "w:t:n:c", n, c) across every copy c in 1..weight(n), weight =
    * parallel-edge count of the canonical pair. */
  private def refWeightedWalks(edges: Seq[(Long, Long)],
      starts: Seq[Long], length: Int): Map[Long, String] = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val wts = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val adj = wts.keys.flatMap(p => Seq(p, p.swap)).toSeq.groupBy(_._1)
      .view.mapValues(_.map(_._2).distinct).toMap
    def wt(a: Long, b: Long): Long = wts((math.min(a, b), math.max(a, b)))
    starts.filter(adj.contains).map { w =>
      var cur = w
      val path = new StringBuilder(w.toString)
      for (t <- 1 to length) {
        cur = adj(cur).flatMap(n => (1L to wt(cur, n)).map(c => (n, c)))
          .minBy { case (n, c) =>
            (XxHash64Function.hash(
              UTF8String.fromString(s"$w:$t:$n:$c"), StringType, 42L),
              n, c)
          }._1
        path.append(' ').append(cur)
      }
      w -> path.toString
    }.toMap
  }

  test("weightedRandomWalks: bit-identical to the copy-explode replay " +
      "on a multigraph; heavy edges dominate; weight cap refuses") {
    import spark.implicits._
    // triangle 1-2-3 where edge (1,2) appears 5x (weight 5) and a
    // pendant 3-4; plus duplicated/reversed presentation noise
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val edges = base ++ Seq.fill(4)((2L, 1L)) // (1,2) weight 5 total
    val starts = Seq(1L, 3L, 4L)
    val got = graft.operators.Graphs
      .weightedRandomWalks(spark, edges.toDF("src", "dst"),
        starts.toDF("node"), length = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == refWeightedWalks(edges, starts, length = 5))
    // weight bias at the population level: many walks standing at 1
    // choose between 2 (weight 5) and 3 (weight 1) — across 40 walks'
    // first steps from a star of weight-5 vs weight-1 edges, the heavy
    // neighbor must win a clear majority (expected 5/6 ≈ 33 of 40)
    val star = (10L to 49L).flatMap(s =>
      Seq.fill(5)((s, 100L)) ++ Seq((s, 101L)))
    val firstSteps = graft.operators.Graphs
      .weightedRandomWalks(spark, star.toDF("src", "dst"),
        (10L to 49L).toDF("node"), length = 1)
      .collect().map(_.getString(1).split(" ")(1).toLong)
    val heavy = firstSteps.count(_ == 100L)
    assert(heavy >= 25 && heavy <= 40,
      s"weight-5 neighbor won only $heavy/40 first steps")
    // the cap is a refusal, not a silent truncation
    val err = intercept[IllegalArgumentException] {
      graft.operators.Graphs.weightedRandomWalks(spark,
        Seq.fill(3)((1L, 2L)).toDF("src", "dst"),
        Seq(1L).toDF("node"), length = 1, maxWeight = 2L)
    }
    assert(err.getMessage.contains("maxWeight"))
  }

  test("randomWalks: choices at a shared hub decorrelate across walks " +
      "(the keyed hash really keys on the walk id)") {
    import spark.implicits._
    // star: center 0, leaves 1..100. Every walk starts at a leaf, is
    // forced to the center at step 1, then picks among all 100 leaves
    // at step 2 with key (walk, 2, cand). If the key dropped the walk
    // id, ALL 100 walks would pick the SAME leaf; iid-ish choices give
    // ~63 distinct picks (100 draws over 100 bins) with max bin ~4.
    val edges = (1L to 100L).map(l => (0L, l))
    val starts = (1L to 100L).toDF("node")
    val step2 = graft.operators.Graphs
      .randomWalks(spark, edges.toDF("src", "dst"), starts, length = 2)
      .collect().map(_.getString(1).split(" ")(2).toLong)
    val counts = step2.groupBy(identity).map(_._2.length)
    assert(counts.size >= 40,
      s"only ${counts.size} distinct hub choices across 100 walks — " +
        "the choice key is not decorrelating by walk id")
    assert(counts.max <= 15,
      s"one leaf chosen ${counts.max}/100 times — hash badly skewed")
  }

  test("random-graph property sweep: walks and nearest-seed match their " +
      "replays on 8 seeded random multigraphs (self-loops, duplicate " +
      "edges, disconnected fragments)") {
    import spark.implicits._
    val rng = new scala.util.Random(0x9e37)
    for (trial <- 1 to 8) {
      val n = 8 + rng.nextInt(12)
      // random multigraph INCLUDING self-loops and duplicates — the
      // operators must canonicalize them away identically to the refs
      val edges = Seq.fill(2 * n)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val starts = Seq.fill(4)(rng.nextInt(n + 2).toLong).distinct
      val wGot = graft.operators.Graphs
        .randomWalks(spark, edges.toDF("src", "dst"),
          starts.toDF("node"), length = 3)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(wGot == refWalks(edges, starts, length = 3),
        s"walks diverged on trial $trial: $edges starts=$starts")
      val sGot = graft.operators.Graphs
        .nearestSeeds(spark, edges.toDF("src", "dst"),
          starts.toDF("node"), maxDepth = 3)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(sGot == refNearestSeeds(edges, starts, depth = 3),
        s"nearestSeeds diverged on trial $trial: $edges seeds=$starts")
    }
  }

  test("skip-gram pairs from a hand-checked walk window") {
    import spark.implicits._
    // one deterministic 2-step walk on a triangle: replay gives the
    // exact path; window ±2 over 3 positions yields every ordered pair
    // with multiplicity 1 except the (pos0,pos2) pair also in range
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val walks = graft.operators.Graphs
      .randomWalks(spark, edges.toDF("src", "dst"),
        Seq(1L).toDF("node"), length = 2)
      .collect()
    assert(walks.length == 1)
    val toks = walks.head.getString(1).split(" ").map(_.toLong)
    assert(toks.length == 3)
    // the q117 shape: ordered (center, context) counts within ±2 of 3
    // positions = all 6 ordered pairs of distinct positions
    val want = (for {
      i <- toks.indices; j <- toks.indices
      if i != j && math.abs(i - j) <= 2
    } yield (toks(i), toks(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pos = walks.head.getString(1).split(" ").zipWithIndex
      .map { case (n, i) => (1L, i, n.toLong) }.toSeq
      .toDF("walk", "pos", "node")
    val p2 = pos.select(col("walk"), col("pos").as("pos2"),
      col("node").as("context"))
    val got = pos.join(p2, Seq("walk"))
      .where(col("pos2") =!= col("pos") &&
        abs(col("pos2") - col("pos")) <= 2)
      .groupBy(col("node"), col("context"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == want)
  }

  test("resumableRun: maxIter abandon KEEPS the checkpoint; a second " +
      "call resumes from the last committed round and converges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ccr2").toString
    val edges = chainEdges(30)
    // phase 1: give up after 2 rounds — the abandoned run must leave its
    // last committed round in place (that is the point of resumability;
    // a temp-dir durable run would have freed everything here)
    val ex = intercept[IllegalStateException] {
      graft.operators.ConnectedComponents
        .resumableRun(spark, edges, dir, maxIter = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
    val kept = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && new java.io.File(f, "_SUCCESS").exists)
      .map(_.getName)
    assert(kept.toSeq == Seq("round_2"),
      s"exactly the last committed round survives abandon: ${kept.toSeq}")
    // a crash mid-write leaves an UNcommitted round dir — resume must
    // ignore it (no _SUCCESS) and seed from round_2
    val junk = new java.io.File(dir, "round_9")
    junk.mkdirs()
    java.nio.file.Files.write(junk.toPath.resolve("part-junk.parquet"),
      Array[Byte](1, 2, 3))
    // phase 2: resume — round counter continues (rounds > 2), labels
    // converge to the same fixpoint a fresh run produces
    val h = graft.operators.ConnectedComponents
      .resumableRun(spark, edges, dir)
    assert(h.rounds > 2, s"resume must continue the round counter, " +
      s"got ${h.rounds}")
    val got = h.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (1 to 30).map(i => i.toLong -> 1L).toMap)
    h.close()
    assert(!new java.io.File(dir).exists())
  }
}
