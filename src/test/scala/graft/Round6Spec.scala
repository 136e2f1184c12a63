package graft

import org.apache.spark.sql.functions._

/** Round-6 queries: q104's exact-regime equality lives in SketchesSpec
  * (plus the DuckDB oracle); q105 is approximate-by-contract (q39
  * pattern), so this spec pins the GK sketch's rank guarantee against
  * the exact per-group distribution and its determinism for fixed
  * input — the properties the rows-only driver check cannot see.
  */
class Round6Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q105: percentile_approx honors the GK rank guarantee per group") {
    val rows = SparkEntry.queries("q105_quantile_sketch")(spark, sf)
      .collect()
    val byLang = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "n_chars").collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getLong(1)).sorted }
    assert(rows.map(_.getString(0)).toSet == byLang.keySet)
    rows.foreach { r =>
      val lang = r.getString(0)
      val n = r.getLong(1)
      val vals = byLang(lang)
      assert(vals.length.toLong == n, s"$lang group size")
      Seq(0.25 -> r.getLong(2), 0.50 -> r.getLong(3), 0.75 -> r.getLong(4))
        .foreach { case (q, got) =>
          // GK guarantee (accuracy = 10000): the returned value is an
          // actual element whose rank is within n/accuracy of q·n
          assert(vals.contains(got), s"$lang p$q=$got not a data element")
          val lo = vals.indexOf(got) + 1 // 1-based rank window of `got`
          val hi = vals.lastIndexOf(got) + 1
          val eps = n.toDouble / 10000 + 1
          val target = q * n
          assert(lo - eps <= target && target <= hi + eps,
            s"$lang p$q=$got rank window [$lo,$hi] misses target " +
              s"$target beyond ±$eps")
        }
    }
  }

  test("percentile_approx exact regime == element at rank ceil(q*n), " +
      "random corpora") {
    // the equality that LICENSES q105's DuckDB oracle (the q103
    // pattern): below compression (n ≤ accuracy/2, pinned per sf dir in
    // OracleAssumptions) the GK summary retains every sample — any
    // compress/merge would need to fuse two weight-1 samples into
    // weight 2 > 2·(n/accuracy), which the error budget forbids — so
    // the returned value is exactly the ⌈q·n⌉-th smallest. Caveat this
    // spec itself discovered: ApproximatePercentile round-trips values
    // through DOUBLE, so the equality holds only for double-exact
    // inputs (|v| ≤ 2^53 — Long.MaxValue/2 comes back rounded to 2^62);
    // n_chars is tiny, and the pin in OracleAssumptions checks the
    // range. Pinned here on seeded random groups with heavy ties,
    // skew, negatives, 2^50-scale values, and size-1 groups.
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 40).flatMap { g =>
      val size = Seq(1, 2, 3, 7, 50, 311, 1024, 2999)(g % 8)
      val gen: () => Long = g % 4 match {
        case 0 => () => rnd.nextInt(5).toLong - 2      // heavy ties
        case 1 => () => rnd.nextLong() % 1000000L      // spread
        case 2 => () => math.abs(rnd.nextGaussian() * 10).toLong
        case _ => () => if (rnd.nextBoolean()) 0L else 1L << 50
      }
      Vector.fill(size)((s"g$g", gen()))
    }
    val df = rows.toDF("grp", "v").repartition(7)
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val got = df.groupBy("grp").agg(
        count(lit(1)).as("n"),
        qs.map(q => percentile_approx(col("v"), lit(q), lit(10000))
          .as(s"p$q")): _*)
      .collect()
    val byGrp = rows.groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    got.foreach { r =>
      val xs = byGrp(r.getString(0))
      val n = r.getLong(1)
      assert(n == xs.length)
      qs.zipWithIndex.foreach { case (q, i) =>
        val want = xs(math.max(0, math.ceil(q * n).toInt - 1))
        assert(r.getLong(2 + i) == want,
          s"${r.getString(0)} q=$q: spark ${r.getLong(2 + i)} vs " +
            s"rank-formula $want (n=$n)")
      }
    }
  }

  test("q105 is deterministic for fixed input") {
    val a = SparkEntry.queries("q105_quantile_sketch")(spark, sf)
      .collect().map(_.toSeq)
    val b = SparkEntry.queries("q105_quantile_sketch")(spark, sf)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("containment scores an embedded doc 1.0 where Jaccard stays low") {
    // the operator's reason to exist: doc 20 is fully embedded in the
    // longer doc 10, so containment = 1.0 while Jaccard = 0.25; doc 30
    // is identical text in a DIFFERENT block and must produce no pair
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("source", StringType)))
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(10L, "a b c d e f g h i j", "s"),
        Row(20L, "c d e f", "s"),
        Row(30L, "c d e f", "other")),
      schema)
    val cont = graft.operators.Dedup.containmentPairs(docs, "text",
        "doc_id", "source", k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq == Seq((10L, 20L, 1.0)))
    // refactor regression: the shared candidate machinery still yields
    // the exact Jaccard for the same pair (2 shared of 8 union shingles)
    val jac = graft.operators.Dedup.ngramJaccardPairs(docs, "text",
        "doc_id", "source", k = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(jac.toSeq == Seq((10L, 20L, 0.25)))
  }

  test("null text rows drop out of the round-6 operators without crashing") {
    // the sf corpus guarantees non-null text (OracleAssumptions), but a
    // production corpus does not — null rows must vanish (explode of a
    // null token array emits nothing), never throw
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("source", StringType)))
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "a b c", "s"), Row(2L, null, "s"), Row(3L, "a b d", "s")),
      schema)
    val hh = graft.operators.Sketches.heavyHittersOf(docs,
        split(col("text"), " "), capacity = 16, k = 5, itemCol = "word")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.toSeq ==
      Seq(("a", 2L, 0L), ("b", 2L, 0L), ("c", 1L, 0L), ("d", 1L, 0L)))
    val cp = graft.operators.Dedup.containmentPairs(docs, "text",
        "doc_id", "source", k = 2, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cp.toSeq == Seq((1L, 3L, 0.5)))
  }

  test("q108 quantization codes and integer dots: hand-checked formula") {
    // (3,4): norm 5 → codes (floor(.6·127+.5), floor(.8·127+.5)) =
    // (76, 102); (6,8) normalizes identically → dot 76²+102² = 16180;
    // (4,−3) → codes (102, −76) → orthogonal dot exactly 0
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def df(rows: (Long, Seq[Float])*) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (i, v) =>
        Row(i, v) }: _*), schema)
    val got = graft.operators.Similarity.quantizedTopK(
        df(2L -> Seq(6f, 8f), 3L -> Seq(4f, -3f)),
        df(1L -> Seq(3f, 4f)), "vec_id", "embedding", k = 2)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1, 2L, 16180L), (1L, 2, 3L, 0L)))
  }

  test("q108 int8 ranking recalls the exact cosine top-5") {
    // the quality leg the hash oracle can't see: per-query recall vs
    // q50's exact ranking — measured 1.0 at sf0.001 AND sf0.01 (16-dim
    // unit vectors quantize nearly losslessly at 8 bits); pinned at
    // ≥ 0.8 to allow genuine near-tie flips without masking a break
    def topSets(q: String) = SparkEntry.queries(q)(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(2)).toSet }
    val exact = topSets("q50_cosine_topk")
    val quant = topSets("q108_quantized_topk")
    assert(exact.keySet == quant.keySet)
    exact.foreach { case (g, ex) =>
      val recall = (ex intersect quant(g)).size.toDouble / ex.size
      assert(recall >= 0.8, s"query $g recall $recall (exact $ex vs " +
        s"quantized ${quant(g)})")
    }
  }

  test("q102 output is flat and round-trips the token stream") {
    // the flattened string must carry exactly the encoded tokens (space
    // join is lossless: tokens are merges of space-split words, so they
    // never contain a space themselves)
    val df = SparkEntry.queries("q102_bpe_tokens")(spark, sf)
    assert(df.schema("tokens").dataType ==
      org.apache.spark.sql.types.StringType)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = graft.operators.BpeSpark.trainMerges(docs, "text", 10)
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(' ').toVector
          .flatMap(w => graft.core.Bpe.encode(w,
            merges.map { case (rank, a, b, _) => (a, b) -> rank }.toMap))
          .mkString(" ")).toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
  }
}
