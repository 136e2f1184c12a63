package graft.functions

import graft.SparkTestBase
import graft.core.Conll
import graft.operators.Salting
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkTestBase {

  test("SpanF1 aggregator computes CoNLL-style P/R/F1") {
    import spark.implicits._
    // 3 matched, 1 pred-only, 2 gold-only → P=3/4, R=3/5
    val flags = Seq(
      SpanF1.SpanFlag(true, true), SpanF1.SpanFlag(true, true),
      SpanF1.SpanFlag(true, true), SpanF1.SpanFlag(true, false),
      SpanF1.SpanFlag(false, true), SpanF1.SpanFlag(false, true)).toDS()
    val m = flags.select(SpanF1.aggregator.toColumn).head()
    assert(m.precision == 0.75 && m.recall == 0.6)
    assert(math.abs(m.f1 - 2 * 0.75 * 0.6 / 1.35) < 1e-12)
  }

  test("SpanF1 merges partial buffers across partitions") {
    import spark.implicits._
    val flags = (1 to 1000).map(i =>
      SpanF1.SpanFlag(isPred = true, isGold = i % 2 == 0)).toDS()
      .repartition(7)
    val m = flags.select(SpanF1.aggregator.toColumn).head()
    assert(m.precision == 0.5 && m.recall == 1.0)
  }

  test("Conll format/parse round trip") {
    val doc = Seq(
      (Seq("Alice", "Johnson", "met", "."),
        Seq("B-PER", "I-PER", "O", "O")),
      (Seq("Acme", "."), Seq("B-ORG", "O")))
    val text = Conll.format("https://x.example/p1", doc)
    val parsed = Conll.parse(text)
    assert(parsed.length == 1)
    assert(parsed(0)._1 == "https://x.example/p1")
    assert(parsed(0)._2 ==
      doc.map { case (a, b) => (a.toVector, b.toVector) }.toVector)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val big = (1 to 500).map(i => (i % 5, s"v$i")).toDF("k", "v")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (3, "d"), (4, "e"))
      .toDF("k2", "name")
    val plain = big.join(small, col("k") === col("k2"))
      .groupBy("name").count()
    val salted = Salting.saltedJoin(big, small, "k", "k2", "v", 8)
      .groupBy("name").count()
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
  }

  test("native CosineSimilarity is bit-equal to the HOF form and codegens") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .where(col("a_id") < 40)
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b"))
      .where(col("b_id") >= 40 && col("b_id") < 80)
    val pairs = a.crossJoin(b)
    val both = pairs.select(col("a_id"), col("b_id"),
      graft.operators.Similarity.cosine(col("a"), col("b")).as("native"),
      graft.operators.Similarity.cosineHof(col("a"), col("b")).as("hof"))
    val diff = both.where(col("native") =!= col("hof")).count()
    assert(diff == 0, "native and HOF cosine must be bit-identical")
    // the native expression must live inside WholeStageCodegen (check a
    // scan+project plan after execution so AQE has finalized)
    val simple = emb.select(graft.operators.Similarity.cosine(
      col("embedding"), col("embedding")).as("c"))
    simple.collect()
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = simple.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosine_similarity"), plan.take(800))
  }

  test("native cosine null-propagates like the HOF on dirty inputs") {
    import spark.implicits._
    // null element / length mismatch: zip_with pads with null and the
    // aggregate nulls out — the native expression must agree, not fold
    // the null as 0.0 or count the tail into its own norm (pre-fix
    // behavior, which silently broke the documented bit-equality)
    val rows = Seq(
      (1L, Seq[java.lang.Float](1.0f, null, 2.0f),
        Seq[java.lang.Float](1.0f, 1.0f, 1.0f)),     // null element
      (2L, Seq[java.lang.Float](1.0f, 2.0f),
        Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),     // length mismatch
      (3L, Seq[java.lang.Float](1.0f, 2.0f),
        Seq[java.lang.Float](2.0f, 4.0f))            // clean control
    ).toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<float>"),
        col("b").cast("array<float>"))
    val both = rows.select(col("id"),
      graft.operators.Similarity.cosine(col("a"), col("b")).as("native"),
      graft.operators.Similarity.cosineHof(col("a"), col("b")).as("hof"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2),
        if (r.isNullAt(1)) 0.0 else r.getDouble(1),
        if (r.isNullAt(2)) 0.0 else r.getDouble(2)))
    both.foreach { case (id, nNull, hNull, nv, hv) =>
      assert(nNull == hNull && nv == hv,
        s"row $id: native=($nNull,$nv) hof=($hNull,$hv)")
    }
    assert(both.count(_._2) == 2, "dirty rows must be null")
  }

  test("parameter guards fail fast instead of corrupting silently") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "v")
    // saltedJoin must reject a pre-existing __salt column
    val withSalt = df.withColumn("__salt", lit(9))
    assert(intercept[IllegalArgumentException] {
      Salting.saltedJoin(withSalt, df.withColumnRenamed("k", "k2"),
        "k", "k2", "v", 4)
    }.getMessage.contains("__salt"))
    // ntileBuckets k=0 would NULL every row via % 0
    assert(intercept[IllegalArgumentException] {
      graft.operators.DistributedRank.ntileBuckets(
        df, lit(0), Seq(col("k")), k = 0, "nt")
    }.getMessage.contains("positive"))
    // minhash bands must divide numHashes or banding drops signature rows
    assert(intercept[IllegalArgumentException] {
      graft.operators.Dedup.minhashNearDups(
        df.withColumnRenamed("v", "text"), "text", "k",
        numHashes = 64, bands = 24)
    }.getMessage.contains("divide"))
  }

  test("CC fixpoint fails loudly on maxIter instead of returning " +
      "non-converged labels") {
    import spark.implicits._
    // a 40-chain needs several rounds; maxIter=1 cannot converge
    val edges = (0L until 40L).map(k => (k, k + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      graft.operators.ConnectedComponents.run(spark, edges, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("approx_count_distinct within 5% of exact at sf0.001") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"exact=$exact approx=$approx")
  }
}
