package graft.operators

import graft.SparkTestBase
import graft.core.UnionFind
import graft.pipeline.FixtureSpark
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkTestBase {

  // ---------------- connected components ----------------

  test("CC fixpoint equals union-find oracle on chains + hub") {
    // hubDegree 2000 keeps the high-degree skew path exercised now that
    // q63 runs on the (max-degree-2) customer-derived oracled edges
    val edges = FixtureSpark.ccEdges(spark, nChains = 10, chainLen = 40,
      hubDegree = 2000)
    val got = ConnectedComponents.run(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = UnionFind.componentsOf(local)
    assert(got == want)
  }

  test("CC is partition-count independent") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 1L), (5L, 5L))
      .toDF("src", "dst")
    val a = ConnectedComponents.run(spark, edges.repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = ConnectedComponents.run(spark, edges.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // the (5,5) self-loop contributes an isolated node
    assert(a == Set((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (10L, 10L),
      (11L, 10L)))
  }

  test("CC fixpoint equals union-find on random multigraphs (seeded)") {
    import spark.implicits._
    // random edges including self-loops, duplicates, isolated chains —
    // the net behind the double-pointer-jump round structure
    val rng = new scala.util.Random(0xcc3)
    for (trial <- 1 to 3) {
      val n = 30 + rng.nextInt(40)
      val edges = (1 to n).map { _ =>
        (rng.nextInt(60).toLong, rng.nextInt(60).toLong)
      }
      val df = edges.toDF("src", "dst").repartition(1 + rng.nextInt(5))
      val got = ConnectedComponents.run(spark, df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = UnionFind.componentsOf(edges)
      assert(got == want, s"trial $trial (n=$n)")
    }
  }

  test("CC runManaged close() frees the run's backing files") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val h = ConnectedComponents.runManaged(spark, edges)
    val labels = h.labels.collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    h.close()
    h.close() // idempotent
    // the final round's checkpoint blocks are gone (lineage was cut, so
    // nothing can recompute them): re-executing the labels must fail
    intercept[Exception] { h.labels.count() }
  }

  // ---------------- dedup ----------------

  import org.apache.spark.sql.DataFrame

  private def docsDF: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "s0"),
      (1L, "the quick brown fox jumps over the lazy cat", "s0"),
      (2L, "completely different text about spark engines here", "s0"),
      (3L, "the quick brown fox jumps over the lazy dog", "s1"),
      (4L, "engines spark about text different completely here now", "s1")
    ).toDF("doc_id", "text", "source")
  }

  test("exact dedup keeps min id per identical text") {
    val got = Dedup.exact(docsDF, "text", "doc_id")
      .where(col("dup_count") > 1).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("doc_id") == 0L)
    assert(got(0).getAs[Long]("dup_count") == 2L)
  }

  test("minhash LSH finds the exact-dup and near-dup pairs") {
    val pairs = Dedup.minhashNearDups(docsDF, "text", "doc_id",
        k = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)), s"exact dup must be found: $pairs")
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L)),
      s"one-word-changed near dup should be found: $pairs")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((2L, 3L)))
  }

  test("minhash estimated jaccard ≈ true jaccard") {
    def sh(t: String) = t.split(' ').sliding(2).map(_.mkString(" ")).toSet
    val j01 = sh("the quick brown fox jumps over the lazy dog")
      .intersect(sh("the quick brown fox jumps over the lazy cat")).size.toDouble /
      sh("the quick brown fox jumps over the lazy dog")
        .union(sh("the quick brown fox jumps over the lazy cat")).size
    val est = Dedup.minhashNearDups(docsDF, "text", "doc_id",
        k = 2, numHashes = 64, bands = 32, threshold = 0.0)
      .where(col("a") === 0 && col("b") === 1)
      .collect()
    if (est.nonEmpty)
      assert(math.abs(est(0).getDouble(2) - j01) < 0.25,
        s"est=${est(0).getDouble(2)} true=$j01")
  }

  test("simhash: identical docs hamming 0, near docs small hamming") {
    val fp = Dedup.simhash(docsDF, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(3L))
    assert(java.lang.Long.bitCount(fp(0L) ^ fp(1L)) <
      java.lang.Long.bitCount(fp(0L) ^ fp(2L)))
  }

  test("ngram jaccard pairs: exact values, blocked by source") {
    val got = Dedup.ngramJaccardPairs(docsDF, "text", "doc_id", "source",
        k = 2, threshold = 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // (0,1) share 7 of their 8+8 distinct 2-grams → 7/(8+8-7) = 7/9
    assert(got.contains((0L, 1L)))
    assert(math.abs(got((0L, 1L)) - 7.0 / 9.0) < 1e-12, got.toString)
    // cross-source pairs must not appear (blocking)
    assert(!got.keySet.exists { case (a, b) => a == 0L && b == 3L })
  }

  test("containment pairs == brute force on a random corpus (seeded)") {
    // every candidate pair, threshold 0 — the operator's blocked
    // shared-shingle join must reproduce the quadratic in-process
    // reference exactly (same distinct-shingle boundary semantics,
    // same double division), including the cross-source blocking
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0L until 60L).map { id =>
      val n = 4 + rnd.nextInt(12)
      (id, Vector.fill(n)(s"w${rnd.nextInt(12)}").mkString(" "),
        s"s${id % 3}")
    }
    def shingleSet(text: String): Set[String] = {
      val w = text.split(' ')
      (0 to math.max(w.length - 3, 0))
        .map(i => w.slice(i, i + 3).mkString(" ")).toSet
    }
    val brute = (for {
      (a, ta, sa) <- docs
      (b, tb, sb) <- docs
      if a < b && sa == sb
      inter = (shingleSet(ta) intersect shingleSet(tb)).size
      if inter > 0
    } yield ((a, b), inter.toDouble /
        math.min(shingleSet(ta).size, shingleSet(tb).size))).toMap
    val got = Dedup.containmentPairs(docs.toDF("doc_id", "text", "source"),
        "text", "doc_id", "source", k = 3, threshold = 0.0)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.size == brute.size, s"${got.size} vs ${brute.size} pairs")
    assert(got == brute)
  }

  // ---------------- similarity ----------------

  /** Clustered vectors (8 centers + small noise) — the data regime IVF is
    * for; uniform-random vectors have no cluster structure for a coarse
    * quantizer to exploit. */
  private def vecsDF: DataFrame = {
    import spark.implicits._
    val rng = new graft.core.Rng(7L)
    val centers = Array.fill(8)(Array.fill(16)(rng.nextDouble() - 0.5))
    (0L until 200L).map { id =>
      val c = centers((id % 8).toInt)
      val v = c.map(x => (x + (rng.nextDouble() - 0.5) * 0.1).toFloat)
      (id, v.toSeq, (id % 8).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  test("brute-force cosine top-k: self-similar vector ranks first") {
    import spark.implicits._
    // plant: vector 199 = vector 0 scaled → cosine 1.0
    val vecs = vecsDF.as[(Long, Seq[Float], Int)].collect()
    val planted = vecs.map {
      case (199L, _, l) => (199L, vecs(0)._2.map(_ * 2.0f), l)
      case v => v
    }
    val df = spark.createDataFrame(planted.toSeq)
      .toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteForceTopK(df,
        df.where(col("vec_id") === 0), "vec_id", "embedding", k = 3)
      .collect()
    assert(top.head.getAs[Long]("neighbor_id") == 199L)
    assert(math.abs(top.head.getAs[Double]("cos") - 1.0) < 1e-9)
  }

  test("IVF ANN recall@5 vs brute force ≥ 0.6 with nProbe=4/16") {
    val queries = vecsDF.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(vecsDF, queries, "vec_id",
        "embedding", 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val ivf = Similarity.ivfTopK(vecsDF, queries, "vec_id", "embedding",
        nCells = 16, nProbe = 4, k = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recall = bf.keys.toSeq.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(bf(q)).size.toDouble / 5.0
    }.sum / bf.size
    info(s"IVF recall@5 = $recall")
    assert(recall >= 0.6)
  }

  test("LSH embedding near-dups finds planted duplicate") {
    import spark.implicits._
    val vecs = vecsDF.as[(Long, Seq[Float], Int)].collect()
    val planted = vecs.map {
      case (199L, _, l) => (199L, vecs(0)._2.map(_ * 3.0f), l)
      case v => v
    }
    val df = spark.createDataFrame(planted.toSeq)
      .toDF("vec_id", "embedding", "label")
    val pairs = Similarity.embeddingNearDups(df, "vec_id", "embedding",
        nBits = 8, dim = 16, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 199L)), pairs.toString)
  }

  // ---------------- text analysis ----------------

  test("langId picks the stopword-matching language, zh via CJK") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is on the mat and this is fine"),
      (2L, "der hund ist mit der katze und das ist gut"),
      (3L, "el gato es un animal con la casa"),
      (4L, "le chat est avec le chien dans la maison"),
      (5L, "这是 中文 文本"),
      (6L, "zzz qqq xxx")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "es" &&
      got(4L) == "fr" && got(5L) == "zh" && got(6L) == "und")
  }

  test("fingerprint is order-sensitive") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) != fp(2L))
  }

  // ---------------- multimodal plumbing ----------------

  test("multimodal: resize round-trips with target dims, scaled body") {
    import spark.implicits._
    val docs = Seq((4L, "x" * 100), (5L, "y" * 200)).toDF("doc_id", "text")
    val resized = Multimodal.resize(Multimodal.syntheticMedia(docs), 32, 32)
    val meta = Multimodal.decodeMeta(resized).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    assert(meta(4L) == ((32, 32)) && meta(5L) == ((32, 32)))
    // determinism: same input → byte-identical payload
    val a = resized.collect().map(m => m.media_id -> m.payload.toSeq).toMap
    val b = Multimodal.resize(Multimodal.syntheticMedia(docs), 32, 32)
      .collect().map(m => m.media_id -> m.payload.toSeq).toMap
    assert(a == b)
  }

  test("multimodal: resize survives empty bodies and huge upscales") {
    import spark.implicits._
    val docs = Seq((6L, "")).toDF("doc_id", "text") // header-only payload
    val resized = Multimodal.resize(Multimodal.syntheticMedia(docs), 32, 32)
      .collect()
    assert(resized.head.payload.length == 8, "empty body stays empty")
    val big = Seq((7L, "x" * 1000)).toDF("doc_id", "text")
    val up = Multimodal.resize(Multimodal.syntheticMedia(big), 4096, 4096)
      .collect() // must not wrap Int-negative
    assert(up.head.payload.length > 8)
  }

  test("multimodal: resize rejects bad dims and over-cap upscales loudly") {
    import spark.implicits._
    val docs = Seq((7L, "x" * 10)).toDF("doc_id", "text")
    val media = Multimodal.syntheticMedia(docs)
    intercept[IllegalArgumentException] {
      Multimodal.resize(media, 0, 32)
    }
    intercept[IllegalArgumentException] {
      Multimodal.resize(media, 32, -1)
    }
    // doc 7 → 23x16 source; a 2000-byte body upscaled to 4096x4096 is
    // ~91 MB > the 64 MB cap: must FAIL (a silent truncation would break
    // the header-vs-body pixel-count contract)
    val huge = Seq((7L, "x" * 2000)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Multimodal.resize(Multimodal.syntheticMedia(huge), 4096, 4096).collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("cap 64MB")), messages(e).toString)
  }

  test("multimodal: frameSample emits every k-th width-byte frame") {
    import spark.implicits._
    val docs = Seq((4L, "abcdefghij" * 20)).toDF("doc_id", "text") // 200 B
    val media = Multimodal.syntheticMedia(docs)
    val m = media.collect().head
    val meta = Multimodal.FakeCodec.decode(m.payload)
    val frames = Multimodal.frameSample(media, everyK = 2).collect()
    val body = m.payload.drop(8)
    val expected = (body.length / meta.width + 1) / 2
    assert(frames.length == expected, s"got ${frames.length}, want $expected")
    val f0 = frames.find(_.getInt(1) == 0).get.getAs[Array[Byte]]("frame")
    assert(f0.toSeq == body.take(meta.width).toSeq)
  }

  test("multimodal: decode meta round-trips the synthetic header") {
    import spark.implicits._
    val docs = Seq((5L, "hello world media payload")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(Multimodal.syntheticMedia(docs)).collect()
    assert(meta.length == 1)
    val r = meta(0)
    assert(r.getAs[Int]("width") == 16 + 5 && r.getAs[Int]("channels") == 3)
    assert(r.getAs[String]("kind") == "audio") // id 5 odd → aud
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(docs), 8).collect()
    assert(feats(0).getSeq[Float](feats(0).fieldIndex("features")).length == 8)
  }
}
