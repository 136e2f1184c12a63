package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized invariants for the corpus-curation operators — the same
  * seeded-random hardening the round-3 verdict asked for on
  * DistributedRank. Fixed seeds keep every run identical.
  */
class CorpusOpsPropertySpec extends SparkTestBase {

  private def randomCorpus(seed: Long, nDocs: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    // strata include null (cast to string survives as null) and ids are
    // non-contiguous — the shapes a real corpus shows up with
    (0 until nDocs).map { i =>
      val id = i.toLong * 7 + rng.nextInt(3)
      val lang = rng.nextInt(5) match {
        case 0 => null
        case k => Seq("en", "de", "fr", "zh")(k - 1)
      }
      val n = 1 + rng.nextInt(40)
      val text = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      (id, lang, text)
    }.toDF("doc_id", "lang", "text").repartition(7)
  }

  test("stratifiedSampleByHash == naive window on random corpora with " +
      "null strata (3 seeds)") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val docs = randomCorpus(seed, 300)
      val quota = 7
      val got = CorpusOps
        .stratifiedSampleByHash(docs, "lang", "doc_id", quota)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSet
      val w = Window.partitionBy("stratum").orderBy(col("h"), col("id"))
      val naive = docs.select(
          col("lang").cast("string").as("stratum"),
          col("doc_id").cast("long").as("id"),
          xxhash64(col("doc_id").cast("string")).as("h"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= quota)
        .select("stratum", "id", "rn")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(got == naive, s"seed=$seed")
      assert(got.exists(_._1 == null), s"seed=$seed: null stratum missing")
    }
  }

  test("sampleByHash is monotone in pct and partitions at the complement") {
    val docs = randomCorpus(11L, 400)
    def ids(pct: Int) = CorpusOps.sampleByHash(docs, col("doc_id"), pct)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val s20 = ids(20); val s50 = ids(50); val s80 = ids(80)
    assert(s20.subsetOf(s50) && s50.subsetOf(s80),
      "a bigger split must CONTAIN the smaller one (stable splits)")
    // the complement via the same hash — together they tile the corpus
    val anti = docs.where(
        pmod(xxhash64(col("doc_id").cast("string")), lit(100)) >= 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((s50 ++ anti) == all && (s50 & anti).isEmpty)
  }

  test("chunkTokens: stride == chunkSize tiles the document exactly; " +
      "overlapping chunks match token slices (random docs)") {
    val docs = randomCorpus(23L, 120)
    import spark.implicits._
    val tokens = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().map { case (id, t) =>
        id -> t.split(" ").toVector
      }.toMap
    // tiling: non-overlapping chunks reassemble the original text
    val tiled = CorpusOps.chunkTokens(docs, "text", "doc_id", 8, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
      .groupBy(_._1)
    tokens.foreach { case (id, toks) =>
      val rebuilt = tiled(id).sortBy(_._2).map(_._3).mkString(" ")
      assert(rebuilt == toks.mkString(" "), s"doc $id does not re-tile")
    }
    // overlap: chunk j must equal tokens[j*stride, j*stride+size)
    CorpusOps.chunkTokens(docs, "text", "doc_id", 8, 3)
      .collect().foreach { r =>
        val (id, j, n, c) =
          (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))
        val want = tokens(id).slice(j * 3, j * 3 + 8)
        assert(c == want.mkString(" ") && n == want.size,
          s"doc $id chunk $j mismatch")
      }
  }

  test("tfIdf invariants on a random corpus") {
    val docs = randomCorpus(31L, 150)
    import spark.implicits._
    val toks = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").toVector }.toMap
    val nDocs = toks.size
    val dfTrue = toks.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    // topK >= vocab size → every (doc, term) row present
    val rows = CorpusOps.tfIdf(docs, "text", "doc_id", topK = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    rows.foreach { case (id, term, tf, df, tfidf) =>
      assert(tf == toks(id).count(_ == term), s"tf wrong for ($id,$term)")
      assert(df == dfTrue(term).toLong, s"df wrong for $term")
      val idf = math.log((1.0 + nDocs) / (1.0 + df)) + 1.0
      val want = BigDecimal(tf * idf)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(tfidf == want, s"tfidf wrong for ($id,$term)")
      assert(idf >= 1.0, "smooth idf is never below 1")
    }
    // per-doc tf sums to the token count when no term is cut by topK
    rows.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.map(_._3).sum == toks(id).size.toLong,
        s"doc $id: tf sum != token count")
    }
  }
}
