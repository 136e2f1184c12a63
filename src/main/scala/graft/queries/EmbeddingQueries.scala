package graft.queries

import graft.operators.Similarity
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search surface over `embeddings` (vec_id, embedding
  * ARRAY<FLOAT>, label). Every entry carries a DuckDB oracle since
  * round 3: brute-force and IVF replay the same cosine/argmax/top-k
  * semantics in SQL, and the sign-LSH near-dup embeds its deterministic
  * hyperplanes as DOUBLE[] literals; the ANN paths are additionally
  * recall-checked against brute force in the specs. */
object EmbeddingQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def queryVectors(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).where(col("vec_id") < 8)

  val queries: Map[String, QFn] = Map(
    "q50_cosine_topk" -> ((s, d) =>
      Similarity.bruteForceTopK(embeddings(s, d), queryVectors(s, d),
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rk"), col("neighbor_id"),
          round(col("cos"), 6).as("cos_r"))
        .orderBy("query_id", "rk")),

    "q51_label_centroid_sim" -> ((s, d) =>
      // per-label count + exact sum of squared norms via the aggregate()
      // higher-order function, fully codegen'd. NOTE the name oversells
      // it: no centroid/cosine is computed here (kept for driver-history
      // continuity) — the cosine surface lives in q50/q52/q53 and the
      // native CosineSimilarity Expression
      embeddings(s, d)
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          Q.dsum(aggregate(col("embedding"), lit(0.0),
            (acc, v) => acc + v.cast("double") * v.cast("double")))
            .as("sum_sqnorm"))
        .orderBy("label")),

    "q52_embedding_neardup" -> ((s, d) =>
      Similarity.embeddingNearDups(embeddings(s, d), "vec_id", "embedding",
          nBits = 12, dim = 64, threshold = 0.2)
        .select(col("a"), col("b"), round(col("cos"), 6).as("cos_r"))
        .orderBy("a", "b")),

    "q53_ivf_topk" -> ((s, d) =>
      Similarity.ivfTopK(embeddings(s, d), queryVectors(s, d), "vec_id",
          "embedding", nCells = 16, nProbe = 4, k = 5)
        .select(col("query_id"), col("rk"), col("neighbor_id"),
          round(col("cos"), 6).as("cos_r"))
        .orderBy("query_id", "rk"))
  )

  /** The DuckDB mirror of Similarity.cosine / the native expression: same
    * dot/sqrt association, same zero-norm→NULL guard — proven bit-exact by
    * q50 since round 1. */
  private def cosSql(a: String, b: String): String = {
    def sq(v: String) =
      s"list_aggregate(list_transform($v, x -> CAST(x AS DOUBLE) * " +
        "CAST(x AS DOUBLE)), 'sum')"
    val dot = s"list_aggregate(list_transform(list_zip($a, $b), " +
      "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
    s"CASE WHEN ${sq(a)} * ${sq(b)} = 0 THEN NULL " +
      s"ELSE $dot / (sqrt(${sq(a)}) * sqrt(${sq(b)})) END"
  }

  /** q52's hyperplanes, regenerated from the SAME seeded Rng stream as
    * Similarity.planes (SplitMix64, seed 0x91239876, nBits=12 × dim=64)
    * and embedded as DOUBLE[] literals — Double.toString round-trips, so
    * DuckDB parses bit-identical planes and the sign tests agree. */
  private def q52Planes: Seq[Seq[Double]] = {
    val rng = new graft.core.Rng(0x91239876L)
    Seq.fill(12)(Seq.fill(64)(rng.nextDouble() * 2.0 - 1.0))
  }

  val oracles: Map[String, String] = Map(
    // sign-LSH near-dup in SQL: bucket = 12 hyperplane sign bits (dot
    // products in the same double-summation order as the typed map),
    // bucket equi-join, exact-cosine verify — the full operator replayed
    "q52_embedding_neardup" -> {
      val planes = q52Planes
      def planeDot(b: Int): String = {
        val lit = planes(b).mkString("[", ",", "]::DOUBLE[]")
        s"list_aggregate(list_transform(list_zip($lit, embedding), " +
          "p -> p[1] * CAST(p[2] AS DOUBLE)), 'sum')"
      }
      val bucket = (0 until 12).map(b =>
        s"(CASE WHEN ${planeDot(b)} >= 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH buckets AS (
         |  SELECT vec_id, embedding, $bucket AS bucket FROM embeddings)
         |SELECT a, b, round(cos, 6) AS cos_r FROM (
         |  SELECT l.vec_id AS a, r.vec_id AS b,
         |    ${cosSql("l.embedding", "r.embedding")} AS cos
         |  FROM buckets l JOIN buckets r
         |    ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
         |WHERE cos >= 0.2 ORDER BY a, b""".stripMargin
    },

    // the full IVF path in SQL: same deterministic centroids (lowest-id
    // vectors), same assignment argmax (sim DESC NULLS LAST, cell_id ASC
    // == the fold's first-wins tie-break), same probe/top-k semantics
    "q53_ivf_topk" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cell_id, embedding AS cvec FROM embeddings
         |  ORDER BY vec_id ASC LIMIT 16),
         |assigned AS (
         |  SELECT vec_id, embedding, cell_id FROM (
         |    SELECT v.vec_id, v.embedding, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${cosSql("v.embedding", "c.cvec")}
         |          DESC NULLS LAST, c.cell_id ASC) AS rk
         |    FROM embeddings v, cents c)
         |  WHERE rk = 1),
         |probes AS (
         |  SELECT query_id, qvec, cell_id FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.embedding", "c.cvec")}
         |          DESC NULLS LAST, c.cell_id ASC) AS rk
         |    FROM embeddings q, cents c WHERE q.vec_id < 8)
         |  WHERE rk <= 4),
         |scored AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id,
         |    ${cosSql("p.qvec", "a.embedding")} AS cos
         |  FROM probes p JOIN assigned a USING (cell_id)
         |  WHERE a.vec_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id
         |    ORDER BY cos DESC NULLS LAST, neighbor_id ASC) AS rk
         |  FROM scored)
         |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id,
         |  round(cos, 6) AS cos_r
         |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    // expressed via cosSql so every cosine oracle in this file shares ONE
    // representation of the dot/sqrt association and zero-norm guard
    "q50_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
         |  FROM embeddings WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.query_id, v.vec_id AS neighbor_id,
         |    ${cosSql("q.qvec", "v.embedding")} AS cos
         |  FROM embeddings v, q WHERE v.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos, ROW_NUMBER() OVER (
         |    PARTITION BY query_id
         |    ORDER BY cos DESC NULLS LAST, neighbor_id ASC) AS rk
         |  FROM scored)
         |SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id,
         |  round(cos, 6) AS cos_r
         |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,

    "q51_label_centroid_sim" ->
      s"""SELECT label, COUNT(*) AS n,
         |${Q.dsumSql("list_aggregate(list_transform(embedding, " +
           "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')")}
         | AS sum_sqnorm
         |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
  )
}
