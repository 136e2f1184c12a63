package graft.queries

import graft.operators.Similarity
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search surface over `embeddings` (vec_id, embedding
  * ARRAY<FLOAT>, label). Brute-force cosine carries a DuckDB oracle (same
  * explicit dot/sqrt association + rounding); the ANN paths are checked
  * against brute force in SimilaritySpec (recall), rows-only for the
  * driver. */
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
      // mean-vector per label then cosine of each vector to its label mean:
      // aggregate + higher-order functions, fully codegen'd
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

  val oracles: Map[String, String] = Map(
    "q50_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
        |  FROM embeddings WHERE vec_id < 8),
        |norms AS (
        |  SELECT q.query_id, v.vec_id AS neighbor_id,
        |    list_aggregate(list_transform(list_zip(q.qvec, v.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
        |      AS dot,
        |    list_aggregate(list_transform(q.qvec,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS na,
        |    list_aggregate(list_transform(v.embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS nb
        |  FROM embeddings v, q WHERE v.vec_id <> q.query_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    CASE WHEN na * nb = 0 THEN NULL
        |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM norms),
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
