package graft

import graft.pipeline.FixtureSpark
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §3.3 + the builder prompt.
  *
  * `queries` is the full operator surface (SURVEY.md §2): one named entry
  * per operator, reading the driver testdata under the given sf dir (or
  * deterministic generated fixtures for the KG-pipeline stages).
  * `oracleSql` carries the DuckDB-dialect equivalent for every
  * SQL-expressible query; column names/types and row order match the Spark
  * results exactly (see graft.queries.Q for the float-determinism rules).
  */
object SparkEntry {

  /** Flagship: the full KG-construction pipeline (html → text → NER →
    * linking → SVO triples → connected-components canonicalization) on
    * generated Common-Crawl-style pages. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = FixtureSpark.pages(spark, 200L, 8)
    graft.pipeline.KgPipeline.run(spark, pages,
      FixtureSpark.entities(spark), FixtureSpark.aliases(spark)).toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.EmbeddingQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ExtraQueries.queries ++
      graft.queries.SourceQueries.queries ++
      graft.queries.Round2Queries.queries ++
      graft.queries.Round3Queries.queries ++
      graft.queries.Round4Queries.queries ++
      graft.queries.Round5Queries.queries ++
      graft.queries.Round6Queries.queries ++
      graft.queries.Round7Queries.queries

  /** DuckDB equivalents for every SQL-expressible query; omitted keys get
    * the driver's weaker rows-only check (generated-input / fixpoint /
    * signature ops — each of those has an exact ScalaTest spec instead). */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.EmbeddingQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.ExtraQueries.oracles ++
      graft.queries.SourceQueries.oracles ++
      graft.queries.Round2Queries.oracles ++
      graft.queries.Round3Queries.oracles ++
      graft.queries.Round4Queries.oracles ++
      graft.queries.Round5Queries.oracles ++
      graft.queries.Round6Queries.oracles ++
      graft.queries.Round7Queries.oracles
}
