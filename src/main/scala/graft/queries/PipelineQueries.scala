package graft.queries

import graft.operators.{ConnectedComponents, Multimodal}
import graft.pipeline.{FixtureSpark, KgPipeline}
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KG-construction pipeline stages exposed as driver queries. These run on
  * the deterministic generated `pages` fixtures (SURVEY.md §3.4 — the
  * reference mount was empty), not on sfDir tables, so they are rows-only
  * for the driver; exact correctness is asserted against the golden plants
  * in KgPipelineSpec. Sized by sfDir so the bench exercises them harder. */
object PipelineQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def nPages(d: String): Long =
    if (d.contains("0.1")) 4000L else if (d.contains("0.01")) 1000L else 300L

  private def model(s: SparkSession) =
    s.sparkContext.broadcast(KgPipeline.fixtureModel())

  private def canon(s: SparkSession) = {
    val canonicalById = graft.core.FixtureGen.entities()
      .map(e => e.entity_id -> e.canonical).toMap
    s.sparkContext.broadcast(
      graft.core.FixtureGen.canonicalComponentMap().map { case (e, c) =>
        e -> canonicalById(c)
      })
  }

  val queries: Map[String, QFn] = Map(
    "q60_pipeline_text" -> ((s, d) => {
      val pages = FixtureSpark.pages(s, nPages(d), 32)
      KgPipeline.extractText(pages).toDF()
        .select(col("url"), length(col("text")).as("text_len"))
        .orderBy("url")
    }),

    "q61_pipeline_mentions" -> ((s, d) => {
      val pages = FixtureSpark.pages(s, nPages(d), 32)
      KgPipeline.mentions(pages, model(s)).toDF()
        .groupBy("cls").agg(count(lit(1)).as("n_mentions"),
          countDistinct(col("entity_id")).as("n_entities"))
        .orderBy("cls")
    }),

    "q62_pipeline_triples" -> ((s, d) => {
      val pages = FixtureSpark.pages(s, nPages(d), 32)
      KgPipeline.triples(pages, model(s), canon(s)).toDF()
        .groupBy("pred").agg(count(lit(1)).as("n"),
          countDistinct(col("subj")).as("n_subj"),
          countDistinct(col("obj")).as("n_obj"))
        .orderBy("pred")
    }),

    "q63_connected_components" -> ((s, d) => {
      val edges = FixtureSpark.ccEdges(s, nChains = 20, chainLen = 50,
        hubDegree = 2000)
      ConnectedComponents.run(s, edges)
        .groupBy("comp").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_components"))
        .orderBy("size")
    }),

    "q64_multimodal_meta" -> ((s, d) => {
      val media = Multimodal.syntheticMedia(documents(s, d))
      Multimodal.decodeMeta(media)
        .groupBy("kind", "channels")
        .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"),
          min(col("width")).as("min_w"), max(col("height")).as("max_h"))
        .orderBy("kind", "channels")
    }),

    "q65_multimodal_features" -> ((s, d) => {
      val media = Multimodal.syntheticMedia(documents(s, d))
      Multimodal.extractFeatures(media, dim = 16)
        .select(col("media_id"),
          round(aggregate(col("features"), lit(0.0),
            (acc, v) => acc + v.cast("double")), 5).as("feature_sum"))
        .orderBy("media_id")
    }),

    "q80_multimodal_resize" -> ((s, d) => {
      // binary→binary resize; output round-trips through decode
      val media = Multimodal.syntheticMedia(documents(s, d))
      Multimodal.decodeMeta(Multimodal.resize(media, 32, 32))
        .groupBy("width", "height", "format")
        .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("total_bytes"))
        .orderBy("format")
    }),

    "q81_frame_sample" -> ((s, d) => {
      // generator over binary payloads: every 4th width-byte frame
      val media = Multimodal.syntheticMedia(documents(s, d))
      Multimodal.frameSample(media, everyK = 4)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame"))).as("frame_bytes"))
        .orderBy("media_id")
    })
  )

  /** rows-only: no SQL equivalents (generated input / fixpoint / stubs). */
  val oracles: Map[String, String] = Map.empty
}
