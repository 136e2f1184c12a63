package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Streaming analog of the corpus heavy-hitter sketch (SURVEY.md §2.9 ×
  * the Sketches operator family): capacity-bounded frequency state over
  * an unbounded document stream.
  *
  * Shape: tokens are SHARDED by pmod(xxhash64(word), nShards) — each
  * word lives in exactly ONE shard for the stream's lifetime — and each
  * shard maintains one Space-Saving summary in the state store via
  * mapGroupsWithState. State is bounded at nShards × capacity counters
  * regardless of stream length or vocabulary growth — the property that
  * makes a heavy-hitter stream viable where per-word keyed state
  * (groupBy(word).count) grows with the unbounded vocabulary. Because
  * shards partition the KEY SPACE, the union of shard summaries is a
  * sharded Space-Saving: per-item bounds hold with shard-local error,
  * and when no shard ever evicts (shard vocab ≤ capacity — implied by
  * the corpus-level pin in OracleAssumptions) the union IS the exact
  * count table, which licenses q107's DuckDB oracle (the q103 argument,
  * streamed).
  *
  * Each trigger emits every updated shard's FULL summary plus a
  * monotone `ver` (total estimated mass, strictly increasing per
  * non-empty trigger), so a reader takes the max-ver row per shard —
  * correct for ANY trigger count: unlike q87's sessionizer there is no
  * late-data drop contract, state simply accumulates, so multi-batch
  * delivery changes nothing (pinned by StreamingSpec's two-trigger
  * equality test).
  */
object DocsStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming (shard, ver, counters) summaries; see object scaladoc.
    * `counters` rows are (word, est, err) in (est desc, word asc)
    * order. Update output mode. */
  def heavyHittersStream(spark: SparkSession, dir: String,
      pathGlobFilter: Option[String], capacity: Int,
      nShards: Int): DataFrame = {
    import spark.implicits._
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // Space-Saving state rides the state store via java serialization
    // (same wire format treeReduce uses; the @transient index is
    // rebuilt on first access after each restore)
    implicit val ssEnc: Encoder[Sketches.SpaceSaving] =
      Encoders.javaSerialization[Sketches.SpaceSaving]
    val rd0 = spark.readStream.schema(docSchema)
    val rd = pathGlobFilter.fold(rd0)(g => rd0.option("pathGlobFilter", g))
    rd.parquet(dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .select(col("w"), pmod(xxhash64(col("w")), lit(nShards)).as("shard"))
      .as[(String, Long)]
      .groupByKey(_._2)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[(String, Long)],
         state: GroupState[Sketches.SpaceSaving]) =>
          val s = state.getOption
            .getOrElse(new Sketches.SpaceSaving(capacity))
          rows.foreach { case (w, _) => s.add(w) }
          state.update(s)
          val cs = s.topK(capacity)
          (shard, cs.iterator.map(_._2).sum, cs)
      }
      .toDF("shard", "ver", "counters")
  }

  /** Reader for [[heavyHittersStream]] output: keep each shard's NEWEST
    * emission (max ver — correct at any trigger count) and flatten its
    * summary to (word, cnt, err) rows. The single implementation of the
    * emission contract — query and specs all read through here. */
  def latestShardCounters(tbl: DataFrame): DataFrame =
    tbl.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("ver").desc)))
      .where(col("rn") === 1)
      .select(explode(col("counters")).as("c"))
      .select(col("c._1").as("word"), col("c._2").as("cnt"),
        col("c._3").as("err"))
}
