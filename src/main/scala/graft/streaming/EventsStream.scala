package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.9). The production pipeline
  * is resumable BATCH with manifest watermarks (north_rule), but the engine
  * also exposes the streaming form of the same operators: readStream →
  * watermark → windowed agg / dedup-within-watermark → sink.
  */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming tumbling-window counts with a 10-minute watermark. */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .parquet(dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("total"))

  /** Streaming dedup within the watermark. */
  def dedupStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .parquet(dir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * count and max value, maintained in the state store across triggers. */
  def statefulUserCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val ev = spark.readStream.schema(eventSchema).parquet(dir)
      .select(col("user_id"), col("value")).as[(Long, Double)]
    ev.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, mx0) = state.getOption.getOrElse((0L, Double.MinValue))
          var n = n0
          var mx = mx0
          rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
          state.update((n, mx))
          (user, n, mx)
      }
      .toDF("user_id", "n_events", "max_value")
  }

  /** Custom keyed state via flatMapGroupsWithState: a streaming
    * sessionizer. Per user, events extend the open session while the gap
    * stays under 30 minutes; a larger gap CLOSES the session, which is
    * emitted as one output row (0..n rows per group per trigger — the
    * flatMap shape mapGroupsWithState can't express). The open session
    * stays in the state store across triggers. StreamingSpec cross-checks
    * the emitted closed sessions against the batch lag-gap-cumsum
    * sessionization of the same data.
    *
    * Late-data contract: events are time-sorted WITHIN each trigger; an
    * event older than the open session's last timestamp (late across
    * triggers) is DROPPED — the zero-lateness-watermark policy — instead
    * of extending a session backwards in time. Production deployments
    * wanting bounded state and final-session emission should pair this
    * with `withWatermark` + `GroupStateTimeout.EventTimeTimeout`; the
    * NoTimeout form here matches the run-to-completion test harness.
    *
    * SCHEMA BREAK (round 3): the state type changed from
    * (Long, Long, Long) epoch-second tuples to (Double, Double, Long)
    * FRACTIONAL epoch seconds, and the output columns sess_start /
    * sess_end changed LONG → DOUBLE with it (sub-second gaps now compare
    * exactly instead of truncating to whole seconds). Any checkpoint
    * written by the round-2 form is state-schema INCOMPATIBLE — restart
    * such a query from a fresh checkpoint dir — and downstream consumers
    * of the output table see DOUBLE where they saw LONG. */
  def sessionizeStream(spark: SparkSession, dir: String,
      gapSeconds: Double = 1800.0,
      pathGlobFilter: Option[String] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // state = (sessStartEpoch, lastTsEpoch, nEvents); epochs are FRACTIONAL
    // double seconds — the gap compares sub-second precision exactly like
    // the q33 batch idiom (epoch-double difference > gap ⇒ new session), so
    // an 1800.8 s gap splits here too instead of truncating to 1800
    //
    // pathGlobFilter lets a caller stream ONE file out of a directory of
    // tables (the file source requires a directory basePath; a bare file
    // path is rejected with "basePath must be a directory")
    val reader = spark.readStream.schema(eventSchema)
    val withGlob = pathGlobFilter
      .fold(reader)(g => reader.option("pathGlobFilter", g))
    val ev = withGlob.parquet(dir)
      .select(col("user_id"),
        col("ts").cast("timestamp_ltz").cast("double").as("epoch"))
      .as[(Long, Double)]
    ev.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Double, Double, Long)]) =>
          val ts = rows.map(_._2).toArray.sorted
          val closed = Vector.newBuilder[(Long, Double, Double, Long)]
          var cur = state.getOption
          ts.foreach { t =>
            cur match {
              // late across triggers (older than the open session's end):
              // drop, never extend a session backwards
              case Some((_, last, _)) if t < last => ()
              // extend at gap <= gapSeconds, split above — the same rule as
              // the batch lag-gap-cumsum idiom (q33: new_sess when gap > 30m)
              case Some((s0, last, n)) if t - last <= gapSeconds =>
                cur = Some((s0, t, n + 1))
              case Some((s0, last, n)) =>
                closed += ((user, s0, last, n))
                cur = Some((t, t, 1L))
              case None =>
                cur = Some((t, t, 1L))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
      .toDF("user_id", "sess_start", "sess_end", "n_events")
  }

  /** Run a streaming query over a static parquet dir to completion via the
    * memory sink (the local test harness for the streaming operators). */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: String): DataFrame =
    runToMemory(spark, df, name, outputMode, requireSingleBatch = false)

  /** As `runToMemory`; with `requireSingleBatch` the call FAILS unless the
    * source delivered all input in exactly ONE non-empty micro-batch.
    * Callers whose semantics depend on single-trigger consumption (q87's
    * oracle equality: the sessionizer drops cross-trigger late events, the
    * batch oracle never drops) assert the assumption at run time instead
    * of trusting that nobody ever sets maxFilesPerTrigger / lands files
    * mid-run. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      outputMode: String, requireSingleBatch: Boolean): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    if (requireSingleBatch) {
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches == 1,
        s"$name consumed its input in $dataBatches non-empty micro-batches" +
          ", not 1 — the single-trigger assumption (no cross-trigger late" +
          " drops) does not hold; check maxFilesPerTrigger/latestFirst and" +
          " that no files landed mid-run")
    }
    spark.table(name)
  }
}
