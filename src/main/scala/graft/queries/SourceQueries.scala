package graft.queries

import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-format coverage (SURVEY.md §2.b scans/sources): csv and
  * json-lines sources exercised as round-trips — a driver table is written
  * to the format, read back with a DECLARED schema, and aggregated; the
  * result equals the direct aggregation, which is the DuckDB oracle.
  * Plus Spark's native session_window (vs q33's lag-gap-cumsum idiom). */
object SourceQueries {
  type QFn = (SparkSession, String) => DataFrame

  /** Round-trip staging dir: keyed by a SHA-256 of the FULL data root
    * (the earlier 32-bit String.hashCode key could still collide across
    * two distinct roots and race one session's overwrite against
    * another's read), swept at JVM exit (these accumulated forever
    * before). */
  private def rootKey(dataRoot: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dataRoot.getBytes("UTF-8"))
    d.take(16).map(b => f"$b%02x").mkString
  }
  private val cleanupInstalled = new java.util.concurrent.atomic.AtomicBoolean
  private def tmpDir(name: String): String = {
    val root = s"${sys.props("java.io.tmpdir")}/graft-sources"
    if (cleanupInstalled.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        graft.core.Fs.deleteRecursively(new java.io.File(root))))
    }
    s"$root/$name"
  }

  val queries: Map[String, QFn] = Map(
    "q68_session_window_native" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"))
        .orderBy("user_id")),

    "q69_csv_roundtrip" -> ((s, d) => {
      val out = tmpDir(s"csv-${rootKey(d)}")
      customer(s, d).write.mode("overwrite").option("header", "true")
        .csv(out)
      s.read.schema("c_custkey LONG, c_name STRING, c_nationkey INT, " +
          "c_acctbal DOUBLE, c_mktsegment STRING")
        .option("header", "true").csv(out)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), Q.dsum(col("c_acctbal")).as("total"))
        .orderBy("c_mktsegment")
    }),

    "q71_math_transcendental" -> ((s, d) =>
      // log/exp/pow score-combination surface. libm implementations
      // differ at the last ulp across engines (measured: ≤ 2.9e-14 abs
      // on ln/pow here), so outputs are rounded to 6 digits for the
      // cross-engine compare — flips only if a value sits within an ulp
      // of a rounding boundary, which the fixed corpus does not.
      //
      // Projection AFTER the sort, deliberately: Spark's round(double)
      // allocates a BigDecimal per value, and a projection below a global
      // orderBy is executed TWICE (the range partitioner's sampling job
      // re-runs the sort's child). Sorting the raw columns first and
      // rounding above the sort computes the expensive projection once —
      // measured 2.7 → 0.9 s at sf0.1 (Q71Probe), identical output.
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(log(col("l_extendedprice") + lit(1.0)), 6).as("log_price"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          round(pow(col("l_quantity"), lit(1.5)), 6).as("qty_pow"))),

    "q70_jsonl_roundtrip" -> ((s, d) => {
      val out = tmpDir(s"json-${rootKey(d)}")
      supplier(s, d).write.mode("overwrite").json(out)
      s.read.schema("s_suppkey LONG, s_name STRING, s_nationkey INT, " +
          "s_acctbal DOUBLE")
        .json(out)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), Q.dsum(col("s_acctbal")).as("total"))
        .orderBy("s_nationkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "q71_math_transcendental" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(ln(l_extendedprice + 1.0), 6) AS log_price,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  round(pow(l_quantity, 1.5), 6) AS qty_pow
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // Spark session_window: a new session starts when the gap since the
    // previous event is >= the gap duration
    "q68_session_window_native" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |      OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC)),
        |s AS (
        |  SELECT user_id,
        |    SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM g),
        |per AS (SELECT user_id, sess_id, COUNT(*) AS n_events
        |  FROM s GROUP BY user_id, sess_id)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  MAX(n_events) AS max_session_events
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q69_csv_roundtrip" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n,
         |${Q.dsumSql("c_acctbal")} AS total
         |FROM customer GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,

    "q70_jsonl_roundtrip" ->
      s"""SELECT s_nationkey, COUNT(*) AS n,
         |${Q.dsumSql("s_acctbal")} AS total
         |FROM supplier GROUP BY s_nationkey
         |ORDER BY s_nationkey""".stripMargin
  )
}
