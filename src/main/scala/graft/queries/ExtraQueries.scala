package graft.queries

import graft.core.Conll
import graft.functions.SpanF1
import graft.operators.Salting
import graft.pipeline.{FixtureSpark, KgPipeline}
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second coverage batch (SURVEY.md §2.b rows not yet exercised):
  * null-safe predicates, percent_rank, sliding time windows, approx
  * distinct, map functions, salted join, xxhash64 bucketing, extra string
  * functions, CoNLL export, span-F1 UDAF. */
object ExtraQueries {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "q29_null_safe" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_outer")
        .select(col("c_custkey"), col("o_orderkey"))
        .withColumn("no_order", col("o_orderkey") <=> lit(null))
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n"),
          sum(when(col("no_order"), 1L).otherwise(0L)).as("n_null"))
        .orderBy("c_custkey")),

    "q37_percent_rank" -> ((s, d) =>
      // distributed two-pass percent_rank (no single-partition window over
      // the data — see DistributedRank); oracle is the plain PERCENT_RANK()
      graft.operators.DistributedRank.percentRank(orders(s, d),
          bucket = floor(col("o_totalprice") / 10000.0),
          order = Seq(col("o_totalprice").asc, col("o_orderkey").asc),
          prCol = "pr")
        .select("o_orderkey", "pr")
        .orderBy("o_orderkey")),

    "q38_sliding_window" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "2 hours", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
          .as("win_start"), col("n"))
        .orderBy("win_start")),

    "q39_approx_distinct" -> ((s, d) =>
      // HLL++ sketch: deterministic for fixed input (rows-only check);
      // FunctionsSpec asserts ≤5% relative error vs exact, and q03 is the
      // exact-distinct twin over the SAME inputs (same grouping, same
      // columns) with a full DuckDB oracle — so the sketch's input is
      // oracled even though the sketch itself can't hash-match
      lineitem(s, d).groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"))
        .orderBy("l_returnflag")),

    "q56_map_funcs" -> ((s, d) =>
      events(s, d)
        .withColumn("m", map_from_entries(array(
          struct(lit("k").as("key"),
            get_json_object(col("props"), "$.k").cast("long").as("value")),
          struct(lit("uid").as("key"), col("user_id").as("value")))))
        .select(col("event_id"),
          element_at(col("m"), "k").as("k"),
          size(map_keys(col("m"))).as("n_keys"),
          array_join(map_keys(col("m")), ",").as("keys"))
        .orderBy("event_id")),

    "q57_string_extra" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        trim(col("p_name")).as("trimmed"),
        upper(col("p_brand")).as("ubrand"),
        translate(col("p_type"), "aeiou", "AEIOU").as("xlated"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        split(col("p_type"), " ").getItem(0).as("first_word"))
        .orderBy("p_partkey")),

    "q58_xxhash_bucket" -> ((s, d) =>
      // url-hash bucketing (north_rule partitioning transform); oracled
      // since round 3 by replaying XXH64 in SQL (XxHash64Sql)
      customer(s, d)
        .withColumn("bucket", pmod(xxhash64(col("c_name")), lit(16)))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    "q59_salted_join" -> ((s, d) =>
      // salted equi-join == plain join (oracle is the plain join)
      Salting.saltedJoin(lineitem(s, d), orders(s, d),
          "l_orderkey", "o_orderkey", spreadCol = "l_partkey", factor = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Q.dsum(col("l_quantity")).as("qty"))
        .orderBy("o_orderpriority")),

    "q66_conll_export" -> ((s, d) => {
      val n = if (d.contains("0.1")) 2000L else 400L
      val pages = FixtureSpark.pages(s, n, 32)
      val bc = s.sparkContext.broadcast(KgPipeline.fixtureModel())
      import s.implicits._
      KgPipeline.sentences(pages, bc)
        .groupByKey(_.url)
        .mapGroups { (url, rows) =>
          val sents = rows.toSeq.sortBy(_.sentIdx)
            .map(r => (r.tokens, r.tags))
          (url, Conll.format(url, sents))
        }
        .toDF("url", "conll")
        .select(col("url"), length(col("conll")).as("conll_len"),
          substring(col("conll"), 1, 40).as("head"))
        .orderBy("url")
    }),

    "q67_span_f1" -> ((s, d) => {
      // predicted vs golden mention spans → full outer join → typed UDAF;
      // fixture construction makes P=R=F1=1.0 (asserted in SpanF1Spec)
      val n = if (d.contains("0.1")) 2000L else 400L
      val pages = FixtureSpark.pages(s, n, 32)
      val bc = s.sparkContext.broadcast(KgPipeline.fixtureModel())
      import s.implicits._
      val pred = KgPipeline.mentions(pages, bc).toDF()
        .select(col("url"), col("sentIdx"), col("beginTok"), col("endTok"),
          col("cls")).withColumn("isPred", lit(true))
      val gold = pages.flatMap { p =>
        graft.core.FixtureGen.page(
          p.url.substring(p.url.lastIndexOf('p') + 1).toLong) match {
          case g => g.sentences.flatMap(gs => gs.mentions.map(m =>
            (g.url, m.sentIdx, m.beginTok, m.endTok, m.cls)))
        }
      }.toDF("url", "sentIdx", "beginTok", "endTok", "cls")
        .withColumn("isGold", lit(true))
      val joined = pred.join(gold,
          Seq("url", "sentIdx", "beginTok", "endTok", "cls"), "full_outer")
        .select(coalesce(col("isPred"), lit(false)).as("isPred"),
          coalesce(col("isGold"), lit(false)).as("isGold"))
        .as[SpanF1.SpanFlag]
      joined.select(SpanF1.aggregator.toColumn).toDF()
        .select(col("precision"), col("recall"), col("f1"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Spark's xxhash64 (XXH64, seed 42) replayed bit-exactly in SQL —
    // see XxHash64Sql for the staged-CTE technique
    "q58_xxhash_bucket" ->
      XxHash64Sql.bucketCountSql("customer", "c_name", 16),

    "q29_null_safe" ->
      """SELECT c_custkey, COUNT(*) AS n,
        |CAST(SUM(CASE WHEN o_orderkey IS NOT DISTINCT FROM NULL
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_null
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q37_percent_rank" ->
      """SELECT o_orderkey, PERCENT_RANK() OVER (
        |  ORDER BY o_totalprice ASC, o_orderkey ASC) AS pr
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q38_sliding_window" ->
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
        |  COUNT(*) AS n FROM (
        |  SELECT TIMESTAMP '1970-01-01 00:00:00' + (CAST(floor(
        |    epoch(ts) / 1800) AS BIGINT) - k.k) * 1800 * INTERVAL 1 SECOND
        |    AS ws
        |  FROM events, (VALUES (0), (1), (2), (3)) k(k))
        |GROUP BY ws ORDER BY win_start""".stripMargin,

    "q56_map_funcs" ->
      """SELECT event_id, CAST(props::JSON->>'$.k' AS BIGINT) AS k,
        |2 AS n_keys, 'k,uid' AS keys
        |FROM events ORDER BY event_id""".stripMargin,

    "q57_string_extra" ->
      """SELECT p_partkey, trim(p_name) AS trimmed, upper(p_brand) AS ubrand,
        |translate(p_type, 'aeiou', 'AEIOU') AS xlated,
        |lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |string_split(p_type, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q59_salted_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |${Q.dsumSql("l_quantity")} AS qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
