package graft.queries

import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 coverage batch: the §2.b rows the round-1 verdict flagged as
  * missing — collect_list / collect_set / sort_array (sentence-assembly
  * shape), rank / dense_rank (tie semantics differ from row_number, so a
  * real correctness surface), lead, exceptAll (multiset), and
  * array_contains / flatten. All carry DuckDB oracles.
  *
  * Oracle-parity notes: collected lists are serialized with array_join so
  * the compare is over strings (list hashing differs between engines);
  * collect_list order is made deterministic with sort_array — DuckDB's
  * `list(x ORDER BY x)` mirrors it.
  */
object Round2Queries {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "q72_collect_list" -> ((s, d) =>
      // sentence-assembly shape: group → ordered list; collect_set for the
      // distinct variant; sort_array for the deterministic order
      orders(s, d).groupBy("o_custkey").agg(
        array_join(sort_array(collect_list(col("o_orderpriority"))), ",")
          .as("prios"),
        array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
        count(lit(1)).as("n"))
        .orderBy("o_custkey")),

    "q73_rank_dense_rank" -> ((s, d) => {
      // ties by design: l_quantity is integral, so rank skips and
      // dense_rank doesn't — the semantics row_number can't exhibit
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_quantity").desc)
      lineitem(s, d)
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .select("l_orderkey", "l_linenumber", "l_quantity", "rnk", "drnk")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q74_window_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("event_type"),
          coalesce(col("next_type"), lit("none")).as("next_type"))
        .orderBy("event_id")
    }),

    "q75_except_all" -> ((s, d) =>
      // multiset difference: an order key with n lineitems and one orders
      // row survives n-1 times (set-semantics except would drop it)
      lineitem(s, d).select(col("l_orderkey").as("k"))
        .exceptAll(orders(s, d).select(col("o_orderkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")),

    "q76_array_contains_flatten" -> ((s, d) => {
      val w = split(col("text"), " ")
      documents(s, d).select(
        col("doc_id"),
        array_contains(w, "the").as("has_the"),
        array_join(flatten(array(slice(w, 1, 3), slice(w, 4, 3))), " ")
          .as("first6"))
        .orderBy("doc_id")
    }),

    "q77_intersect_all" -> ((s, d) =>
      // multiset intersect: per order key, min(total lines, lines with
      // qty > 25) occurrences survive — set-semantics intersect would
      // collapse them to one
      lineitem(s, d).select(col("l_orderkey").as("k"))
        .intersectAll(lineitem(s, d).where(col("l_quantity") > 25)
          .select(col("l_orderkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")),

    "q78_pivot" -> ((s, d) =>
      // native relational pivot (q23 builds the same shape by hand with
      // CASE); absent (priority, status) combos are null on both engines
      orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(Q.dsum(col("o_totalprice")))
        .orderBy("o_orderpriority")),

    "q79_to_json" -> ((s, d) =>
      // to_json closes the §2.b json-function row (get_json_object and
      // from_json are q30/q31); long/string fields only — both engines
      // serialize those identically (doubles would format differently)
      events(s, d).select(col("event_id"),
        to_json(struct(col("event_id"), col("event_type"))).as("j"))
        .orderBy("event_id")),

    "q82_sql_text" -> ((s, d) => {
      // the SQL-text surface: the same Catalyst engine behind the
      // DataFrame DSL, driven by spark.sql over registered views — a user
      // of the engine can run plain SQL strings
      orders(s, d).createOrReplaceTempView("orders_v")
      customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
              |CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
              |  AS total
              |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
              |WHERE o_orderstatus = 'O'
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    }),

    "q83_percentile" -> ((s, d) =>
      // exact (sort-based) continuous percentile; quantity is integral so
      // the interpolated values are exactly representable in both engines
      lineitem(s, d).groupBy("l_returnflag").agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"))
        .orderBy("l_returnflag")),

    "q84_first_last_nth" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, d).select(
        col("event_id"), col("user_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        coalesce(nth_value(col("event_type"), 2).over(w), lit("none"))
          .as("second_type"))
        .orderBy("event_id")
    }),

    "q85_datetrunc_parse" -> ((s, d) =>
      // string-log ingest shape: timestamps arrive as strings, get parsed
      // with to_timestamp, and roll up by date_trunc'd day
      events(s, d)
        .withColumn("ts_str",
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("parsed",
          to_timestamp(col("ts_str"), "yyyy-MM-dd HH:mm:ss"))
        .groupBy(date_format(date_trunc("day", col("parsed")), "yyyy-MM-dd")
          .as("day"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          unix_timestamp(max(col("parsed"))).as("last_epoch"))
        .orderBy("day")),

    "q86_tpch_q5_shape" -> ((s, d) =>
      // the classic 6-table analytical join (TPC-H Q5 shape): two fact
      // joins sort-merge/shuffle, three dimension joins broadcast, filters
      // pushed into the scans, AQE free to re-plan at runtime — also the
      // only query that exercises the nation/region driver tables
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("n_name")
        .agg(Q.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("revenue").desc, col("n_name").asc))
  )

  val oracles: Map[String, String] = Map(
    "q72_collect_list" ->
      """SELECT o_custkey,
        |array_to_string(list(o_orderpriority ORDER BY o_orderpriority),
        |  ',') AS prios,
        |array_to_string(list(DISTINCT o_orderstatus ORDER BY o_orderstatus),
        |  ',') AS statuses,
        |COUNT(*) AS n
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q73_rank_dense_rank" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |CAST(RANK() OVER w AS INT) AS rnk,
        |CAST(DENSE_RANK() OVER w AS INT) AS drnk
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity DESC)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q74_window_lead" ->
      """SELECT event_id, user_id, event_type,
        |COALESCE(LEAD(event_type, 1) OVER (PARTITION BY user_id
        |  ORDER BY ts ASC, event_id ASC), 'none') AS next_type
        |FROM events ORDER BY event_id""".stripMargin,

    "q75_except_all" ->
      """SELECT k, COUNT(*) AS n FROM (
        |  SELECT l_orderkey AS k FROM lineitem
        |  EXCEPT ALL
        |  SELECT o_orderkey AS k FROM orders)
        |GROUP BY k ORDER BY k""".stripMargin,

    "q76_array_contains_flatten" ->
      """SELECT doc_id,
        |list_contains(string_split(text, ' '), 'the') AS has_the,
        |array_to_string(flatten([string_split(text, ' ')[1:3],
        |  string_split(text, ' ')[4:6]]), ' ') AS first6
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q77_intersect_all" ->
      """SELECT k, COUNT(*) AS n FROM (
        |  SELECT l_orderkey AS k FROM lineitem
        |  INTERSECT ALL
        |  SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 25)
        |GROUP BY k ORDER BY k""".stripMargin,

    "q78_pivot" ->
      s"""SELECT o_orderpriority,
         |${Q.dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS "F",
         |${Q.dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS "O",
         |${Q.dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS "P"
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "q79_to_json" ->
      """SELECT event_id,
        |to_json(struct_pack(event_id := event_id,
        |  event_type := event_type)) AS j
        |FROM events ORDER BY event_id""".stripMargin,

    "q82_sql_text" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q83_percentile" ->
      """SELECT l_returnflag,
        |quantile_cont(l_quantity, 0.25) AS p25,
        |quantile_cont(l_quantity, 0.5) AS p50,
        |quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q84_first_last_nth" ->
      """SELECT event_id, user_id,
        |FIRST_VALUE(event_type) OVER w AS first_type,
        |LAST_VALUE(event_type) OVER w AS last_type,
        |COALESCE(NTH_VALUE(event_type, 2) OVER w, 'none') AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "q85_datetrunc_parse" ->
      """SELECT strftime(date_trunc('day', parsed), '%Y-%m-%d') AS day,
        |COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
        |CAST(floor(epoch(MAX(parsed))) AS BIGINT) AS last_epoch
        |FROM (SELECT strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
        |  '%Y-%m-%d %H:%M:%S') AS parsed, user_id FROM events)
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q86_tpch_q5_shape" ->
      s"""SELECT n_name,
         |${Q.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |COUNT(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |  AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name ASC""".stripMargin
  )
}
