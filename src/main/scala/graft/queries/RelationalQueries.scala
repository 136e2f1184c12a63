package graft.queries

import graft.queries.Q._
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface over the driver testdata (SURVEY.md §2.b):
  * scans, filters, joins of every flavor, aggregations, windows, set ops,
  * top-k, rollup/cube, salted skew-safe aggregation, as-of and range joins.
  * Every query here has a DuckDB oracle; results are explicitly ordered so
  * hashes are stable.
  */
object RelationalQueries {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "q01_scan_filter_project" -> ((s, d) =>
      lineitem(s, d)
        .where(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber")),

    "q02_agg_pricing_summary" -> ((s, d) =>
      lineitem(s, d).groupBy("l_returnflag", "l_linestatus").agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q03_count_distinct" -> ((s, d) =>
      lineitem(s, d).groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    "q04_join_broadcast" -> ((s, d) =>
      orders(s, d)
        .join(broadcast(customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total"))
        .orderBy("c_mktsegment")),

    "q05_join_sortmerge" -> ((s, d) =>
      lineitem(s, d).hint("merge")
        .join(orders(s, d).hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    "q06_join_left_outer" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")),

    "q07_join_semi" -> ((s, d) =>
      orders(s, d)
        .join(lineitem(s, d).where(col("l_quantity") > 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    "q08_join_anti" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    "q09_window_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d).withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }),

    "q10_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("event_type"),
          coalesce(col("prev_type"), lit("none")).as("prev_type"))
        .orderBy("event_id")
    }),

    "q11_window_rolling" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-3, 0)
      events(s, d)
        .withColumn("rolling_value",
          sum(col("value").cast("decimal(38,6)")).over(w).cast("double"))
        .select("event_id", "user_id", "rolling_value")
        .orderBy("event_id")
    }),

    "q12_global_topk" -> ((s, d) =>
      part(s, d)
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        .limit(10)),

    "q13_group_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d).withColumn("rk", row_number().over(w))
        .where(col("rk") <= 2)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    }),

    "q14_union_all" -> ((s, d) =>
      lineitem(s, d).select(col("l_orderkey").as("k"),
          lit("lineitem").as("side"))
        .unionByName(orders(s, d).select(col("o_orderkey").as("k"),
          lit("orders").as("side")))
        .groupBy("side").agg(count(lit(1)).as("n"),
          countDistinct(col("k")).as("nk"))
        .orderBy("side")),

    "q15_except" -> ((s, d) =>
      part(s, d).select(col("p_partkey").as("k"))
        .except(lineitem(s, d).select(col("l_partkey").as("k")))
        .orderBy("k")),

    "q16_intersect" -> ((s, d) =>
      customer(s, d).select(col("c_custkey").as("k"))
        .intersect(orders(s, d).select(col("o_custkey").as("k")))
        .orderBy("k")),

    "q17_rollup" -> ((s, d) =>
      lineitem(s, d).rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    "q18_cube" -> ((s, d) =>
      orders(s, d).cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    "q19_string_funcs" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        lower(col("c_name")).as("lname"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("prefix"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"))
        .orderBy("c_custkey")),

    "q20_levenshtein" -> ((s, d) =>
      part(s, d).select(col("p_partkey"),
        levenshtein(col("p_brand"), lit("Brand#33")).as("dist"))
        .orderBy("p_partkey")),

    "q21_datetime" -> ((s, d) =>
      orders(s, d).groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("yr", "mo")),

    "q22_math" -> ((s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - lit(0.05)).as("adisc"),
        sqrt(col("l_quantity")).as("sq"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"))
        .orderBy("l_orderkey", "l_linenumber")),

    "q23_case_pivot" -> ((s, d) =>
      orders(s, d).groupBy("o_orderpriority").agg(
        dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(lit(0.0))).as("total_f"),
        dsum(when(col("o_orderstatus") === "O", col("o_totalprice"))
          .otherwise(lit(0.0))).as("total_o"),
        dsum(when(col("o_orderstatus") === "P", col("o_totalprice"))
          .otherwise(lit(0.0))).as("total_p"))
        .orderBy("o_orderpriority")),

    "q24_asof_latest" -> ((s, d) => {
      // as-of join: latest order per customer at/before 1996-01-01
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      orders(s, d)
        .where(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("asof_date"),
          col("o_totalprice"))
        .orderBy("o_custkey")
    }),

    "q25_range_join" -> ((s, d) => {
      // range join bounded by a coarse time-bucket blocking key: a 60 s
      // window can only span two adjacent minute buckets, so the left side
      // explodes into (bucket, bucket+1) and the join becomes an equi-join
      // on (user_id, bucket) with the range predicate as a residual filter.
      // Candidates per (user, minute) are bounded by event density — no
      // quadratic blowup on a skewed user's whole history. Each qualifying
      // pair matches exactly one bucket value (the right side's own), so no
      // dedup is needed and the result equals the plain range join (oracle).
      def minuteBucket(ts: org.apache.spark.sql.Column) =
        floor(ts.cast("timestamp_ltz").cast("double") / 60.0).cast("long")
      val e1 = events(s, d).select(col("event_id").as("a_id"),
          col("user_id"), col("ts").as("a_ts"))
        .withColumn("jb", explode(array(minuteBucket(col("a_ts")),
          minuteBucket(col("a_ts")) + 1L)))
      val e2 = events(s, d).select(col("event_id").as("b_id"),
          col("user_id"), col("ts").as("b_ts"))
        .withColumn("jb", minuteBucket(col("b_ts")))
      e1.join(e2, Seq("user_id", "jb"))
        .where(col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 60 SECONDS"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("pairs"))
        .orderBy("user_id")
    }),

    "q26_salted_agg" -> ((s, d) =>
      // two-phase skew-safe aggregation: salt → partial → final; result is
      // identical to a plain GROUP BY (which is the oracle)
      lineitem(s, d)
        .withColumn("salt", pmod(xxhash64(col("l_orderkey")), lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(sum(col("l_quantity").cast("decimal(38,6)")).as("pq"),
          count(lit(1)).as("pn"))
        .groupBy("l_returnflag")
        .agg(sum(col("pq")).cast("double").as("qty"), sum(col("pn")).as("n"))
        .orderBy("l_returnflag")),

    "q27_grouping_sets" -> ((s, d) =>
      lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    "q28_array_hof" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_words"),
        size(filter(split(col("text"), " "),
          w => length(w) > 4)).as("n_long_words"),
        aggregate(split(col("text"), " "), lit(0L),
          (acc, w) => acc + length(w).cast("long")).as("total_chars"))
        .orderBy("doc_id"))
  )

  val oracles: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_agg_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${dsumSql("l_quantity")} AS sum_qty,
         |${dsumSql("l_extendedprice")} AS sum_base_price,
         |${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |${davgSql("l_quantity")} AS avg_qty,
         |COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q04_join_broadcast" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |${dsumSql("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q05_join_sortmerge" ->
      s"""SELECT o_orderpriority,
         |${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |COUNT(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q06_join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q07_join_semi" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q08_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q09_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q10_window_lag" ->
      """SELECT event_id, user_id, event_type,
        |COALESCE(LAG(event_type, 1) OVER (PARTITION BY user_id
        |  ORDER BY ts ASC, event_id ASC), 'none') AS prev_type
        |FROM events ORDER BY event_id""".stripMargin,

    "q11_window_rolling" ->
      """SELECT event_id, user_id,
        |CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id
        |  ORDER BY ts ASC, event_id ASC
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  AS rolling_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q12_global_topk" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10""".stripMargin,

    "q13_group_topk" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk FROM orders)
        |WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin,

    "q14_union_all" ->
      """SELECT side, COUNT(*) AS n, COUNT(DISTINCT k) AS nk FROM (
        |  SELECT l_orderkey AS k, 'lineitem' AS side FROM lineitem
        |  UNION ALL
        |  SELECT o_orderkey AS k, 'orders' AS side FROM orders)
        |GROUP BY side ORDER BY side""".stripMargin,

    "q15_except" ->
      """SELECT p_partkey AS k FROM part
        |EXCEPT SELECT l_partkey AS k FROM lineitem ORDER BY k""".stripMargin,

    "q16_intersect" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT SELECT o_custkey AS k FROM orders ORDER BY k""".stripMargin,

    "q17_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |${dsumSql("l_quantity")} AS qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST,
         |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q18_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q19_string_funcs" ->
      """SELECT c_custkey, lower(c_name) AS lname, CAST(length(c_name) AS INT) AS name_len,
        |substring(c_name, 1, 8) AS prefix,
        |regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |concat_ws('|', c_mktsegment, c_name) AS joined
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q20_levenshtein" ->
      """SELECT p_partkey, CAST(levenshtein(p_brand, 'Brand#33') AS INT) AS dist
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q21_datetime" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS yr,
         |CAST(month(o_orderdate) AS INT) AS mo, COUNT(*) AS n,
         |${dsumSql("o_totalprice")} AS total
         |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,

    "q22_math" ->
      """SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS adisc,
        |sqrt(l_quantity) AS sq, CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |CAST(ceil(l_extendedprice) AS BIGINT) AS ce
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q23_case_pivot" ->
      s"""SELECT o_orderpriority,
         |${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS total_f,
         |${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END")} AS total_o,
         |${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END")} AS total_p
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "q24_asof_latest" ->
      """SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS asof_date,
        |o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01')
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q25_range_join" ->
      """SELECT e1.user_id AS user_id, COUNT(*) AS pairs
        |FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id
        |  AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 60 SECOND
        |GROUP BY e1.user_id ORDER BY user_id""".stripMargin,

    "q26_salted_agg" ->
      s"""SELECT l_returnflag, ${dsumSql("l_quantity")} AS qty, COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,

    "q27_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q28_array_hof" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |CAST(len(list_filter(string_split(text, ' '),
        |  w -> length(w) > 4)) AS INT) AS n_long_words,
        |CAST(list_aggregate(list_transform(string_split(text, ' '),
        |  w -> CAST(length(w) AS BIGINT)), 'sum') AS BIGINT) AS total_chars
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
