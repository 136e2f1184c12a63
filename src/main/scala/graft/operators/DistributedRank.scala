package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking without a single-partition window.
  *
  * `Window.orderBy(...)` with no partitionBy funnels every row through ONE
  * task — correct at any size, but a scale-killer: at 100× the data that
  * task is the whole job. The classic two-pass replacement:
  *
  *   1. bucket every row by a coarse key that is MONOTONE in the global
  *      sort order (same sort value ⇒ same bucket),
  *   2. count rows per bucket (tiny result: one row per bucket), turn the
  *      counts into exclusive prefix offsets — the only global window runs
  *      over this bucket-count table, never over the data,
  *   3. broadcast-join the offsets back and add a per-bucket
  *      `row_number()`: global_rn = offset(bucket) + rn_within_bucket.
  *
  * From the exact global row number (the order key must be made unique with
  * a tie-breaker column) `percent_rank` and `ntile` follow arithmetically,
  * bit-identical to the built-in single-partition forms — asserted against
  * the DuckDB oracle by q35/q37 and against Spark's own window functions in
  * DistributedRankSpec.
  *
  * The bucket expression is caller-provided (e.g. `floor(price / 10000)`).
  * A fixed-width bucket keys skewed data unevenly; for heavy skew derive
  * bucket bounds from `approxQuantile` instead — the contract here only
  * requires monotonicity.
  */
object DistributedRank {

  /** Adds `rnCol` (1-based global row number over `order`) and `totalCol`
    * (total row count) to `df`. `order` must be a total order (include a
    * unique tie-breaker); `bucket` must be monotone w.r.t. `order`.
    * Precondition: the order/bucket columns are non-null — a null bucket
    * would drop its rows at the offsets equi-join (coalesce nulls to a
    * sentinel bucket first if the data can contain them). */
  def withGlobalRowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
      rnCol: String, totalCol: String): DataFrame = {
    // fail fast instead of silently clobbering a caller column that
    // collides with the internal working names
    Seq("__rank_bucket", "__offset", rnCol, totalCol).foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a column named '$c'")
    }
    val b = df.withColumn("__rank_bucket", bucket)
    // one row per bucket — the single-partition windows below are over this
    // tiny table, not the data
    val counts = b.groupBy("__rank_bucket").agg(count(lit(1)).as("__cnt"))
    val byBucket = Window.orderBy(col("__rank_bucket"))
    val offsets = counts
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(
        byBucket.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(totalCol, sum(col("__cnt")).over(
        byBucket.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("__rank_bucket"), col("__offset"), col(totalCol))
    val within = Window.partitionBy(col("__rank_bucket")).orderBy(order: _*)
    b.join(broadcast(offsets), Seq("__rank_bucket"))
      .withColumn(rnCol,
        col("__offset") + row_number().over(within).cast("long"))
      .drop("__rank_bucket", "__offset")
  }

  /** Distributed `percent_rank()` over a UNIQUE total order: with no ties,
    * rank == row_number, so pr = (rn - 1) / (n - 1) — the same integer
    * ratio both engines evaluate, hence bit-identical doubles. */
  def percentRank(df: DataFrame, bucket: Column, order: Seq[Column],
      prCol: String): DataFrame =
    withGlobalRowNumber(df, bucket, order, "__rank_rn", "__rank_n")
      .withColumn(prCol,
        when(col("__rank_n") > 1,
          (col("__rank_rn") - 1).cast("double") /
            (col("__rank_n") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .drop("__rank_rn", "__rank_n")

  /** Distributed `ntile(k)` over a unique total order. NTILE semantics:
    * with n rows, the first n % k buckets get ceil(n/k) rows, the rest get
    * floor(n/k) — inverted here from the global row number. */
  def ntileBuckets(df: DataFrame, bucket: Column, order: Seq[Column],
      k: Int, ntileCol: String): DataFrame = {
    // k = 0 would NULL every row via % 0 (non-ANSI) instead of erroring
    require(k > 0, s"ntile bucket count must be positive, got $k")
    Seq("__small", "__rem", "__big", ntileCol).foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a column named '$c'")
    }
    // integral floor-division: Spark's `/` on longs is a double Divide
    def fdiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val kL = lit(k.toLong)
    withGlobalRowNumber(df, bucket, order, "__rank_rn", "__rank_n")
      .withColumn("__small", fdiv(col("__rank_n"), kL))
      .withColumn("__rem", col("__rank_n") % kL)
      .withColumn("__big", col("__small") + 1L)
      .withColumn(ntileCol,
        when(col("__rank_rn") <= col("__rem") * col("__big"),
          fdiv(col("__rank_rn") - 1, col("__big")) + 1L)
          .otherwise(col("__rem") +
            fdiv(col("__rank_rn") - 1 - col("__rem") * col("__big"),
              col("__small")) + 1L)
          .cast("int"))
      .drop("__rank_rn", "__rank_n", "__small", "__rem", "__big")
  }
}
