package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins (north_star: "salting for
  * head entities like wikipedia.org").
  *
  * AQE's skew-join handling splits oversized SMJ partitions at runtime;
  * explicit salting is the plan-independent version: the big (skewed) side
  * gets a deterministic salt derived from a high-cardinality column, the
  * small side is replicated `factor`× so every (key, salt) bucket can
  * join. Result is semantically identical to the unsalted join — tests and
  * the DuckDB oracle assert exactly that.
  */
object Salting {

  /** Join `big` (skewed on `key`) with `small` on big(key) == small(key2).
    * @param spreadCol high-cardinality column on the big side that spreads
    *                  rows of one key across salt buckets */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      smallKey: String, spreadCol: String, factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    // withColumn would silently OVERWRITE a caller's __salt and then drop
    // it from the output — fail fast like the repo's other internal-name
    // guards (DistributedRank)
    Seq(big, small).foreach(df => require(!df.columns.contains("__salt"),
      "input already has a column named '__salt'"))
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(spreadCol)), lit(factor)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(salt_range(factor)))
    salted.join(replicated,
      salted(key) === replicated(smallKey) &&
        salted("__salt") === replicated("__salt"))
      .drop(salted("__salt"))
      .drop(replicated("__salt"))
  }

  private def salt_range(factor: Int): Column =
    sequence(lit(0), lit(factor - 1)).cast("array<int>")
}
