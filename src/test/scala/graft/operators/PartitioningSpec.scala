package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the adaptive-partitioning contract the iterative operators rely
  * on: tiny cached round state collapses to one partition (per-round
  * stages at the narrow-dispatch floor), sizable state is clamped to the
  * session's shuffle-partition ceiling (bit-identical to the pre-round-8
  * constant at scale), and an unknown estimate falls back to the ceiling
  * rather than under-partitioning. */
class PartitioningSpec extends SparkTestBase {

  test("tiny input collapses to one partition") {
    val df = spark.range(100).select(col("id").as("u"), col("id").as("v"))
    assert(Partitioning.adaptiveParts(spark, df) === 1)
  }

  test("large input clamps to the shuffle-partition ceiling") {
    // range stats: 8 bytes/row × 100M rows ≫ target × ceiling
    val df = spark.range(100000000L).select(col("id").as("u"),
      (col("id") + 1).as("v"))
    assert(Partitioning.adaptiveParts(spark, df) ===
      spark.sessionState.conf.numShufflePartitions)
  }

  test("spreadSmallScan widens a one-split input to the session width " +
      "and leaves rows intact") {
    val df = spark.range(1000).select(col("id").as("doc_id"),
      concat_ws(" ", lit("a"), col("id").cast("string")).as("text"))
    val spread = Partitioning.spreadSmallScan(spark, df)
    assert(spread.rdd.getNumPartitions ===
      spark.sessionState.conf.numShufflePartitions)
    assert(spread.count() === 1000L)
  }

  test("spreadSmallScan is a no-op above the threshold (corpus scale " +
      "must never shuffle payload bytes to spread)") {
    // 8 bytes/row × 100M rows ≫ SpreadThresholdBytes
    val df = spark.range(100000000L).select(col("id").as("doc_id"),
      col("id").cast("string").as("text"))
    val spread = Partitioning.spreadSmallScan(spark, df)
    assert(spread eq df)
  }

  test("mid-size input scales with the ~1 MiB/partition target") {
    val ceiling = spark.sessionState.conf.numShufflePartitions
    // ~16 bytes/row × 300k rows ≈ 4.8 MB estimate → a handful of
    // partitions, strictly between the extremes when the ceiling allows
    val df = spark.range(300000L).select(col("id").as("u"),
      (col("id") + 1).as("v"))
    val p = Partitioning.adaptiveParts(spark, df)
    assert(p >= 1 && p <= ceiling)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = ((est + Partitioning.TargetBytesPerPartition - 1) /
      Partitioning.TargetBytesPerPartition).toInt
    assert(p === math.max(1, math.min(ceiling, want)))
  }
}
