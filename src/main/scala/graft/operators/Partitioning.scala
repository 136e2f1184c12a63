package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-ADAPTIVE shuffle-partition sizing for the iterative operators'
  * cached round state (optimization guide §2: derive partitioning from
  * input size — rather than a constant tuned for either local mode or
  * the cluster).
  *
  * Why it exists: the fixpoint operators (CC, PageRank, LPA, BFS, walks,
  * k-core) repartition-and-cache their edge/adjacency state once and then
  * run many small driver-loop rounds against it. Pinning that state to
  * `spark.sql.shuffle.partitions` makes EVERY round launch stages that
  * wide no matter how small the graph is — and per-stage dispatch is the
  * dominant cost of a driver loop (measured on the bench box via
  * DispatchProbe: ~450 ms per one-shuffle job at 32 tasks/stage vs
  * ~150 ms narrow, i.e. ~14 ms per task just to schedule it). AQE cannot
  * help here: it coalesces the REDUCE side of a shuffle, but a cached /
  * checkpointed RDD's partition count is fixed at materialization and
  * every downstream map stage inherits it.
  *
  * The rule: partitions = ceil(estimated bytes / TargetBytesPerPartition),
  * clamped to [1, spark.sql.shuffle.partitions]. The per-partition target
  * is ~1 MiB — deliberately far SMALLER than AQE's 64 MB shuffle
  * advisory, because this state is re-scanned CPU-bound every round: a
  * partition under ~1 MiB costs more to dispatch (~14 ms) than to scan
  * (~1 ms/MiB of cached columnar longs), while anything bigger wants all
  * the cores — measured both ways: sizing the 1M-node GraphBench
  * adjacency (40 MB estimate) near the 64 MB advisory collapsed it to 1–2
  * partitions and DOUBLED the k-core/LPA legs; at the 1 MiB target it
  * lands at the ceiling (32), byte-identical to the round-7 behavior,
  * while the sf-dir graphs (≤ 700 KB estimates) collapse to 1 partition
  * and their per-round stages drop to the narrow-dispatch floor (q110
  * 17.9 s → 2.7 s warm at sf0.1). At corpus scale the estimate exceeds
  * target × conf and the ceiling wins — behavior identical to the old
  * constant. The estimate is Catalyst's plan statistic (file sizes
  * propagated through the plan) — no job is run to obtain it; an unknown
  * estimate falls back to the ceiling, never under-partitioning.
  */
object Partitioning {

  /** ~1 MiB of estimated input per cached-round-state partition: below
    * this a task is dispatch-bound, not compute-bound (DispatchProbe). */
  val TargetBytesPerPartition: Long = 1L << 20

  /** Partition count for repartition-and-cache of `df`, sized from its
    * Catalyst size estimate, clamped to [1, numShufflePartitions]. */
  def adaptiveParts(spark: SparkSession, df: DataFrame): Int = {
    val ceiling = spark.sessionState.conf.numShufflePartitions
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= 0 || est > BigInt(Long.MaxValue)) ceiling
    else {
      val want =
        (est.toLong + TargetBytesPerPartition - 1) / TargetBytesPerPartition
      math.max(1L, math.min(ceiling.toLong, want)).toInt
    }
  }
}
