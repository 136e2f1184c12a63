package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-ADAPTIVE shuffle-partition sizing for the iterative operators'
  * cached round state (optimization guide §2: derive partitioning from
  * input size — AQE advisory sizing — rather than a constant tuned for
  * either local mode or the cluster).
  *
  * Why it exists: the fixpoint operators (CC, PageRank, LPA, BFS, walks,
  * k-core) repartition-and-cache their edge/adjacency state once and then
  * run many small driver-loop rounds against it. Pinning that state to
  * `spark.sql.shuffle.partitions` makes EVERY round launch stages that
  * wide no matter how small the graph is — and per-stage dispatch is the
  * dominant cost of a driver loop (measured on the bench box via
  * DispatchProbe: ~450 ms per one-shuffle job at 32 tasks/stage vs
  * ~150 ms narrow). AQE cannot help here: it coalesces the REDUCE side of
  * a shuffle, but a cached/checkpointed RDD's partition count is fixed at
  * materialization and every downstream map stage inherits it.
  *
  * The rule mirrors AQE's own coalescing: partitions = ceil(estimated
  * bytes / advisoryPartitionSizeInBytes), clamped to [1,
  * spark.sql.shuffle.partitions]. At corpus scale the estimate exceeds
  * advisory × conf and the ceiling wins — behavior identical to the old
  * constant; on a small graph the state lands in few partitions and each
  * round's stages collapse to the narrow-dispatch cost. The estimate is
  * Catalyst's plan statistic (file sizes propagated through the plan) —
  * no job is run to obtain it; an unknown estimate falls back to the
  * ceiling, never under-partitioning.
  */
object Partitioning {

  /** Partition count for repartition-and-cache of `df`, sized from its
    * Catalyst size estimate against the AQE advisory partition size,
    * clamped to [1, numShufflePartitions]. */
  def adaptiveParts(spark: SparkSession, df: DataFrame): Int = {
    val conf = spark.sessionState.conf
    val ceiling = conf.numShufflePartitions
    val advisory = math.max(1L, conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= 0 || est > BigInt(Long.MaxValue)) ceiling
    else {
      val want = (est.toLong + advisory - 1) / advisory
      math.max(1L, math.min(ceiling.toLong, want)).toInt
    }
  }
}
