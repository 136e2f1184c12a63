package graft.pipeline

import java.sql.Timestamp

import graft.core.FixtureGen
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The input_hint `pages` row (BASELINE.json): url, warc_ts, html, text,
  * lang. `text` is null at rest — the pipeline's extract stage fills it. */
final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
    text: String, lang: String)

/** Spark-side materialization of the deterministic fixtures.
  *
  * Page generation runs ON THE EXECUTORS: each row derives only from
  * (seed, id) via `spark.range(...).mapPartitions`, so the same table is
  * produced at any parallelism / partition count — that independence is what
  * lets the N vs 4N scaling runs (BASELINE.md) read identical input without
  * shipping 100 TB of fixture files.
  */
object FixtureSpark {

  def pages(spark: SparkSession, n: Long, partitions: Int): Dataset[Page] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).mapPartitions { it =>
      it.map { id =>
        val p = FixtureGen.page(id)
        Page(p.url, new Timestamp(p.warcTsMicros / 1000L), p.html, null,
          p.lang)
      }
    }
  }

  /** Spark-compatible xxhash64(url) % buckets — the SAME function
    * Icebergish.withBucket applies as a Column, evaluated row-side so the
    * generator can TARGET a bucket. (XXH64 with Spark's seed 42 over the
    * UTF8String bytes is exactly what the xxhash64 expression computes
    * for a string column.) */
  private[pipeline] def sparkBucketOf(url: String, buckets: Int): Int = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(url)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    val m = h % buckets
    (if (m < 0) m + buckets else m).toInt
  }

  /** Pages with a SKEWED url-hash bucket distribution: one hot bucket
    * (bucket 0) carries `hotFactor`× the pages of every other bucket —
    * the hub-host pattern (one crawl host dominating a shard) the
    * salting/AQE machinery exists for. Each page id picks a target
    * bucket from the skewed distribution, then the url is nudged with
    * the smallest suffix that lands its ACTUAL Spark hash in that
    * bucket — so Icebergish.withBucket sees real url-hash buckets, the
    * colocated triple write stays shuffle-free, and the whole input is
    * still pure in (seed, id) (identical at any parallelism). */
  def pagesSkewed(spark: SparkSession, n: Long, partitions: Int,
      buckets: Int = 256, hotFactor: Int = 10): Dataset[Page] = {
    import spark.implicits._
    val slots = buckets - 1 + hotFactor
    spark.range(0L, n, 1L, partitions).mapPartitions { it =>
      it.map { id =>
        val p = FixtureGen.page(id)
        val slot = (id % slots).toInt
        val target = if (slot < hotFactor) 0 else slot - hotFactor + 1
        var j = 0
        var url = s"${p.url}?s=$j"
        // expected ~`buckets` probes per page; the cap turns a
        // pathological hash distribution for some url family into a loud
        // failure instead of a hung generator
        while (sparkBucketOf(url, buckets) != target) {
          j += 1
          require(j < 1000000,
            s"bucket probe for ${p.url} did not hit $target in 1e6 tries")
          url = s"${p.url}?s=$j"
        }
        Page(url, new Timestamp(p.warcTsMicros / 1000L), p.html, null,
          p.lang)
      }
    }
  }

  def entities(spark: SparkSession): DataFrame = {
    import spark.implicits._
    FixtureGen.entities().toDF("entity_id", "canonical", "cls")
  }

  def aliases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    FixtureGen.aliases().toDF("alias", "entity_id", "prior")
  }

  /** Synthetic CC graph: 1000-node chains + one star hub of configurable
    * degree (FIXTURES.md `cc_edges`) — exercises both the O(log n)
    * convergence (long chains) and skew handling (hub). */
  def ccEdges(spark: SparkSession, nChains: Int, chainLen: Int,
      hubDegree: Int): DataFrame = {
    import spark.implicits._
    val chainParts = math.max(2, nChains / 8)
    val chains = spark.range(0L, nChains.toLong * chainLen, 1L, chainParts)
      .flatMap { i =>
        val chain = i / chainLen
        val pos = i % chainLen
        if (pos == chainLen - 1) Iterator.empty
        else Iterator((chain * chainLen + pos, chain * chainLen + pos + 1))
      }.toDF("src", "dst")
    val hubBase = nChains.toLong * chainLen
    val hub = spark.range(1L, hubDegree.toLong + 1, 1L, 4)
      .selectExpr(s"CAST($hubBase AS BIGINT) AS src",
        s"CAST($hubBase AS BIGINT) + id AS dst")
    chains.unionByName(hub)
  }
}
