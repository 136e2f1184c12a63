package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided testdata tables (TESTDATA.md /
  * FIXTURES.md §A). Parquet carries its own schema; these helpers exist so
  * every query names tables one way and the scan is always a vectorized
  * `FileSourceScanExec` with pushdown-friendly plans.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
