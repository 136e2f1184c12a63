package graft.bench

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for the named queries and flag
  * plan smells (missing pushdown, unexpected exchanges, codegen gaps).
  * Usage: runMain graft.bench.PlanAudit [queryName ...]  (default: audit set)
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_scan_filter_project", "q02_agg_pricing_summary",
      "q04_join_broadcast", "q05_join_sortmerge", "q09_window_topn",
      "q24_asof_latest", "q25_range_join", "q44_ngram_jaccard",
      "q50_cosine_topk")
    val sf = "/root/testdata/sf0.001"
    names.foreach { n =>
      // scalastyle:off println
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sf)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      // scalastyle:on println
    }
    spark.stop()
  }
}
