package graft

/** Every SparkEntry query must run at sf0.001 and (where it should) return
  * rows; entry() must return rows. The exact-value checks live in the
  * DuckDB oracle path (driver + scripts/check_oracle.py) and the per-
  * operator specs. */
class QueriesSmokeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // queries that can legitimately be empty at sf0.001
  private val mayBeEmpty = Set("q08_join_anti", "q15_except",
    "q44_ngram_jaccard", "q45_minhash_neardup", "q52_embedding_neardup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty.contains(name)) assert(n > 0, s"$name returned 0 rows")
      // universal plan net: a non-broadcast cartesian product is never
      // acceptable in ANY query (broadcast cross joins against tiny
      // sides plan as BroadcastNestedLoopJoin, which Round3Spec polices
      // per-query); executedPlan is post-AQE after the count above
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() returns triples") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
