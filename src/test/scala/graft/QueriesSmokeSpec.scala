package graft

/** Every SparkEntry query must run at sf0.001 and (where it should) return
  * rows; entry() must return rows. The exact-value checks live in the
  * DuckDB oracle path (driver + scripts/check_oracle.py) and the per-
  * operator specs.
  *
  * This suite is also the WHOLE-SURFACE plan regression net (round 4):
  * each per-query test records the post-AQE executed plan, and the final
  * tests pin exactly which queries may contain a scale-killer shape —
  * so ANY future query that plans a cartesian product, an unexpected
  * BroadcastNestedLoopJoin, or a new single-partition funnel fails here
  * with a set diff naming it.
  */
class QueriesSmokeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // queries that can legitimately be empty at sf0.001
  private val mayBeEmpty = Set("q08_join_anti", "q15_except",
    "q44_ngram_jaccard", "q45_minhash_neardup", "q52_embedding_neardup")

  private val plans = scala.collection.mutable.Map.empty[String, String]

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.collect().length.toLong
      if (!mayBeEmpty.contains(name)) assert(n > 0, s"$name returned 0 rows")
      // record the POST-AQE executed plan for the whole-surface net below
      // (collect() above finalizes AQE on this exact DataFrame)
      val plan = df.queryExecution.executedPlan.toString
      plans(name) = plan
      // a non-broadcast cartesian product is never acceptable in ANY query
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      // driver-compat fence (round-6, from the q102 red row): the
      // driver's correctness checker pandas-sorts EVERY query output —
      // including no-oracle entries — and a nested value crashes its
      // canonicalization (`TypeError: unhashable type: 'numpy.ndarray'`).
      // The repo convention is to flatten lists to strings (q72, q102);
      // this assertion turns the whole bug class into a build failure.
      val nested = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
          || f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]
          || f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
          s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(nested.isEmpty,
        s"$name emits nested output column(s) ${nested.mkString(", ")} — " +
          "the driver's checker cannot hash nested values; flatten to a " +
          "string (array_join/concat_ws, q72 convention) or explode")
      // name-uniqueness fence (round-7, from the r6 ADVICE on
      // check_oracle's canon): both the driver's compare and the local
      // checker sort columns BY NAME — with duplicate names the pairing
      // between Spark and oracle columns is positional luck, so a
      // duplicate-named output could pass or fail spuriously. Making
      // duplicates a build failure keeps the name-sort well-defined.
      val dup = df.schema.fieldNames.groupBy(identity)
        .collect { case (n, occ) if occ.length > 1 => n }
      assert(dup.isEmpty,
        s"$name emits duplicate column name(s) ${dup.mkString(", ")} — " +
          "name-sorted oracle comparison is ill-defined on duplicates; " +
          "alias every output column uniquely")
    }
  }

  /** BroadcastNestedLoopJoin is the plan shape of an intentional broadcast
    * CROSS join against a tiny side; anywhere else it means an equi-join
    * key was lost. Exactly these queries carry one by design:
    *   - q36: every event × the broadcast ONE-ROW high-water aggregate
    *   - q50: brute-force scorer — data × broadcast 8-row query set
    *   - q53: IVF assignment — data × broadcast ONE-ROW centroid array
    *     (the probe join is an equi-join on cell_id, not counted here)
    *   - q91: TF-IDF — (doc, term) counts × broadcast ONE-ROW corpus size
    *   - q108: quantized scorer — data × the same broadcast 8-row query
    *     set as q50
    */
  test("BroadcastNestedLoopJoin appears ONLY in the pinned cross-join set") {
    assume(plans.size == SparkEntry.queries.size, "needs all plans recorded")
    val expected = Set("q36_watermark_filter", "q50_cosine_topk",
      "q53_ivf_topk", "q91_tfidf", "q108_quantized_topk")
    val got = plans.filter(_._2.contains("BroadcastNestedLoopJoin"))
      .keySet.toSet
    assert(got == expected,
      s"unexpected BNLJ in: ${(got -- expected).toSeq.sorted}; " +
        s"missing from: ${(expected -- got).toSeq.sorted}")
  }

  /** Exchange SinglePartition is legitimate ONLY when the rows funneled
    * are already aggregate-granularity (one partial row per task) or a
    * provably tiny side table — never the data itself. Each pinned
    * member carries its justification; the test is subsetOf, so a member
    * whose plan improves away simply stops appearing. */
  test("single-partition exchanges appear ONLY in the pinned set") {
    assume(plans.size == SparkEntry.queries.size, "needs all plans recorded")
    // members and why the funnel is aggregate-granularity, not data:
    val expected = Map(
      "q36_watermark_filter" -> "broadcast ONE-ROW max(ts) aggregate",
      "q43_exact_dedup" -> "final global scalar agg over partials",
      "q44_ngram_jaccard" -> "final global scalar agg over partials",
      "q35_ntile_buckets" -> "window over the tiny bucket-count table",
      "q37_percent_rank" -> "window over the tiny bucket-count table",
      "q53_ivf_topk" -> "collect_list of 16 centroids into one row",
      "q51_label_centroid_sim" -> "single-partition agg over 4 label rows",
      "q67_span_f1" -> "global SpanF1 typed-UDAF: one partial per task",
      "q91_tfidf" -> "broadcast ONE-ROW corpus-size count(*) aggregate")
    val got = plans.filter(_._2.contains("Exchange SinglePartition"))
      .keySet.toSet
    assert(got.subsetOf(expected.keySet),
      s"NEW single-partition funnel in: " +
        s"${(got -- expected.keySet).toSeq.sorted} — if the funneled rows " +
        "are aggregate-granularity, pin it here with a justification")
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() returns triples") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
