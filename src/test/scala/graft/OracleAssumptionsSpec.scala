package graft

/** The byte-level DuckDB oracles (q45/q46/q47 FNV + rolling hashes,
  * q58 XXH64, q65 float block-means) replay JVM byte arithmetic under
  * verified corpus-shape assumptions, and the q44/q45 candidate joins key
  * on 64/32-bit hashes whose oracles join on exact strings/slices. The
  * checks live in main (graft.OracleAssumptions) and run inside
  * Verify.main too, so a regenerated corpus that violates one fails BOTH
  * gates with a named reason instead of a confusing oracle hash mismatch.
  * This spec pins them per testdata dir under sbt test.
  */
class OracleAssumptionsSpec extends SparkTestBase {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  dirs.foreach { d =>
    test(s"oracle corpus-shape assumptions hold at $d") {
      val v = OracleAssumptions.violations(spark, d)
      assert(v.isEmpty, v.mkString("\n"))
    }
  }
}
