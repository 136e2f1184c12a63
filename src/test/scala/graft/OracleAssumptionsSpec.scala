package graft

import org.apache.spark.sql.functions._

/** The byte-level DuckDB oracles (q45/q46/q47 FNV + rolling hashes,
  * q58 XXH64, q65 float block-means) replay JVM byte arithmetic under
  * verified corpus-shape assumptions. This spec pins those assumptions
  * to the driver testdata itself, so a regenerated corpus that violates
  * one fails HERE with a named reason instead of surfacing as a
  * confusing oracle hash mismatch.
  */
class OracleAssumptionsSpec extends SparkTestBase {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  test("documents.text is printable ASCII — byte == ascii(char)") {
    for (d <- dirs) {
      val bad = spark.read.parquet(s"$d/documents.parquet")
        .where(!col("text").rlike("^[\\x20-\\x7e]*$"))
        .count()
      assert(bad == 0, s"$d: $bad non-printable-ASCII docs — the q46/q47/" +
        "q65 byte-level oracles assume ascii(char) == UTF-8 byte")
    }
  }

  test("documents.text has no leading/trailing/double spaces") {
    for (d <- dirs) {
      val bad = spark.read.parquet(s"$d/documents.parquet")
        .where(col("text").startsWith(" ") || col("text").endsWith(" ") ||
          col("text").contains("  "))
        .count()
      assert(bad == 0, s"$d: $bad docs with irregular spacing — Java's " +
        "split(' ') drops trailing empties while DuckDB string_split " +
        "keeps them (q45/q46 oracles)")
    }
  }

  test("customer.c_name is non-null and under 32 bytes") {
    for (d <- dirs) {
      val bad = spark.read.parquet(s"$d/customer.parquet")
        .where(col("c_name").isNull || length(col("c_name")) >= 32 ||
          !col("c_name").rlike("^[\\x20-\\x7e]*$"))
        .count()
      assert(bad == 0, s"$d: $bad c_name values outside the q58 XXH64 " +
        "oracle's sub-32-byte ASCII scope (the SQL would NULL-poison " +
        "them, which is the intended loud failure — but fix the data " +
        "assumption here first)")
    }
  }

  test("embeddings are 64-dim (q52's embedded hyperplanes assume dim 64)") {
    for (d <- dirs) {
      val bad = spark.read.parquet(s"$d/embeddings.parquet")
        .where(size(col("embedding")) =!= 64)
        .count()
      assert(bad == 0, s"$d: $bad non-64-dim embeddings")
    }
  }
}
