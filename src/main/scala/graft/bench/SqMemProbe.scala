package graft.bench

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev probe: the MEASURED memory claim behind q108's int8 codes.
  *
  * Caches three shapes of the same embedding relation one at a time
  * (MEMORY_ONLY, deserialized — what an executor actually holds for a
  * resident ANN index) and reports bytes/vector from the block
  * manager's own accounting:
  *   float32  — (id, ARRAY<FLOAT> embedding), the raw input
  *   int64[]  — (id, ARRAY<BIGINT> codes), the shape the HOF-based dot
  *              forced before round 7
  *   binary   — (id, BINARY codes), quantizeCodes' 1-byte/component
  *              blob scored by the codegen'd Int8DotProduct
  *
  * Usage: runMain graft.bench.SqMemProbe [sfDir]
  */
object SqMemProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    val float32 = emb
    val binary =
      Similarity.quantizeCodes(emb, "vec_id", "embedding", "id", "code")
    // the pre-round-7 shape, reconstructed for the comparison: the same
    // codes widened to ARRAY<BIGINT> (what zip_with/aggregate scoring
    // required, since Spark HOFs don't operate on BINARY)
    val int64 = binary.as[(Long, Array[Byte])]
      .map { case (id, code) => (id, code.map(_.toLong)) }
      .toDF("id", "code")

    def cachedBytes(df: DataFrame, name: String): (Long, Long) = {
      val p = df.persist(StorageLevel.MEMORY_ONLY)
      val n = p.count()
      // cached-plan accounting (InMemoryRelation feeds the block
      // manager); sum over this probe's lone cached RDD
      val bytes = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
      p.unpersist(blocking = true)
      (n, bytes)
    }

    // scalastyle:off println
    for ((name, df) <- Seq("float32" -> float32, "int64[]" -> int64,
        "binary" -> binary)) {
      val (n, bytes) = cachedBytes(df, name)
      println(f"[sqmem] $name%-8s rows=$n%7d cached=$bytes%12d bytes " +
        f"(${bytes.toDouble / n}%8.1f bytes/vector)")
    }
    // scalastyle:on println
    spark.stop()
  }
}
