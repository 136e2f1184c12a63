package graft.queries

/** Generates DuckDB SQL that replays Spark's `xxhash64` (XXH64, seed 42)
  * over a sub-32-byte STRING column, bit-exactly.
  *
  * Technique: the hash state is threaded through a chain of tiny CTE
  * stages, each one primitive op (a read, a wrapping multiply, a rotate,
  * an xor) on NAMED columns — referencing names keeps the SQL linear in
  * the number of ops instead of exploding exponentially through nested
  * substitution. Wrapping 64-bit arithmetic runs in HUGEINT mod 2^64 with
  * constants split into 32-bit halves (so no product exceeds INT128);
  * xor drops to signed BIGINT and back. Out-of-range string reads behind
  * the length guards are harmless: DuckDB's s[i] past the end is '' and
  * ascii('') = 0, and the guarded CASE keeps the prior state anyway.
  *
  * Scope: inputs must be < 32 bytes (no stripe loop) — the guard maps
  * longer strings to NULL so a violation surfaces as an oracle mismatch,
  * never as a silently wrong hash. ASCII-only (byte == ascii(char)),
  * like every byte-level oracle in this repo. A NULL input hashes to the
  * seed itself (Spark's hash functions skip null children), mirrored by
  * a final NULL override.
  */
object XxHash64Sql {

  private val M64 = "18446744073709551616::HUGEINT"
  private val Half = "9223372036854775808::HUGEINT"
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def s_(x: String) =
    s"CAST(CASE WHEN $x >= $Half THEN $x - $M64 ELSE $x END AS BIGINT)"
  private def u_(x: String) =
    s"(CASE WHEN $x < 0 THEN $x::HUGEINT + $M64 ELSE $x::HUGEINT END)"
  private def xorU(a: String, b: String) = u_(s"xor(${s_(a)}, ${s_(b)})")
  private def mulc(x: String, c: Long) = {
    val hi = c >>> 32
    val lo = c & 0xffffffffL
    s"(($lo::HUGEINT * $x + (($hi::HUGEINT * $x) % 4294967296::HUGEINT)" +
      s" * 4294967296::HUGEINT) % $M64)"
  }
  private def rotl(x: String, r: Int) =
    s"(((($x * ${1L << r}::HUGEINT) % $M64) + " +
      s"($x // ${1L << (64 - r)}::HUGEINT)) % $M64)"
  private def addc(x: String, c: Long) =
    s"(($x + ${java.lang.Long.toUnsignedString(c)}::HUGEINT) % $M64)"
  private def shr(x: String, r: Int) = s"($x // ${1L << r}::HUGEINT)"
  private def read(pos: String, nBytes: Int) =
    (0 until nBytes).map(j =>
      s"ascii(nm[$pos + $j])::HUGEINT * ${1L << (8 * j)}::HUGEINT")
      .mkString("(", " + ", ")")

  /** The WITH-clause chain attaching `h` = Spark `xxhash64(col)` (signed
    * BIGINT) to every row of `table`, threading `carry` columns through
    * unchanged. Returns (withClauses, finalRelationName) so callers
    * compose their own SELECT — sampling filters, stratified windows, the
    * bucket count below. `carry` names must not collide with the four
    * internal state columns (nm, n, t, h). */
  def hashCte(table: String, col: String,
      carry: Seq[String]): (String, String) = {
    val (list, fin) = hashCtes(table, col, carry, "")
    (s"WITH $list", fin)
  }

  /** Like [[hashCte]] but WITHOUT the leading `WITH`, and with every
    * internal CTE name prefixed — so several hash chains can coexist in
    * ONE query's WITH clause (the random-walk oracle instantiates one
    * chain per walk step; unprefixed, the second chain's `base`/`x0`
    * would collide with the first's). */
  def hashCtes(table: String, col: String, carry: Seq[String],
      prefix: String): (String, String) = {
    // k and hx are stage-scratch columns: they are not in the carry-through
    // list, so a carry with either name would be silently OVERWRITTEN by
    // hash state rather than rejected — guard all six internal names
    require(carry.forall(c =>
        !Seq("nm", "n", "t", "h", "k", "hx").contains(c)),
      s"carry columns collide with hash-state names: $carry")
    val stages = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    def stage(exprs: (String, String)*): Unit = {
      val overridden = exprs.map(_._1).toSet
      val kept =
        (carry ++ Seq("nm", "n", "t", "h")).filterNot(overridden)
      val cols = (kept ++ exprs.map { case (c, e) => s"$e AS $c" })
        .mkString(", ")
      val prev = if (i == 0) s"${prefix}base" else s"${prefix}x${i - 1}"
      stages += s"${prefix}x$i AS (SELECT $cols FROM $prev)"
      i += 1
    }

    val carrySel = carry.map(c => s"$c, ").mkString
    val base =
      s"${prefix}base AS (SELECT $carrySel$col AS nm, strlen($col) AS n, 0 AS t, " +
        s"CASE WHEN strlen($col) < 32 THEN ((42::HUGEINT + " +
        s"${java.lang.Long.toUnsignedString(P5)}::HUGEINT" +
        s" + strlen($col)::HUGEINT) % $M64) END AS h FROM $table)"

    for (b <- 0 until 3) { // ≤ 3 8-byte rounds below the 32-byte stripe
      stage("k" -> read(s"${1 + 8 * b}", 8))
      stage("k" -> mulc("k", P2))
      stage("k" -> rotl("k", 31))
      stage("k" -> mulc("k", P1))
      stage("hx" -> xorU("h", "k"))
      stage("hx" -> rotl("hx", 27))
      stage("hx" -> mulc("hx", P1))
      stage("h" ->
        s"CASE WHEN n >= ${8 * (b + 1)} THEN ${addc("hx", P4)} ELSE h END")
    }
    // one optional 4-byte round, then tail start offset t
    stage("k" -> read("(n // 8) * 8 + 1", 4))
    stage("k" -> mulc("k", P1))
    stage("hx" -> xorU("h", "k"))
    stage("hx" -> rotl("hx", 23))
    stage("hx" -> mulc("hx", P2))
    stage("h" -> s"CASE WHEN n % 8 >= 4 THEN ${addc("hx", P3)} ELSE h END",
      "t" -> "(n // 8) * 8 + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END")
    for (b <- 1 to 3) { // ≤ 3 tail bytes (n % 4 of them)
      stage("k" -> s"ascii(nm[t + $b])::HUGEINT")
      stage("k" -> mulc("k", P5))
      stage("hx" -> xorU("h", "k"))
      stage("hx" -> rotl("hx", 11))
      stage("h" -> s"CASE WHEN n % 4 >= $b THEN ${mulc("hx", P1)} ELSE h END")
    }
    // avalanche
    stage("h" -> xorU("h", shr("h", 33)))
    stage("h" -> mulc("h", P2))
    stage("h" -> xorU("h", shr("h", 29)))
    stage("h" -> mulc("h", P3))
    stage("h" -> xorU("h", shr("h", 32)))
    // xxhash64(NULL) = the seed, unhashed (Spark skips null children)
    stage("h" -> s"CASE WHEN nm IS NULL THEN 42 ELSE ${s_("h")} END")

    // The final stage is MATERIALIZED: a consumer filtering on h (the
    // hash sampler) would otherwise have its predicate pushed down
    // through every projection stage by expression SUBSTITUTION — each
    // stage references the previous h 2–3×, so the rewritten predicate
    // grows ~3^stages and the optimizer hangs (measured: >240 s on 500
    // rows without the barrier, 0.4 s with it). Aggregate/window
    // consumers (bucket counts, stratified rn) were naturally immune —
    // this makes the barrier explicit for every consumer shape.
    stages(stages.length - 1) = stages.last
      .replaceFirst("AS \\(SELECT", "AS MATERIALIZED (SELECT")

    (s"$base,\n" + stages.mkString(",\n"), s"${prefix}x${i - 1}")
  }

  /** `pmod(h, n)` over the signed hash column — Spark's pmod replayed. */
  def pmodSql(expr: String, n: Int): String = s"((($expr) % $n) + $n) % $n"

  /** SQL computing `bucket = pmod(xxhash64(col), nBuckets), n = count(*)`
    * per bucket over `table`, ordered by bucket — Spark's
    * url-hash-bucketing transform replayed for the driver compare. */
  def bucketCountSql(table: String, col: String, nBuckets: Int): String = {
    val (cte, fin) = hashCte(table, col, Nil)
    s"$cte\nSELECT ${pmodSql("h", nBuckets)} AS bucket, " +
      s"COUNT(*) AS n FROM $fin GROUP BY 1 ORDER BY bucket"
  }
}
