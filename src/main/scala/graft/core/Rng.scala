package graft.core

/** Deterministic splittable PRNG (SplitMix64, public-domain algorithm by
  * Steele/Lea/Flood, "Fast Splittable Pseudorandom Number Generators",
  * OOPSLA'14). Used everywhere instead of `java.util.Random` so fixture
  * generation is reproducible independent of JVM, thread, or partition
  * layout: every row derives its own stream from (seed, rowId).
  */
final class Rng(seed0: Long) {
  private var state: Long = seed0

  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** uniform in [0, n) for n > 0 */
  def nextInt(n: Int): Int = {
    require(n > 0)
    ((nextLong() >>> 1) % n).toInt
  }

  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16

  def pick[A](xs: IndexedSeq[A]): A = xs(nextInt(xs.length))
}

object Rng {
  /** Stable 64-bit mix of (seed, id) — gives each row an independent
    * stream so generation is order- and partition-independent. */
  def forRow(seed: Long, id: Long): Rng = {
    var z = seed ^ (id * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    new Rng(z ^ (z >>> 31))
  }
}
