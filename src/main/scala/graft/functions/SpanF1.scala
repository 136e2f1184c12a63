package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Entity-level P/R/F1 as a typed UDAF (SURVEY.md §2.a R8 — the reference's
  * evaluation metric, CoNLL convention: exact-span match).
  *
  * Input rows are the FULL OUTER JOIN of predicted and gold span sets on
  * the span identity (url, sentIdx, begin, end, cls): each row says whether
  * the span exists on the predicted side, the gold side, or both. The
  * aggregator is a `org.apache.spark.sql.expressions.Aggregator` — partial
  * buffers merge associatively, so the metric computes distributed with
  * map-side combine, no collect.
  */
object SpanF1 {

  /** (isPred, isGold) per span occurrence. */
  final case class SpanFlag(isPred: Boolean, isGold: Boolean)
  /** (true positives, predicted count, gold count) */
  final case class Buf(tp: Long, np: Long, ng: Long)
  final case class Metrics(precision: Double, recall: Double, f1: Double)

  val aggregator: Aggregator[SpanFlag, Buf, Metrics] =
    new Aggregator[SpanFlag, Buf, Metrics] {
      def zero: Buf = Buf(0L, 0L, 0L)
      def reduce(b: Buf, s: SpanFlag): Buf = Buf(
        b.tp + (if (s.isPred && s.isGold) 1L else 0L),
        b.np + (if (s.isPred) 1L else 0L),
        b.ng + (if (s.isGold) 1L else 0L))
      def merge(a: Buf, b: Buf): Buf =
        Buf(a.tp + b.tp, a.np + b.np, a.ng + b.ng)
      def finish(b: Buf): Metrics = {
        val p = if (b.np == 0) 0.0 else b.tp.toDouble / b.np
        val r = if (b.ng == 0) 0.0 else b.tp.toDouble / b.ng
        val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
        Metrics(p, r, f1)
      }
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Metrics] = Encoders.product[Metrics]
    }
}
