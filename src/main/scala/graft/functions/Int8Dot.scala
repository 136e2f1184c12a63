package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: integer dot product of two BINARY columns
  * holding signed int8 vector codes (one byte per component), with full
  * whole-stage codegen.
  *
  * This is the scoring kernel for scalar-quantized ANN (q108): codes
  * materialize at 1 byte/component — the whole point of int8
  * quantization at 100 TB is 4× more vectors per executor than float32
  * and 8× more than the ARRAY<BIGINT> form a HOF-based dot would force
  * (Spark's higher-order functions don't operate on BINARY, and an
  * array<tinyint> zip_with would promote through boxed lambda
  * evaluation anyway). The generated code is one primitive loop over
  * the two byte arrays — no ArrayData indirection, no per-row
  * allocation, SIMD-friendly in shape.
  *
  * Null semantics: null input → null (BinaryExpression default);
  * length mismatch → null, mirroring CosineSimilarity's strictness —
  * scoring a truncated code pair as if the tail were zero would
  * silently rank corrupt rows instead of excluding them.
  *
  * The dot of two length-d int8 vectors is bounded by 127²·d < 2^63
  * for any real d, so LONG arithmetic cannot overflow.
  */
case class Int8DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BINARY arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType

  // length mismatch produces null even when both children are
  // non-nullable — without this the planner could elide the null check
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var dot = 0L
    var i = 0
    while (i < x.length) {
      dot += x(i).toLong * y(i).toLong
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |if ($x.length != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $x.length; $i++) {
         |    $dot += (long) $x[$i] * (long) $y[$i];
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Int8DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "int8_dot"
}

object Int8DotProduct {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(Int8DotProduct(
      Bridge.expression(a), Bridge.expression(b)))
}
