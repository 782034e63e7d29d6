package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve key as a native Catalyst `Expression` — the
  * multi-dimensional data-clustering layout key (Morton 1966; the
  * technique behind Delta/Iceberg Z-ORDER OPTIMIZE, public): bit i of
  * x lands at output bit 2i, bit i of y at 2i+1, so records close in
  * the 2-D (x, y) space land close on the 1-D key — ONE sort/range
  * axis then clusters BOTH dimensions, and a key-range scan prunes on
  * both at once (neither plain sort order can). Spark has no
  * built-in; a Scala UDF would box every row — this expression stays
  * inside WholeStageCodegen as a single static call.
  *
  * The low [[ZOrderImpl.Bits]] = 31 bits of each input are
  * interleaved (output < 2^62, so the sign bit never participates and
  * the BIGINT mirror arithmetic is overflow-free); callers guard
  * their inputs into the window — masking would silently alias far
  * apart keys, the exact failure the key exists to prevent.
  */
object ZOrderImpl {
  /** Per-dimension bit window. 2·31 = 62 keeps the output positive. */
  final val Bits = 31

  /** Called from both interpreted eval and generated code. */
  def compute(x: Long, y: Long): Long = {
    var out = 0L
    var i = 0
    while (i < Bits) {
      out |= ((x >>> i) & 1L) << (2 * i)
      out |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  /** Inverse (de-interleave) — the spec's round-trip proof. */
  def deinterleave(z: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var i = 0
    while (i < Bits) {
      x |= ((z >>> (2 * i)) & 1L) << i
      y |= ((z >>> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }
}

/** `zorder2(x, y)` — 62-bit Morton interleave of two long columns. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderImpl.compute($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "zorder2"
}

object ZOrder {
  /** Column API. */
  def zorder2(x: Column, y: Column): Column =
    Bridge.column(ZOrder2(Bridge.expression(x), Bridge.expression(y)))

  /** DuckDB-SQL mirror of [[ZOrderImpl.compute]], generated from the
    * same bit window so the oracle cannot drift: Σ over the 31 bit
    * positions of exact integer shift arithmetic (BIGINT-safe — the
    * largest weight is 2^61). */
  def sqlExpr(x: String, y: String): String =
    (0 until ZOrderImpl.Bits).flatMap { i =>
      Seq(
        s"((($x // ${1L << i}) % 2) * ${1L << (2 * i)})",
        s"((($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)})")
    }.mkString("(", " + ", ")")
}
