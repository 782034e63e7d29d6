package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd folds over embedding arrays.
  *
  * The declarative versions (`aggregate(zip_with(...))`) are
  * `CodegenFallback` expressions in Spark: every row pays interpreted
  * lambda dispatch plus an intermediate products array, and the
  * enclosing operator drops out of whole-stage codegen. In the ANN /
  * clustering queries the fold sits inside a corpus × centroid-relation
  * join, so it is THE hot path. These expressions evaluate the same
  * fold as a tight primitive loop inside generated code.
  *
  * Determinism contract (README "Cross-engine determinism rules"):
  * the accumulation is double, left-to-right in element order, each
  * element cast to double before multiplying — the exact arithmetic of
  * the HOF versions they replace and of the DuckDB
  * `list_sum(list_transform(...))` mirrors, so every downstream cosine
  * is bit-identical. float→double widening is exact; only the
  * (unchanged) SUM ORDER affects the result.
  *
  * Length mismatches / null elements throw rather than guess — an
  * embedding corpus with ragged rows is corrupt input, and at 100 TB a
  * silent null is far costlier than a loud abort.
  */
object VecFoldImpl {
  private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_dot: length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      require(!a.isNullAt(i) && !b.isNullAt(i), "vec_dot: null element")
      acc += get(a, i, aF) * get(b, i, bF)
      i += 1
    }
    acc
  }

  /** Σᵢ floor((aᵢ−bᵢ)²·scale + 0.5) as a long — the gridded squared
    * distance of the outlier/centroid queries: each term is floored to
    * an integer BEFORE the cross-dim sum, so the total is
    * order-independent (README grid discipline). Identical arithmetic
    * to the per-dim `floor(diff*diff*scale+0.5)` column chain it
    * replaces. */
  def dist2Grid(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean,
      scale: Double): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_dist2_grid: length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      require(!a.isNullAt(i) && !b.isNullAt(i), "vec_dist2_grid: null element")
      val diff = get(a, i, aF) - get(b, i, bF)
      acc += Math.floor(diff * diff * scale + 0.5).toLong
      i += 1
    }
    acc
  }

  def normSq(a: ArrayData, aF: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      require(!a.isNullAt(i), "vec_norm_sq: null element")
      val x = get(a, i, aF)
      acc += x * x
      i += 1
    }
    acc
  }
}

private object VecFold {
  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vector fold expects array<float|double>, got $other")
  }
}

/** `vec_dot(a, b)` — Σ aᵢ·bᵢ, double accumulator, element order. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val aF = VecFold.isFloatArray(left.dataType)
  private lazy val bF = VecFold.isFloatArray(right.dataType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecFoldImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecFoldImpl.dot($a, $b, $aF, $bF)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** `vec_dist2_grid(a, b)` — Σᵢ floor((aᵢ−bᵢ)²·scale + 0.5), LongType. */
case class VecDist2Grid(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression {
  private lazy val aF = VecFold.isFloatArray(left.dataType)
  private lazy val bF = VecFold.isFloatArray(right.dataType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecFoldImpl.dist2Grid(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecFoldImpl.dist2Grid($a, $b, $aF, $bF, ${scale}D)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDist2Grid =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dist2_grid"
}

/** `vec_norm_sq(a)` — Σ aᵢ², double accumulator, element order. */
case class VecNormSq(child: Expression) extends UnaryExpression {
  private lazy val aF = VecFold.isFloatArray(child.dataType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    VecFoldImpl.normSq(a.asInstanceOf[ArrayData], aF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecFoldImpl.normSq($a, $aF)")
  override protected def withNewChildInternal(c: Expression): VecNormSq = copy(c)
  override def prettyName: String = "vec_norm_sq"
}
