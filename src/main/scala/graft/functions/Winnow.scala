package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint statistics as ONE native Catalyst expression.
  *
  * The declarative formulation (explode char positions → k-gram hash →
  * sliding-window min → per-doc aggregate, kept as the reference
  * implementation in `TextOps.winnowSelections`) inflates every document
  * into one row per character and pushes them through a window exchange —
  * ~500× row inflation for work that never crosses document boundaries.
  * This expression does the whole per-document computation in a single
  * O(len) pass over the UTF-8 bytes inside whole-stage codegen: the scan
  * stays embarrassingly parallel and the only shuffle left in the query
  * is the final ORDER BY.
  *
  * Semantics are IDENTICAL to the declarative version (asserted in
  * EngineSpec and by the shared DuckDB oracle): polynomial k-gram hash
  * (the value a Rabin-Karp rolling hash computes), window-of-w minimum
  * selection including the partial trailing windows, distinct count and
  * extrema of the selected prints. ASCII corpus assumption: the
  * declarative/DuckDB mirrors read code points while this reads bytes —
  * equal on ASCII (asserted in EngineSpec).
  */
object WinnowImpl {
  final val KgramLen = 8
  final val WinnowWindow = 4
  final val RollBase = 257L
  final val RollMod = 2147483647L // 2^31-1: keeps acc*base+byte < 2^39

  val schema: StructType = StructType(Seq(
    StructField("n_kgrams", LongType, nullable = false),
    StructField("n_fps", LongType, nullable = false),
    StructField("min_fp", LongType, nullable = false),
    StructField("max_fp", LongType, nullable = false)))

  /** Called from both interpreted eval and generated code. Texts shorter
    * than one k-gram yield the all-zero row (callers filter those
    * anyway; never null — defineCodeGen assumes a non-null result for a
    * non-null input). */
  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val nGrams = bytes.length - KgramLen + 1
    if (nGrams <= 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L))
    // k-gram hashes via the true rolling update: drop the leading byte
    // (subtract c * Base^(k-1) mod M), shift, add the trailing byte
    val hs = new Array[Long](nGrams)
    var pow = 1L // Base^(k-1) mod M
    var p = 1
    while (p < KgramLen) { pow = pow * RollBase % RollMod; p += 1 }
    var h = 0L
    var i = 0
    while (i < KgramLen) { h = (h * RollBase + (bytes(i) & 0xffL)) % RollMod; i += 1 }
    hs(0) = h
    var g = 1
    while (g < nGrams) {
      val drop = (bytes(g - 1) & 0xffL) * pow % RollMod
      h = ((h + RollMod - drop) * RollBase + (bytes(g + KgramLen - 1) & 0xffL)) % RollMod
      hs(g) = h
      g += 1
    }
    // window-of-w minimum per position (partial trailing windows kept,
    // matching the ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING frame)
    val seen = new java.util.HashSet[Long]()
    var minFp = Long.MaxValue
    var maxFp = Long.MinValue
    var w = 0
    while (w < nGrams) {
      var m = hs(w)
      var j = w + 1
      val until = math.min(w + WinnowWindow, nGrams)
      while (j < until) { if (hs(j) < m) m = hs(j); j += 1 }
      seen.add(m)
      if (m < minFp) minFp = m
      if (m > maxFp) maxFp = m
      w += 1
    }
    new GenericInternalRow(Array[Any](
      nGrams.toLong, seen.size.toLong, minFp, maxFp))
  }

  /** The DISTINCT selected fingerprint SET, ascending — the per-document
    * output a cross-document fingerprint index joins on (q162). Same
    * O(len) single pass as [[compute]]; sorted so the array value is a
    * pure function of the text (no traversal-order dependence). Texts
    * shorter than one k-gram yield the empty array. */
  def computeFps(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nGrams = bytes.length - KgramLen + 1
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](nGrams)
    var pow = 1L
    var p = 1
    while (p < KgramLen) { pow = pow * RollBase % RollMod; p += 1 }
    var h = 0L
    var i = 0
    while (i < KgramLen) { h = (h * RollBase + (bytes(i) & 0xffL)) % RollMod; i += 1 }
    hs(0) = h
    var g = 1
    while (g < nGrams) {
      val drop = (bytes(g - 1) & 0xffL) * pow % RollMod
      h = ((h + RollMod - drop) * RollBase + (bytes(g + KgramLen - 1) & 0xffL)) % RollMod
      hs(g) = h
      g += 1
    }
    val seen = new java.util.TreeSet[java.lang.Long]()
    var w = 0
    while (w < nGrams) {
      var m = hs(w)
      var j = w + 1
      val until = math.min(w + WinnowWindow, nGrams)
      while (j < until) { if (hs(j) < m) m = hs(j); j += 1 }
      seen.add(m)
      w += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** `winnow_fps(text)` — the sorted distinct selected-fingerprint array. */
case class WinnowFps(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    WinnowImpl.computeFps(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowImpl.computeFps($c)")
  override protected def withNewChildInternal(c: Expression): WinnowFps = copy(c)
  override def prettyName: String = "winnow_fps"
}

/** `winnow_stats(text)` — struct(n_kgrams, n_fps, min_fp, max_fp). */
case class WinnowStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WinnowImpl.schema
  override def nullSafeEval(v: Any): Any =
    WinnowImpl.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowImpl.compute($c)")
  override protected def withNewChildInternal(c: Expression): WinnowStats = copy(c)
  override def prettyName: String = "winnow_stats"
}

object Winnow {
  def winnowStats(c: Column): Column =
    Bridge.column(WinnowStats(Bridge.expression(c)))
  def winnowFps(c: Column): Column =
    Bridge.column(WinnowFps(Bridge.expression(c)))
}
