package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash document fingerprinting as a native Catalyst `Expression`
  * (SURVEY.md §7.3's custom-expression slot): a 64-bit
  * locality-sensitive hash where near-duplicate texts differ in few
  * bits. Spark has no built-in; a Scala UDF would box every row and
  * break WholeStageCodegen — this expression stays codegen'd (the
  * generated code is a single static call on the already-deserialized
  * UTF8String, no boxing, no serialization).
  *
  * Algorithm (public SimHash, Charikar 2002): hash each whitespace
  * token to 64 bits (FNV-1a), sum per-bit +1/−1 votes across tokens,
  * emit the sign bit vector.
  */
object SimHashImpl {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a over a token's UTF-8 bytes. */
  private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) {
          val h = fnv1a(bytes, start, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** `simhash64(text)` — 64-bit SimHash of a string column. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHashImpl.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.compute($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "simhash64"
}

/** `hamming64(a, b)` — Hamming distance between two 64-bit hashes:
  * `Long.bitCount(a ^ b)`, pure codegen arithmetic. */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long]).toLong
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"(long) java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hamming64"
}

object SimHash {
  /** Column API. */
  def simhash64(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))
  def hamming64(a: Column, b: Column): Column =
    Bridge.column(Hamming64(Bridge.expression(a), Bridge.expression(b)))

  /** Register `simhash64` / `hamming64` for SQL use in this session. */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "simhash64", exprs => SimHash64(exprs.head))
    Bridge.registerFunction(spark, "hamming64", exprs => Hamming64(exprs.head, exprs(1)))
  }
}
