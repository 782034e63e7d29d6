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
  private[functions] final val FnvOffset = 0xcbf29ce484222325L
  private[functions] final val FnvPrime = 0x100000001b3L

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

  /** DuckDB-SQL mirror of [[SimHashImpl.compute]], generated from the
    * same FNV constants so the oracle cannot drift: a WITH-clause body
    * mapping a relation `(doc_id, text)` to `sim(doc_id, simhash)`.
    *
    * FNV-1a runs in HUGEINT arithmetic mod 2^64 (`xor` + multiply +
    * modulus — DuckDB has no wrapping 64-bit unsigned multiply); the
    * per-bit ±1 votes are 64 aggregate columns over the exploded token
    * hashes (plain columnar aggregation — far faster than nested list
    * lambdas); the signed 64-bit assembly gives bit 63 its two's
    * complement weight so the value equals Spark's LongType output.
    *
    * Valid for ASCII text (`ascii(char)` == UTF-8 byte); the driver
    * corpora are ASCII — asserted in SimHashSpec. */
  def duckdbSigsCte(docsRelation: String): String = {
    val offset = java.lang.Long.toUnsignedString(SimHashImpl.FnvOffset)
    val prime = java.lang.Long.toUnsignedString(SimHashImpl.FnvPrime)
    val fnv =
      s"""list_reduce(
         |  list_prepend(CAST('$offset' AS HUGEINT),
         |    list_transform(range(1, length(tok)+1),
         |      i -> CAST(ascii(substring(tok, i, 1)) AS HUGEINT))),
         |  (h, b) -> (xor(h, b) * CAST('$prime' AS HUGEINT))
         |            % CAST('18446744073709551616' AS HUGEINT))""".stripMargin
    val votes = (0 until 64).map { b =>
      val p2 = java.lang.Long.toUnsignedString(1L << b)
      s"sum(CASE WHEN (h // CAST('$p2' AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(", ")
    val assemble = ("(CASE WHEN v63 > 0 THEN CAST(-9223372036854775808 AS BIGINT) ELSE 0 END)" +:
      (0 until 63).map(b => s"(CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"))
      .mkString(" + ")
    s"""toks AS (SELECT doc_id,
       |           unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS tok
       |         FROM $docsRelation),
       |hs AS (SELECT doc_id, $fnv AS h FROM toks),
       |v AS (SELECT doc_id, $votes FROM hs GROUP BY doc_id),
       |simv AS (SELECT doc_id, $assemble AS simhash FROM v),
       |sim AS (SELECT d.doc_id,
       |          CASE WHEN d.text IS NULL THEN NULL
       |               ELSE coalesce(simv.simhash, 0) END AS simhash
       |        FROM $docsRelation d LEFT JOIN simv USING (doc_id))""".stripMargin
  }

  /** Register `simhash64` / `hamming64` for SQL use in this session. */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "simhash64", exprs => SimHash64(exprs.head))
    Bridge.registerFunction(spark, "hamming64", exprs => Hamming64(exprs.head, exprs(1)))
  }
}
