package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-gram md5 stream as ONE native Catalyst expression.
  *
  * The declarative formulation of the span-grain dedup family's gram
  * stream (posexplode the token stream, then W−1 `lead` columns over a
  * doc-partitioned window, then md5 the concat — kept as the reference
  * implementation in `TextOps.substrGramRowsDeclarative`) pushes the
  * ENTIRE token-grain corpus through a hash exchange just to line up
  * each token with its W−1 successors — work that never crosses
  * document boundaries. This expression computes every W-token gram's
  * md5 in a single pass over the document's UTF-8 bytes inside
  * whole-stage codegen: the scan stays embarrassingly parallel and the
  * gram relation needs NO shuffle at all before its census.
  *
  * Semantics are IDENTICAL to `md5(concat_ws(" ", tok_i … tok_{i+W−1}))`
  * over `split(text, " ")` (asserted native-vs-declarative in
  * EngineSpec and by the shared DuckDB oracle): splitting on the single
  * space byte keeps empty tokens (consecutive/trailing spaces) exactly
  * like Spark's `split` with limit −1 and DuckDB's `string_split`, and
  * re-joining W consecutive tokens with single spaces reproduces the
  * original byte span verbatim — so each gram's md5 is computed
  * directly over a slice of the document's bytes, no string rebuild.
  * No ASCII assumption: multi-byte UTF-8 never contains the 0x20 byte,
  * so byte-level splitting is exact on any input.
  */
object SubstrGramImpl {
  /** Span width in tokens — the ONE constant the span-grain family
    * (q168 self-dedup, q169 decontamination) keys on. */
  final val GramW = 8

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** md5 hex (lowercase, 32 chars) of each W-token gram in position
    * order; texts with fewer than W tokens yield the empty array. */
  def hashes(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var nSpaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nSpaces += 1; i += 1 }
    val nTok = nSpaces + 1
    val nGrams = nTok - GramW + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = len
    val md = mdLocal.get()
    val out = new Array[Any](nGrams)
    var g = 0
    while (g < nGrams) {
      val a = starts(g)
      val b = ends(g + GramW - 1)
      md.reset()
      md.update(bytes, a, b - a)
      val dig = md.digest()
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = HexDigits((dig(k) >> 4) & 0xf).toByte
        hex(2 * k + 1) = HexDigits(dig(k) & 0xf).toByte
        k += 1
      }
      out(g) = UTF8String.fromBytes(hex)
      g += 1
    }
    new GenericArrayData(out)
  }
}

object RedactImpl {
  import SubstrGramImpl.GramW

  /** Remove every token covered by a [[GramW]]-wide span starting at
    * any position in `starts` (ASCENDING, token indices), and rejoin
    * the survivors with single spaces. Token boundaries are the same
    * byte-level space split as [[SubstrGramImpl.hashes]], so a
    * contiguous run of kept tokens is copied as ONE byte slice of the
    * original — the result is byte-identical to
    * `string_agg(tok, ' ' ORDER BY t)` over the kept token rows (the
    * declarative/DuckDB formulation), empty tokens included. Two
    * pointers over (tokens, starts): O(len + |starts|). */
  def redact(s: UTF8String, starts: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val bytes = s.getBytes
    val len = bytes.length
    var nSpaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nSpaces += 1; i += 1 }
    val nTok = nSpaces + 1
    val tokStart = new Array[Int](nTok)
    val tokEnd = new Array[Int](nTok)
    var t = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { tokEnd(t) = i; t += 1; tokStart(t) = i + 1 }
      i += 1
    }
    tokEnd(t) = len
    val m = starts.numElements()
    val out = new java.io.ByteArrayOutputStream(len)
    var sp = 0            // next span index
    var active = Long.MinValue // largest span start <= current token
    var wroteAny = false
    t = 0
    while (t < nTok) {
      while (sp < m && starts.getLong(sp) <= t) { active = starts.getLong(sp); sp += 1 }
      val covered = active >= t.toLong - (GramW - 1)
      if (!covered) {
        if (wroteAny) out.write(' ')
        out.write(bytes, tokStart(t), tokEnd(t) - tokStart(t))
        wroteAny = true
      }
      t += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}

/** `substr_gram_hashes(text)` — md5 hex of every [[SubstrGramImpl.GramW]]-token
  * gram, in position order (posexplode it to recover (pos, h)). */
case class SubstrGramHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SubstrGramImpl.hashes(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubstrGramImpl.hashes($c)")
  override protected def withNewChildInternal(c: Expression): SubstrGramHashes =
    copy(c)
  override def prettyName: String = "substr_gram_hashes"
}

/** `redact_spans(text, starts)` — text with every token covered by a
  * [[SubstrGramImpl.GramW]]-wide span from `starts` (ascending token
  * indices) removed, survivors rejoined with single spaces. */
case class RedactSpans(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  // the impl reads spans via ArrayData.getLong — an array<int> input
  // would silently read 8 bytes from 4-byte slots (garbage spans, no
  // error). Reject anything but (string, array<bigint>) at analysis.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"redact_spans expects (string, array<bigint>), got ($l, $r)")
    }
  }
  override def nullSafeEval(t: Any, a: Any): Any =
    RedactImpl.redact(t.asInstanceOf[UTF8String], a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, a) => s"graft.functions.RedactImpl.redact($t, $a)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): RedactSpans = copy(l, r)
  override def prettyName: String = "redact_spans"
}

object SubstrGrams {
  def substrGramHashes(c: Column): Column =
    Bridge.column(SubstrGramHashes(Bridge.expression(c)))
  def redactSpans(text: Column, starts: Column): Column =
    Bridge.column(RedactSpans(Bridge.expression(text), Bridge.expression(starts)))
}
