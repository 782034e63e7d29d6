package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator[IN, BUF, OUT]` implementations (the UDAF surface,
  * SURVEY.md §7.3): exact cent-grid mean — the scale-safe version of the
  * reference's price averaging, where a double sum would be
  * order-dependent across partitions. The buffer is a pair of longs, so
  * partial aggregation and merge are exact and commutative — the result
  * is identical for ANY partitioning, which is precisely what a 100 TB
  * shuffle needs (and what makes it DuckDB-oracle-able).
  */
object Aggregators {

  case class CentBuf(var cents: Long, var n: Long)

  /** Mean of a money column computed on an integer cent grid:
    * floor(x*100+0.5) per row, exact long sums, single double division
    * at finish. */
  object CentMean extends Aggregator[Double, CentBuf, Double] {
    override def zero: CentBuf = CentBuf(0L, 0L)
    override def reduce(b: CentBuf, x: Double): CentBuf = {
      b.cents += math.floor(x * 100.0 + 0.5).toLong
      b.n += 1
      b
    }
    override def merge(a: CentBuf, b: CentBuf): CentBuf = {
      a.cents += b.cents; a.n += b.n; a
    }
    override def finish(b: CentBuf): Double =
      if (b.n == 0) 0.0 else (b.cents.toDouble / b.n) / 100.0
    override def bufferEncoder: Encoder[CentBuf] = Encoders.product[CentBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form, usable in `agg(...)`. */
  def centMean(c: Column): Column = udaf(CentMean).apply(c)
}
