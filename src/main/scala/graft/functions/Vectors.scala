package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType(FloatType)` columns using only
  * higher-order functions (`transform`/`aggregate`/`zip_with`) — codegen'd
  * by Catalyst, no UDFs, fully distributed.
  *
  * Cross-engine determinism: every fold accumulates a DOUBLE
  * left-to-right in element order, with each element cast to double
  * before multiplying — matching the DuckDB oracle's
  * `list_sum(list_transform(...))` element order, so results are
  * bit-identical.
  */
object Vectors {

  /** Σ f(a_i) as a left fold in element order, double accumulator. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Element-wise product (both sides cast to double first). */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def normSq(a: Column): Column =
    foldSum(transform(a, x => x.cast("double") * x.cast("double")))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val den = norm(a) * norm(b)
    when(den === 0.0, lit(0.0)).otherwise(d / den)
  }

  /** Random-hyperplane LSH bucket for ANN: the sign bits of the vector's
    * projection onto `nPlanes` deterministic pseudo-random hyperplanes.
    * Plane p's component for dimension i is `hash2unit(p, i)` — a
    * deterministic hash-derived value in [-1, 1) — so executors need no
    * shared state: the "model" is the expression itself (broadcast-free,
    * scales to any cluster). Vectors in the same bucket are likely
    * directionally close; bucket-join gives the candidate set. */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      // deterministic per (plane, dim) coefficient via xxhash64
      val proj = foldSumIndexed(vec, p)
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Projection of vec onto plane p: Σ_i v_i * unit(xxhash64(p, i)). */
  private def foldSumIndexed(vec: Column, plane: Int): Column = {
    val n = size(vec)
    val idx = sequence(lit(0), n - 1)
    val terms = zip_with(vec, idx, (v, i) => {
      val h = xxhash64(lit(plane), i)
      // map hash to [-1, 1): (h mod 2^20) / 2^19 - 1
      val u = (pmod(h, lit(1048576L)).cast("double") / 524288.0) - 1.0
      v.cast("double") * u
    })
    aggregate(terms, lit(0.0), (acc, x) => acc + x)
  }
}
