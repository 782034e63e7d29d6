package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, NullsFirst, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Top-k-per-key as a whole custom operator (the SURVEY §7.3 preference-
  * ladder step (c): LogicalPlan + SparkStrategy + SparkPlan) — a genuine
  * gap in Spark's surface: the built-in formulation is
  * `row_number().over(window) <= k`, which SORTS every partition fully
  * and keeps every row until the filter. This operator keeps a bounded
  * heap of k rows per key, in TWO phases: a partial pass in each input
  * partition (at most k rows per key per partition cross the wire) and a
  * final pass after the key exchange. At 100 TB with small k this turns
  * a full shuffle+sort into a near-map-side reduction — the same shape
  * Spark itself uses for global top-k (TakeOrderedAndProject), extended
  * per key.
  */
case class TopKPerKey(
    k: Int,
    keyExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

case class TopKPerKeyExec(
    k: Int,
    keyExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** The final phase needs all rows of a key together; the partial phase
    * runs wherever the data already is. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keyExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprsLocal = keyExprs
    val orderExprsLocal = orderExprs
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprsLocal, childOutput)
      val ordering = new LazilyGeneratedOrdering(orderExprsLocal, childOutput)
      // per key: a bounded max-heap (reverse ordering) — root is the worst
      // kept row; a better row evicts it. O(n log k) per partition,
      // memory O(keys * k).
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values.forEach { h =>
        val rows = new Array[InternalRow](h.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = h.poll(); i -= 1 } // emit best-first
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Plans the logical node as partial → (exchange inserted by
  * EnsureRequirements) → final. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      val part = TopKPerKeyExec(k, keys, order, planLater(child), partial = true)
      TopKPerKeyExec(k, keys, order, part, partial = false) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Top-k rows per key group under the given ordering. `orderCols` may
    * carry directions (`$"x".desc`); plain columns default ascending.
    *
    * DETERMINISM CONTRACT: the ordering must be TOTAL within each key
    * (append a unique tie-break column — the same rule README.md imposes
    * on window ranking). On a tie with the heap's worst kept row the
    * incumbent wins, so which tied row survives would otherwise depend
    * on partition/encounter order. All in-repo callers (q27/q28/specs)
    * pass a unique tie-break. */
  def perKey(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    // idempotently register the planner strategy for this session
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val child = df.queryExecution.analyzed
    def resolve(e: Expression): Expression = e.transformUp {
      case u: UnresolvedAttribute =>
        val matches = child.output.filter(_.name.equalsIgnoreCase(u.nameParts.last))
        matches match {
          case Seq(one) => one
          case Seq() => throw new IllegalArgumentException(
            s"column ${u.name} not in ${child.output}")
          case many => throw new IllegalArgumentException(
            s"column ${u.name} is ambiguous: $many — disambiguate before TopK.perKey")
        }
    }
    val keys = keyCols.map(c => resolve(Bridge.expression(spark, c)))
    val order = orderCols.map { c =>
      resolve(Bridge.expression(spark, c)) match {
        case s: SortOrder => s
        case e => SortOrder(e, Ascending, NullsFirst, Seq.empty)
      }
    }
    Bridge.ofRows(spark, TopKPerKey(k, keys, order, child))
  }
}
