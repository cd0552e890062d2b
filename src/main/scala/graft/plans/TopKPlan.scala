package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Whole-operator top-k-per-group as a native plan (the (c) route:
  * LogicalPlan + Strategy + SparkPlan, registered through
  * [[GraftExtensions]]).
  *
  * The declarative formulation — row_number() over a window, then
  * filter — SORTS every partition's full data to rank it. This
  * operator keeps a bounded k-heap per group instead, and runs TWICE:
  * a partial pass before the shuffle (so at most k rows per group per
  * input partition travel the wire — the map-side combine of top-k)
  * and a final pass after clustering by group. At 100 TB with k=3 the
  * shuffle shrinks from the whole table to 3·|groups|·|partitions|
  * rows, and nothing is ever globally sorted.
  *
  * Selection is by (orderCol DESC NULLS LAST, tieCol ASC NULLS FIRST)
  * — identical semantics (including null placement) to `row_number
  * over (order by orderCol desc, tieCol asc) <= k`, for ANY orderable
  * column type (comparison uses the type's Catalyst ordering, not a
  * numeric coercion), modulo output order (callers sort the
  * ≤ k·|groups| survivors).
  */
final case class TopKPerGroup(
    groupCols: Seq[Expression], orderCol: Expression, tieCol: Expression,
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, t, k, child) =>
      val partial = TopKExec(g, o, t, k, partial = true, planLater(child))
      TopKExec(g, o, t, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

final case class TopKExec(
    groupCols: Seq[Expression], orderCol: Expression, tieCol: Expression,
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupCols))

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val groupBound = groupCols.map(BindReferences.bindReference(_, child.output))
    val orderBound = BindReferences.bindReference(orderCol, child.output)
    val tieBound = BindReferences.bindReference(tieCol, child.output)
    // the column types' own Catalyst orderings: exact for long/decimal/
    // string — no narrowing through double
    val orderOrd = TypeUtils.getInterpretedOrdering(orderBound.dataType)
    val tieOrd = TypeUtils.getInterpretedOrdering(tieBound.dataType)
    val fn = (iter: Iterator[InternalRow]) => {
      val keyProj = UnsafeProjection.create(groupBound)
      // > 0 iff a is STRONGER than b under
      // (order DESC NULLS LAST, tie ASC NULLS FIRST) — the same null
      // placement Spark's window ordering uses for desc/asc
      def strength(ao: Any, at: Any, bo: Any, bt: Any): Int = {
        val oc = (ao, bo) match {
          case (null, null) => 0
          case (null, _)    => -1 // null order ranks last under DESC
          case (_, null)    => 1
          case _            => orderOrd.compare(ao, bo) // larger = stronger
        }
        if (oc != 0) oc
        else (at, bt) match {
          case (null, null) => 0
          case (null, _)    => 1 // null tie ranks first under ASC
          case (_, null)    => -1
          case _            => -tieOrd.compare(at, bt) // smaller = stronger
        }
      }
      // max-heap ordered so the WEAKEST kept row sits at the head for
      // O(1) displacement
      val weakestFirst = new Ordering[(Any, Any, InternalRow)] {
        def compare(x: (Any, Any, InternalRow), y: (Any, Any, InternalRow)): Int =
          strength(y._1, y._2, x._1, x._2)
      }
      val heaps = mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[(Any, Any, InternalRow)]]
      iter.foreach { row =>
        // copy eval results: UTF8String/Decimal values point into the
        // reused row buffer
        val ov = InternalRow.copyValue(orderBound.eval(row))
        val tv = InternalRow.copyValue(tieBound.eval(row))
        // probe with the projection's reused row; copy the key ONLY on
        // first sight of a group (getOrElseUpdate would eagerly
        // allocate + byte-copy one UnsafeRow per INPUT row)
        val probe = keyProj(row)
        val heap = heaps.get(probe) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty(weakestFirst)
            heaps.update(probe.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue((ov, tv, row.copy()))
        else {
          val (wo, wt, _) = heap.head
          if (strength(ov, tv, wo, wt) > 0) {
            heap.dequeue()
            heap.enqueue((ov, tv, row.copy()))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }
    child.execute().mapPartitions(fn, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object TopK {
  /** Top-k rows per group by (orderCol desc, tieCol asc). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    // k = 0 would dereference an empty heap's head in the exec
    require(k >= 1, s"topKPerGroup: k must be >= 1, got $k")
    val plan = TopKPerGroup(
      groupCols.map(c => Bridge.expression(df(c))),
      Bridge.expression(df(orderCol)), Bridge.expression(df(tieCol)),
      k, df.queryExecution.analyzed)
    Bridge.ofRows(df.sparkSession, plan)
  }
}
