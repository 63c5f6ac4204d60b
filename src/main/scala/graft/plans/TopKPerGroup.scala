package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k per group WITHOUT a
  * per-group sort (task preference (c) — custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`).
  *
  * The built-in formulation (`row_number().over(partitionBy(g)
  * .orderBy(o)) <= k`, SURVEY W3/W4/O7) shuffles EVERY row of every
  * group and sorts each partition before discarding all but k rows —
  * at 100 TB that is a full-data sort whose output is then thrown
  * away. This operator keeps a bounded k-row heap per group on each
  * map task (O(G·k) state), shuffles ONLY the per-task top-k
  * survivors (top-k is algebraic: merged partial top-ks contain the
  * global top-k), and re-heaps after the exchange. Shuffle volume
  * drops from |rows| to ≤ tasks·G·k.
  *
  * Ordering is lexicographic over `orderExprs` with per-key
  * direction flags; callers supply a tiebreaking key for determinism
  * (same contract as a SQL ORDER BY). Null order keys follow Spark's
  * ORDER BY defaults — NULLS FIRST on ascending keys, NULLS LAST on
  * descending — so the result is row-for-row the window formulation
  * `row_number().over(partitionBy(g).orderBy(o)) <= k`.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderExprs: Seq[Expression],
    orderDesc: Seq[Boolean],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(orderExprs.length == orderDesc.length)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[Expression],
    orderDesc: Seq[Boolean],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = orderExprs.zip(orderDesc)
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupLocal, childOutput)
      val bound = orderLocal.map { case (e, desc) =>
        (BindReferences.bindReference(e, childOutput), desc,
          TypeUtils.getInterpretedOrdering(e.dataType))
      }.toArray
      // negative = a ranks strictly better than b; nulls follow
      // Spark's ORDER BY defaults (first when asc, last when desc)
      def cmpBetter(a: Array[Any], b: Array[Any]): Int = {
        var i = 0
        while (i < bound.length) {
          val (_, desc, ord) = bound(i)
          val av = a(i); val bv = b(i)
          val c =
            if (av == null && bv == null) 0
            else if (av == null) { if (desc) 1 else -1 }
            else if (bv == null) { if (desc) -1 else 1 }
            else {
              val cc = ord.asInstanceOf[Ordering[Any]].compare(av, bv)
              if (desc) -cc else cc
            }
          if (c != 0) return c
          i += 1
        }
        0
      }
      // PriorityQueue dequeues its max; with "greater = worse" the
      // head is always the eviction candidate
      val heapOrd: Ordering[(Array[Any], InternalRow)] =
        (x, y) => cmpBetter(x._1, y._1)
      val heaps = mutable.HashMap
        .empty[UnsafeRow, mutable.PriorityQueue[(Array[Any], InternalRow)]]
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty(heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) {
          // copy first: order values of string/binary type reference
          // the (reused) source row buffer
          val copy = row.copy()
          heap.enqueue((bound.map(_._1.eval(copy)), copy))
        } else {
          val ks = bound.map(_._1.eval(row))
          if (cmpBetter(ks, heap.head._1) < 0) {
            heap.dequeue()
            val copy = row.copy()
            heap.enqueue((bound.map(_._1.eval(copy)), copy))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroup → partial (map-side) heap,
  * exchange on the group keys (inserted by EnsureRequirements), final
  * heap. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerGroup =>
      val partial = TopKPerGroupExec(t.groupExprs, t.orderExprs, t.orderDesc,
        t.k, partial = true, planLater(t.child))
      TopKPerGroupExec(t.groupExprs, t.orderExprs, t.orderDesc,
        t.k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Public API. */
object TopK {
  /** Top `k` rows per group of `df`, ordered lexicographically by
    * `orderCols` (`(name, descending)`); pass a unique tiebreaker as
    * the last key for fully deterministic output. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    org.apache.spark.sql.GraftBridge.ensureStrategy(spark, TopKStrategy)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(",")}"))
    val node = TopKPerGroup(groupCols.map(attr),
      orderCols.map(c => attr(c._1)), orderCols.map(_._2), k, analyzed)
    org.apache.spark.sql.GraftBridge.ofRows(spark, node)
  }
}
