package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (SURVEY.md §2.2.10 path (c), builder
  * mandate): top-k per group as a first-class operator — logical node →
  * planner strategy → physical exec — instead of the
  * window-row_number-filter composite.
  *
  * Why a custom operator is justified here: WindowExec must SORT every
  * partition's full data (O(n log n) per partition, full spill surface)
  * and materializes a rank column that the filter immediately consumes.
  * This exec keeps one bounded k-heap per group (O(n log k), memory
  * k·|groups-per-partition| rows) and never sorts the input — at 100 TB
  * with small k the difference is the whole sort stage. Distribution
  * requirement is ClusteredDistribution(group): Spark's EnsureRequirements
  * inserts the single hash exchange; everything else is local.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy: TopKPerGroup → TopKPerGroupExec. Injected via
  * GraftExtensions (session build) or session.experimental (runtime).
  */
class TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical operator: one bounded max-heap (worst-on-top) per group per
  * partition; rows of a group are co-located by the required clustered
  * distribution.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val groupExprsLocal = groupExprs
    val orderingLocal = ordering
    val kLocal = k
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprsLocal, schema)
      // compare(a, b) < 0 ⇔ a ranks before b; heap head = current worst.
      val ord = GraftBridge.createOrdering(orderingLocal, schema)
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {

  /** API entry: top-k rows per group. `orderSpec` is (column, descending)
    * pairs; output per group is in that order. Installs the planner
    * strategy on the session if absent (the idiomatic install point is
    * GraftExtensions at session build; harness-owned sessions get it
    * here).
    */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    // An empty grouping would reach ClusteredDistribution(Nil), which
    // only fails later at planning time — reject it here instead.
    require(groupCols.nonEmpty, "topKPerGroup requires at least one group column")
    require(orderSpec.nonEmpty, "topKPerGroup requires at least one order column")
    val spark = df.sparkSession
    // Check-then-append is racy across threads sharing the session;
    // a duplicate strategy is harmless but the lost-update could drop a
    // concurrently-added one. Serialize the install.
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[TopKPerGroupStrategy])) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ new TopKPerGroupStrategy
      }
    }
    val analyzed = df.queryExecution.analyzed
    val byName = analyzed.output.groupBy(_.name)
    def resolve(name: String): Attribute = byName.getOrElse(name, Nil) match {
      case Seq(one) => one
      case Nil => throw new IllegalArgumentException(
        s"topKPerGroup: no column '$name' in (${analyzed.output.map(_.name).mkString(", ")})")
      case many => throw new IllegalArgumentException(
        s"topKPerGroup: ambiguous column '$name' (${many.size} attributes match)")
    }
    val g = groupCols.map(resolve)
    val so = orderSpec.map { case (name, desc) =>
      SortOrder(resolve(name), if (desc) Descending else Ascending)
    }
    GraftBridge.ofRows(spark, TopKPerGroup(g, so, k, analyzed))
  }
}
