package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator custom plan (the brief's preference (c), next to
  * the expression kernels (b) and the optimizer rule): per-key
  * top-k with rank, `TopK.perKey(df, keys, order, k)`.
  *
  * Why a physical operator: the window formulation
  * `row_number().over(partitionBy(keys).orderBy(order))` + filter
  * must SORT every group's every row (shuffle + full sort, O(n log
  * n) per key) and only then discard all but k. This operator keeps
  * a bounded k-row heap per key — O(n log k) with k rows of state
  * per key instead of the group's whole row set, which is the
  * difference between "works" and "one hot key OOMs a reducer" at
  * corpus scale. (The shuffle itself remains; a two-phase
  * partial/final split à la q25's salted top-k composes on top by
  * calling perKey twice.)
  *
  * The differential spec pins `perKey == window+filter` row-for-row.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: AttributeReference, child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rn is born here, not referenced from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: AttributeReference, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  // hash-cluster rows of a key into one partition; no sort required —
  // the heaps do the bounded ordering work
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val nOrder = order
    val nKeys = keys
    val kk = k
    val outAttrs = output
    child.execute().mapPartitions { it =>
      val keyProj = GenerateUnsafeProjection.generate(
        BindReferences.bindReferences(nKeys, childOutput))
      val ord = RowOrdering.create(nOrder, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      // evict the row that sorts LAST in `order`: max-heap on ord
      val evictOrd = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = -ord.compare(a, b)
      }
      while (it.hasNext) {
        val row = it.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk, evictOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val outProj = GenerateUnsafeProjection.generate(
        BindReferences.bindReferences(
          (childOutput :+ rankAttr).asInstanceOf[Seq[Expression]],
          childOutput :+ rankAttr))
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val rows = new Array[UnsafeRow](heap.size())
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // poll order = worst→best
        rows.iterator.zipWithIndex.map { case (r, idx) =>
          rankRow.setInt(0, idx + 1)
          outProj(joined(r, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  import org.apache.spark.sql.graftshim.DatasetShim

  /** Per-key top-k of `df` in the given sort order (column name →
    * ascending?), with a 1-based `rn` rank column appended. The
    * order must be total (add a unique tiebreak column) for
    * deterministic ranks, exactly as with row_number. Requires the
    * session to register [[GraftExtensions]] (it injects
    * [[TopKStrategy]]). */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
             k: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    val child = DatasetShim.analyzed(df)
    // resolve directly against the analyzed child — the node enters
    // the plan fully resolved
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"TopK.perKey: no column '$n' in ${child.output.map(_.name).mkString(", ")}"))
    val sortOrder = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference("rn", IntegerType, nullable = false)()
    DatasetShim.ofRows(spark,
      TopKPerKeyNode(keys.map(attr), sortOrder, k, rankAttr, child))
  }
}
