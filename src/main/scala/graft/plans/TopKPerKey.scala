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

/** Two-phase like hash aggregation: `partial = true` runs on each
  * input partition BEFORE the shuffle, emitting at most k rows per
  * key per partition (a key's global top-k is a subset of the union
  * of its per-partition top-k) and no rank; the final phase requires
  * clustering, merges the survivors, and ranks. The shuffle moves
  * O(keys·k) rows per input partition instead of everything. */
case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: AttributeReference, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr
  // rankAttr is never a reference INTO the child, in either phase
  // (the partial phase carries it only to hand to the final phase)
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  // final phase hash-clusters rows of a key into one partition; no
  // sort required — the heaps do the bounded ordering work
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val nOrder = order
    val nKeys = keys
    val kk = k
    val isPartial = partial
    val rAttr = rankAttr
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
      import scala.jdk.CollectionConverters._
      if (isPartial) {
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      } else {
        val outProj = GenerateUnsafeProjection.generate(
          BindReferences.bindReferences(
            (childOutput :+ rAttr).asInstanceOf[Seq[Expression]],
            childOutput :+ rAttr))
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
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
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      val planned = planLater(child)
      TopKPerKeyExec(keys, order, k, rankAttr, partial = false,
        TopKPerKeyExec(keys, order, k, rankAttr, partial = true, planned)) :: Nil
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
    require(k >= 1, s"TopK.perKey: k must be >= 1, got $k")
    val spark: SparkSession = df.sparkSession
    val child = DatasetShim.analyzed(df)
    // resolve directly against the analyzed child — the node enters
    // the plan fully resolved; honor the session's case sensitivity
    // like every other column-name entry point
    val resolver = spark.sessionState.conf.resolver
    def attr(n: String): Attribute = child.output.find(a => resolver(a.name, n)).getOrElse(
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
