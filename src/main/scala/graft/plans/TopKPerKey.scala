package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator custom plan (the brief's preference (c), next to
  * the expression kernels (b) and the optimizer rule): per-key
  * top-k with rank, `TopK.perKey(df, keys, order, k)`.
  *
  * Why a physical operator: the window formulation
  * `row_number().over(partitionBy(keys).orderBy(order))` + filter
  * must SORT every group's every row (shuffle + full sort of the
  * whole input, O(n log n) per key) and only then discard all but k.
  * This operator is two-phase like hash aggregation:
  *
  *  - the PARTIAL phase runs on each input partition before the
  *    shuffle, keeping a bounded k-row heap per key (O(n log k)) and
  *    emitting at most k rows per key per partition — a key's global
  *    top-k is a subset of the union of its per-partition top-k, so
  *    the shuffle moves O(keys·k) rows per input partition instead
  *    of everything. Heap state is k rows per key but unbounded in
  *    key CARDINALITY, so the map is flushed downstream and cleared
  *    whenever it holds more than `spark.graft.topk.partialFlushRows`
  *    buffered rows (mirroring ObjectHashAggregateExec's fallback).
  *    Flushing is correct, not just safe: a row in its key's global
  *    top-k has < k rows above it globally, hence < k above it within
  *    any flush segment — it survives that segment's heap too. Memory
  *    is bounded regardless of key cardinality; the only cost of a
  *    flush is a weaker pre-shuffle reduction.
  *  - the FINAL phase requires clustering on the key AND a
  *    (key, order) child ordering, then streams: count rows per
  *    contiguous group, emit the first k with their 1-based rank,
  *    O(1) state. The sort that satisfies the required ordering is a
  *    spill-capable SortExec ABOVE the exchange, so it only ever
  *    sorts the partial phase's survivors (≤ k rows per key per map
  *    partition), never the raw input.
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
    rankAttr: AttributeReference, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr
  // rankAttr is never a reference INTO the child, in either phase
  // (the partial phase carries it only to hand to the final phase)
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  // the final phase streams contiguous groups in rank order; asking
  // for the ordering (instead of re-heaping) keeps final-phase state
  // O(1) and delegates spilling to SortExec — which here sorts only
  // the partial phase's survivors, not the input
  private def groupedOrdering: Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) ++ order
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) super.requiredChildOrdering else groupedOrdering :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else groupedOrdering

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override protected def doExecute(): RDD[InternalRow] =
    if (partial) doExecutePartial() else doExecuteFinal()

  private def doExecutePartial(): RDD[InternalRow] = {
    val childOutput = child.output
    val nOrder = order
    val nKeys = keys
    val kk = k
    val flushRows = math.max(kk,
      conf.getConfString("spark.graft.topk.partialFlushRows", "1048576").toInt)
    child.execute().mapPartitions { it =>
      val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      val keyProj = GenerateUnsafeProjection.generate(
        BindReferences.bindReferences(nKeys, childOutput))
      val ord = RowOrdering.create(nOrder, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      // evict the row that sorts LAST in `order`: max-heap on ord
      val evictOrd = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = -ord.compare(a, b)
      }
      new Iterator[InternalRow] {
        private var held = 0
        private var drain: java.util.Iterator[UnsafeRow] =
          java.util.Collections.emptyIterator[UnsafeRow]()

        // consume input until the buffer budget is hit or input ends,
        // then hand the accumulated per-key top-k rows downstream and
        // reset (segment flush — see class doc for why it's exact)
        private def step(): java.util.Iterator[UnsafeRow] = {
          while (it.hasNext && held < flushRows) {
            val raw = it.next()
            val row = raw match {
              case u: UnsafeRow => u
              case r => toUnsafe(r)
            }
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              heap = new java.util.PriorityQueue[UnsafeRow](kk, evictOrd)
              heaps.put(key.copy(), heap)
            }
            if (heap.size() < kk) { heap.add(row.copy()); held += 1 }
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll()
              heap.add(row.copy())
            }
          }
          val out = new java.util.ArrayList[UnsafeRow](held)
          val hs = heaps.values().iterator()
          while (hs.hasNext) {
            val hi = hs.next().iterator()
            while (hi.hasNext) out.add(hi.next())
          }
          heaps.clear()
          held = 0
          out.iterator()
        }

        override def hasNext: Boolean = {
          while (!drain.hasNext && it.hasNext) drain = step()
          drain.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          drain.next()
        }
      }
    }
  }

  private def doExecuteFinal(): RDD[InternalRow] = {
    val childOutput = child.output
    val nKeys = keys
    val kk = k
    val rAttr = rankAttr
    child.execute().mapPartitions { it =>
      val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      val keyProj = GenerateUnsafeProjection.generate(
        BindReferences.bindReferences(nKeys, childOutput))
      // group-change equality via the sort semantics (0.0 == -0.0,
      // NaN == NaN), matching the contiguity the child ordering gives
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(nKeys.map(_.dataType))
      val outProj = GenerateUnsafeProjection.generate(
        BindReferences.bindReferences(
          (childOutput :+ rAttr).asInstanceOf[Seq[Expression]],
          childOutput :+ rAttr))
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      var cur: UnsafeRow = null
      var n = 0
      it.flatMap { raw =>
        val row = raw match {
          case u: UnsafeRow => u
          case r => toUnsafe(r)
        }
        val key = keyProj(row)
        if (cur == null || keyOrd.compare(key, cur) != 0) {
          cur = key.copy()
          n = 0
        }
        n += 1
        if (n <= kk) {
          rankRow.setInt(0, n)
          Iterator.single(outProj(joined(row, rankRow)): InternalRow)
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Optimizer rule: the standard Spark idiom
  *
  *   `withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *      .filter($"rn" <= k)`
  *
  * is rewritten to [[TopKPerKeyNode]], so USER-WRITTEN window-rank
  * filters run on the bounded-heap operator without knowing it
  * exists (Spark's own InferWindowGroupLimit only pre-prunes rows —
  * it still sorts every surviving group; this replaces the sort).
  *
  * Fires only when provably equivalent: a single window expression
  * that is row_number() over the default ROWS frame, a non-empty
  * partition spec (a global top-k has no clustering key for the
  * exec), and a conjunct upper-bounding the rank by an integer
  * literal. `rn <= k` / `rn < k+1` conjuncts are consumed by the
  * operator; any other conjunct (including `rn = k`) stays as a
  * residual Filter above it, exactly where the original filter sat.
  * Disable with `spark.graft.topk.rewrite=false`; ranks beyond
  * `spark.graft.topk.rewriteMaxK` (default 10000) keep the window
  * formulation (at some k the full sort's spill path beats k-row
  * heaps per key).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def isDefaultRowFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    }

  /** (consumed-bound, residual?) for one conjunct against the rank
    * attribute: Some((k, None)) consumes the conjunct as top-k,
    * Some((k, Some(c))) bounds by k but keeps c. None = not a rank
    * bound (conjunct must then not reference rn at all to stay a
    * residual — it always may, rn is in the output). */
  private def rankBound(c: Expression, rn: Attribute): Option[(Int, Option[Expression])] =
    c match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) =>
        Some((k, None))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) =>
        Some((k, None))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) =>
        Some((k - 1, None))
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) =>
        Some((k - 1, None))
      case eq @ EqualTo(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) =>
        Some((k, Some(eq)))
      case eq @ EqualTo(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) =>
        Some((k, Some(eq)))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.topk.rewrite", "true") != "true") return plan
    val maxK = conf.getConfString("spark.graft.topk.rewriteMaxK", "10000").toInt
    plan.transformUp {
      case f @ Filter(cond,
            w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)), part, order, wchild, _))
          if part.nonEmpty && order.nonEmpty && isDefaultRowFrame(spec) =>
        val rn = alias.toAttribute.asInstanceOf[AttributeReference]
        val conjuncts = splitConjunctivePredicates(cond)
        val bounds = conjuncts.map(c => c -> rankBound(c, rn))
        val ks = bounds.collect { case (_, Some((k, _))) => k }
        if (ks.isEmpty || ks.min < 1 || ks.min > maxK) f
        else {
          val k = ks.min
          val residual = bounds.flatMap {
            case (_, Some((_, keep))) => keep  // consumed, unless = form
            case (c, None)            => Some(c)
          }
          // InferWindowGroupLimit may already have pre-pruned below
          // the window; TopK subsumes it — strip to avoid double work
          val inner = wchild match {
            case WindowGroupLimit(_, _, _, _, gchild) => gchild
            case other => other
          }
          val topk = TopKPerKeyNode(part, order, k, rn, inner)
          residual.reduceOption(And).map(Filter(_, topk)).getOrElse(topk)
        }
    }
  }
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
    * ascending?), with a 1-based `rankCol` rank column appended. The
    * order must be total (add a unique tiebreak column) for
    * deterministic ranks, exactly as with row_number. Requires the
    * session to register [[GraftExtensions]] (it injects
    * [[TopKStrategy]]). */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
             k: Int, rankCol: String = "rn"): DataFrame = {
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
    // appending a duplicate name would make downstream name-based
    // resolution ambiguous (unlike withColumn, which replaces)
    if (child.output.exists(a => resolver(a.name, rankCol)))
      throw new IllegalArgumentException(
        s"TopK.perKey: input already has a column '$rankCol'; pass rankCol = <other name>")
    val sortOrder = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankCol, IntegerType, nullable = false)()
    DatasetShim.ofRows(spark,
      TopKPerKeyNode(keys.map(attr), sortOrder, k, rankAttr, child))
  }
}
