package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan #2 (next to [[TopKPerKeyNode]]): the
  * backward as-of join the builder brief names as a canonical
  * "operator Spark lacks". `AsOf.joinBackward(left, right, ...)`
  * attaches to every left row the LAST right row of the same key
  * with right.time <= left.time (DuckDB/kdb ASOF LEFT JOIN
  * semantics; reference analog: aligning each event with the most
  * recent upstream state — `/root/reference/process.py:119-129` is
  * the degenerate equal-key case).
  *
  * Why a physical operator: the composable formulations pay real
  * costs — a range join explodes O(left × right) candidates per key
  * before picking the max; the tag+union+window trick (q36's
  * original form) is linear but funnels BOTH sides through one
  * union-shaped schema and window sort. This operator is the
  * classic sort-merge as-of:
  *
  *  - requiredChildDistribution co-partitions both sides on the key
  *    (same EnsureRequirements machinery as SortMergeJoin — equal
  *    keys land in the same partition);
  *  - requiredChildOrdering asks for (key, time) on both sides, so
  *    the inserted sorts are spill-capable SortExecs;
  *  - doExecute zips the co-partitioned iterators and streams a
  *    single forward merge: O(|left| + |right|) comparisons per
  *    partition, O(1) state (the current right candidate row) — no
  *    per-key buffering, no candidate blowup, the shape that
  *    survives 100 TB on both sides.
  *
  * Output = left columns ++ the right side's PAYLOAD columns (right
  * key/time are excluded — they either equal the left's or are not
  * wanted), nullable (left outer: a left row with no qualifying
  * right row gets nulls). Keys compare with the sort ordering, so
  * null keys group together and CAN match each other — SQL's
  * `ON l.k = r.k` would not; keep keys and times non-null.
  */
case class AsOfJoinNode(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean, left: LogicalPlan, right: LogicalPlan)
  extends BinaryNode {
  override def maxRows: Option[Long] = left.maxRows
  override def output: Seq[Attribute] =
    left.output ++ AsOfJoin.payload(right.output, rightKeys, rightTime)
      .map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** The right-side columns that survive into the join output:
    * everything except the join key(s) and the time column. */
  def payload(rightOutput: Seq[Attribute], rightKeys: Seq[Expression],
              rightTime: Expression): Seq[Attribute] =
    rightOutput.filterNot(a =>
      rightKeys.exists(_.semanticEquals(a)) || rightTime.semanticEquals(a))
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    forward: Boolean, left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  private def payloadAttrs: Seq[Attribute] =
    AsOfJoin.payload(right.output, rightKeys, rightTime)

  override def output: Seq[Attribute] =
    left.output ++ payloadAttrs.map(_.withNullability(true))

  override def nodeName: String =
    if (forward) "AsOfJoinForward" else "AsOfJoin"

  // co-partition both sides on the key — EnsureRequirements gives
  // both children HashPartitioning with a shared partition count,
  // exactly as it does for SortMergeJoin
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // (key, time) order on both sides; the sorts satisfying this are
  // ordinary spill-capable SortExecs. The forward variant reverses
  // the TIME direction only: scanning times descending makes the
  // last-consumed eligible right row the SMALLEST time >= left time
  // — the same merge, mirrored.
  private def ordering(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) :+
      SortOrder(time, if (forward) Descending else Ascending)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    ordering(leftKeys, leftTime) :: ordering(rightKeys, rightTime) :: Nil

  // the merge streams left rows through unchanged, so the left
  // child's partitioning and ordering survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output; val rOut = right.output
    val pAttrs = payloadAttrs
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    left.execute().zipPartitions(right.execute()) { (lIt0, rIt0) =>
      val lToUnsafe = UnsafeProjection.create(lOut.map(_.dataType).toArray)
      val rToUnsafe = UnsafeProjection.create(rOut.map(_.dataType).toArray)
      val lKeyProj = GenerateUnsafeProjection.generate(
        BindReferences.bindReferences(lKeys, lOut))
      val rKeyProj = GenerateUnsafeProjection.generate(
        BindReferences.bindReferences(rKeys, rOut))
      val lTimeProj = GenerateUnsafeProjection.generate(
        BindReferences.bindReferences(Seq(lTime), lOut))
      val rTimeProj = GenerateUnsafeProjection.generate(
        BindReferences.bindReferences(Seq(rTime), rOut))
      // sort-semantics comparison (null-first, NaN-greatest) — the
      // same contiguity the required child ordering provides
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val fwd = forward
      // output = left row ++ right payload, resolved by ordinal
      // inside the joined (left ++ fullRight) schema. The right
      // half of the binding SCHEMA must be marked nullable even when
      // the child column is not (BoundReference takes its nullability
      // from the input schema side): a no-match left row joins the
      // all-null filler row, and a nullable=false BoundReference
      // skips the null check — a primitive column would silently
      // read 0 (caught by the randomized differential spec).
      val outProj = GenerateUnsafeProjection.generate(
        BindReferences.bindReferences(
          (lOut ++ pAttrs).asInstanceOf[Seq[Expression]],
          lOut ++ rOut.map(_.withNullability(true))))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      // one-row lookahead over the right side; rHead/rHeadKey/
      // rHeadTime are stable copies (the child iterator and the
      // generated projections both reuse buffers)
      var rHead: UnsafeRow = null
      var rHeadKey: UnsafeRow = null
      var rHeadTime: UnsafeRow = null
      def fetchRight(): Unit =
        if (rIt0.hasNext) {
          rHead = (rIt0.next() match {
            case u: UnsafeRow => u
            case o => rToUnsafe(o)
          }).copy()
          rHeadKey = rKeyProj(rHead).copy()
          rHeadTime = rTimeProj(rHead).copy()
        } else { rHead = null; rHeadKey = null; rHeadTime = null }
      fetchRight()

      // current as-of candidate: the last right row consumed; valid
      // for a left row only while its key still matches
      var rCur: UnsafeRow = null
      var rCurKey: UnsafeRow = null

      lIt0.map { raw =>
        val l = raw match {
          case u: UnsafeRow => u
          case o => lToUnsafe(o)
        }
        val lKey = lKeyProj(l)
        val lT = lTimeProj(l)
        // consume every right row at-or-before (lKey, lT): rows with
        // smaller keys pass through rCur harmlessly (the key-equality
        // check below rejects them); rows with the same key advance
        // the candidate up to the last time <= lT
        var scanning = true
        while (scanning && rHead != null) {
          val c = keyOrd.compare(rHeadKey, lKey)
          val tc = timeOrd.compare(rHeadTime, lT)
          if (c < 0 || (c == 0 && (if (fwd) tc >= 0 else tc <= 0))) {
            rCur = rHead; rCurKey = rHeadKey
            fetchRight()
          } else scanning = false
        }
        val matched = rCur != null && keyOrd.compare(rCurKey, lKey) == 0
        outProj(joined(l, if (matched) rCur else nullRight)): InternalRow
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(lk, rk, lt, rt, fwd, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOf {
  import org.apache.spark.sql.graftshim.DatasetShim

  /** Backward as-of LEFT join: every `left` row gains `right`'s
    * payload columns from the last right row with equal key and
    * `right.timeCol <= left.timeCol`, or nulls if none. The right
    * key/time columns are not emitted; rename any other right
    * column that collides with a left name first. Requires
    * [[GraftExtensions]] (injects [[AsOfStrategy]]).
    *
    * @param keys     key column name(s), present on BOTH sides
    * @param timeCol  time column name, present on BOTH sides,
    *                 non-null, any orderable type
    */
  def joinBackward(left: DataFrame, right: DataFrame,
                   keys: Seq[String], timeCol: String): DataFrame =
    join(left, right, keys, timeCol, forward = false)

  /** Forward as-of LEFT join: the FIRST right row with equal key and
    * `right.timeCol >= left.timeCol` ("next state at or after"). */
  def joinForward(left: DataFrame, right: DataFrame,
                  keys: Seq[String], timeCol: String): DataFrame =
    join(left, right, keys, timeCol, forward = true)

  private def join(left: DataFrame, right: DataFrame,
                   keys: Seq[String], timeCol: String,
                   forward: Boolean): DataFrame = {
    val fn = if (forward) "AsOf.joinForward" else "AsOf.joinBackward"
    if (keys.isEmpty)
      throw new IllegalArgumentException(s"$fn: at least one key column is required")
    val spark: SparkSession = left.sparkSession
    val lPlan = DatasetShim.analyzed(left)
    val rPlan = DatasetShim.analyzed(right)
    val resolver = spark.sessionState.conf.resolver
    def attr(plan: LogicalPlan, n: String, side: String): Attribute =
      plan.output.find(a => resolver(a.name, n)).getOrElse(
        throw new IllegalArgumentException(
          s"$fn: no column '$n' on the $side side " +
            s"(${plan.output.map(_.name).mkString(", ")})"))
    val leftKeys = keys.map(attr(lPlan, _, "left"))
    val rightKeys = keys.map(attr(rPlan, _, "right"))
    val leftTime = attr(lPlan, timeCol, "left")
    val rightTime = attr(rPlan, timeCol, "right")
    // the node carries NO analyzer-inserted casts, and the merge's
    // orderings and hash co-partitioning are built from the LEFT
    // types — a type mismatch would silently mis-hash and misread,
    // not error, so reject it here
    keys.lazyZip(leftKeys).lazyZip(rightKeys).foreach { (n, la, ra) =>
      if (la.dataType != ra.dataType)
        throw new IllegalArgumentException(
          s"$fn: key '$n' types differ (left ${la.dataType.simpleString}, " +
            s"right ${ra.dataType.simpleString}); cast one side first")
    }
    if (leftTime.dataType != rightTime.dataType)
      throw new IllegalArgumentException(
        s"$fn: time column '$timeCol' types differ " +
          s"(left ${leftTime.dataType.simpleString}, " +
          s"right ${rightTime.dataType.simpleString}); cast one side first")
    val dup = AsOfJoin.payload(rPlan.output, rightKeys, rightTime)
      .map(_.name).filter(rn => lPlan.output.exists(a => resolver(a.name, rn)))
    if (dup.nonEmpty)
      throw new IllegalArgumentException(
        s"$fn: right payload columns ${dup.mkString(", ")} " +
          "collide with left columns; rename them first")
    DatasetShim.ofRows(spark,
      AsOfJoinNode(leftKeys, rightKeys, leftTime, rightTime,
        forward, lPlan, rPlan))
  }
}
