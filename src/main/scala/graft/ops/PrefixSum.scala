package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Skew-free distributed prefix sums.
  *
  * `Window.partitionBy(key).orderBy(ord)` computes a running sum by
  * sorting EACH key's rows into ONE window partition — correct, but a
  * serial chokepoint when one key dominates (a production corpus is
  * ~80% one provider; its billions of rows would prefix-sum on a
  * single task). This is the named scale-killer class "full shuffle
  * on a skewed key".
  *
  * [[exclusive]] is the classic multi-level scan instead (the
  * Blelloch/MPI_Exscan shape, expressed declaratively):
  *
  *   1. bucket rows by `ord div bucketWidth` — `div` is monotone in
  *      `ord`, so buckets are contiguous ranges of the sort order;
  *   2. per-(key, bucket) totals via one map-side-combining groupBy;
  *   3. the cumulative OFFSET of each bucket from an exclusive scan
  *      over that aggregated frame. The frame is COUNTED (it is
  *      persisted anyway so the count reads the cached blocks):
  *      at or below [[DefaultMaxBroadcastBuckets]]
  *      rows the scan is a single window and the offsets broadcast
  *      back; above it the scan RECURSES — the bucket totals are
  *      themselves bucketed, scanned, and joined without a broadcast
  *      hint. Each recursion level divides the ordinal domain by
  *      ≥ 2²⁰, so even 64-bit ordinals collapse within four levels;
  *   4. join the offsets back and run the within-bucket running sum
  *      with the window partitioned by (key, bucket) — parallel
  *      across buckets even when one key owns the corpus.
  *
  * Density contract, made explicit after the round-14 audit: `ord`
  * must be unique per key, but it need NOT be dense. With dense doc
  * ids the offset frame is O(rows / bucketWidth) and broadcasts; with
  * sparse ordinals (64-bit content hashes — nearly every row its own
  * bucket) the frame is O(rows), and the counted guard routes it
  * through the recursive path instead of broadcasting an unbounded
  * frame to the driver. Same integers either way; LmSpec pins
  * multi-bucket ≡ single-window equality on dense, gapped, AND
  * 2⁴⁰-spaced sparse plants (the sparse case with the threshold
  * forced low so the recursive path demonstrably fires).
  */
object PrefixSum {

  /** Production bucket width: ~1 M ord-units per bucket keeps the
    * offset table thousands of rows per billion-row key of DENSE
    * ordinals while each within-bucket partition stays comfortably
    * in one task. */
  val DefaultBucketWidth: Long = 1L << 20

  /** Largest offset frame that is broadcast (≈ 24 B/row → tens of
    * MB at the cap, the usual auto-broadcast ceiling territory).
    * Larger frames — sparse ordinals — take the recursive scan. */
  val DefaultMaxBroadcastBuckets: Long = 1L << 20

  /** Adds `out` = exclusive running sum of `value` within `key`,
    * ordered by `ord` (`ord` must be unique per key — doc ids are;
    * density is NOT required, see the object doc). Input columns
    * pass through unchanged. */
  def exclusive(df: DataFrame, key: String, ord: String, value: String,
      out: String, bucketWidth: Long = DefaultBucketWidth,
      maxBroadcastBuckets: Long = DefaultMaxBroadcastBuckets): DataFrame =
    impl(df, key, ord, value, out, bucketWidth, maxBroadcastBuckets, 0)._1

  /** Recursive body; returns the frame plus the number of scan levels
    * used (1 = dense broadcast path), which the spec asserts on. Temp
    * column names carry the depth so a recursive level never collides
    * with its parent's bucket column. */
  private[graft] def impl(df: DataFrame, key: String, ord: String,
      value: String, out: String, bucketWidth: Long,
      maxBroadcastBuckets: Long, depth: Int): (DataFrame, Int) = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    require(depth < 8,
      "prefix-sum recursion depth exceeded — the bucket domain is not shrinking")
    val b = s"__psb_$depth"
    val t = s"__pstot_$depth"
    val o = s"__psoff_$depth"
    val bucketed = df.withColumn(b, expr(s"`$ord` div $bucketWidth"))
    // persist + count: the frame feeds the count, the offset scan, and
    // (on the recursive path) a shuffle join — materialize it once.
    // MEMORY_AND_DISK (not localCheckpoint) because on the sparse path
    // this frame is O(corpus) rows: persist keeps the lineage, so an
    // executor loss recomputes the lost blocks instead of failing the
    // job, and the blocks register with the CacheManager, so the
    // SparkEntry clearCache() contract releases them between queries
    // (localCheckpoint blocks answered to neither).
    val btot = bucketed.groupBy(col(key), col(b))
      .agg(sum(col(value)).as(t)).persist(StorageLevel.MEMORY_AND_DISK)
    val nBuckets = btot.count()
    val (boff, levels) =
      if (nBuckets <= maxBroadcastBuckets) {
        val wb = Window.partitionBy(col(key)).orderBy(col(b))
          .rowsBetween(Window.unboundedPreceding, -1)
        (broadcast(btot
          .withColumn(o, coalesce(sum(col(t)).over(wb), lit(0L)))
          .select(col(key), col(b), col(o))), depth + 1)
      } else {
        // Sparse ordinals: the "tiny" frame is O(corpus). Scan it with
        // the same two-phase machinery (domain shrinks ≥ 2²⁰ per
        // level, so 64-bit ordinals bottom out in ≤ 4 levels) and join
        // WITHOUT a broadcast hint — the shuffle on (key, bucket) is
        // the same partitioning the within-bucket window needs.
        val rbw = math.max(bucketWidth, DefaultBucketWidth)
        val (rec, lv) =
          impl(btot, key, b, t, o, rbw, maxBroadcastBuckets, depth + 1)
        (rec.select(col(key), col(b), col(o)), lv)
      }
    val ww = Window.partitionBy(col(key), col(b)).orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val result = bucketed.join(boff, Seq(key, b))
      .withColumn(out, col(o) + sum(col(value)).over(ww) - col(value))
      .drop(b, o)
    (result, levels)
  }
}
