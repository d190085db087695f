package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-free distributed prefix sums.
  *
  * `Window.partitionBy(key).orderBy(ord)` computes a running sum by
  * sorting EACH key's rows into ONE window partition — correct, but a
  * serial chokepoint when one key dominates (a production corpus is
  * ~80% one provider; its billions of rows would prefix-sum on a
  * single task). This is the named scale-killer class "full shuffle
  * on a skewed key".
  *
  * [[exclusive]] is the classic two-phase scan instead (the
  * Blelloch/MPI_Exscan shape, expressed declaratively):
  *
  *   1. bucket rows by `ord div bucketWidth` — `div` is monotone in
  *      `ord`, so buckets are contiguous ranges of the sort order;
  *   2. per-(key, bucket) totals via one map-side-combining groupBy
  *      (O(keys · buckets) rows — at 1 M rows/bucket, 10 B docs of
  *      one source make 10 k rows);
  *   3. the cumulative OFFSET of each bucket from a window over that
  *      tiny aggregated frame (the only serial step — O(buckets),
  *      never O(corpus));
  *   4. broadcast the offsets back and run the within-bucket running
  *      sum with the window partitioned by (key, bucket) — parallel
  *      across buckets even when one key owns the corpus, each
  *      partition ≤ bucketWidth of `ord` span.
  *
  * Same integers as the single-window form (the within-bucket sum
  * starts from the exact offset of everything before the bucket);
  * LmSpec pins equality on multi-bucket plants.
  */
object PrefixSum {

  /** Production bucket width: ~1 M ord-units per bucket keeps the
    * offset table thousands of rows per billion-row key while each
    * within-bucket partition stays comfortably in one task. */
  val DefaultBucketWidth: Long = 1L << 20

  /** Adds `out` = exclusive running sum of `value` within `key`,
    * ordered by `ord` (`ord` must be unique per key — doc ids are).
    * Input columns pass through unchanged. */
  def exclusive(df: DataFrame, key: String, ord: String, value: String,
      out: String, bucketWidth: Long = DefaultBucketWidth): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    val bucketed = df.withColumn("__psb", expr(s"`$ord` div $bucketWidth"))
    val btot = bucketed.groupBy(col(key), col("__psb"))
      .agg(sum(col(value)).as("__pstot"))
    val wb = Window.partitionBy(col(key)).orderBy(col("__psb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = btot
      .withColumn("__psoff", coalesce(sum(col("__pstot")).over(wb), lit(0L)))
      .select(col(key), col("__psb"), col("__psoff"))
    val ww = Window.partitionBy(col(key), col("__psb")).orderBy(col(ord))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(boff), Seq(key, "__psb"))
      .withColumn(out,
        col("__psoff") + sum(col(value)).over(ww) - col(value))
      .drop("__psb", "__psoff")
  }
}
