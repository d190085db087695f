package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: the WRITE→SKIP round trip that q80
  * only computes statistics for. [[write]] lays a table out in
  * z-key order — files partitioned on the z-range bucket, rows
  * sorted by z within each file — and records each file's
  * per-dimension min/max spans; [[prunedScan]] answers a 2-D box
  * query by consulting the spans FIRST and scanning only the files
  * whose spans intersect the box (ZorderSpec asserts the file-count
  * reduction and result equality against a full scan).
  *
  * Why z-order: a plain sort gives min/max locality on one leading
  * column only; interleaving the bits of both dimensions bounds each
  * file's span in BOTH, so a selective box prunes most files
  * whichever dimension it constrains (Delta/Iceberg OPTIMIZE ZORDER
  * — same layout, same skipping stats). Scale shape: the span table
  * is one row per file (a catalog's file-statistics view); the
  * candidate-file decision is a scan of that table, never the data.
  * The spans land under `<dir>/_spans` — underscore-prefixed paths
  * are invisible to the table's own readers.
  */
object ZorderLayout {

  /** Interleave two 8-bit bucket columns into a 16-bit Morton key
    * (bit b of x → bit 2b, bit b of y → bit 2b+1) — q80's exact
    * integer formula. */
  def zKey(x: Column, y: Column): Column =
    (0 until 8).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** Write `df` z-ordered on two bucket expressions (values must be
    * in [0, 256)). One file per z-range bucket (`z >> fileShift`),
    * rows z-sorted within files, spans recorded alongside. At scale
    * this is `repartitionByRange(z).sortWithinPartitions(z)` with
    * the catalog keeping the spans; here the bucket IS the partition
    * key so the spec can count pruned files deterministically. */
  def write(df: DataFrame, xBucket: Column, yBucket: Column,
            dir: String, fileShift: Int = 10): Unit = {
    val keyed = df
      .withColumn("zx", xBucket.cast("long"))
      .withColumn("zy", yBucket.cast("long"))
      .withColumn("z", zKey(col("zx"), col("zy")))
      .withColumn("zfile", shiftright(col("z"), fileShift))
    keyed
      .repartition(col("zfile"))
      .sortWithinPartitions(col("z"))
      .write.partitionBy("zfile").mode("overwrite").parquet(dir)
    keyed.groupBy(col("zfile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("zx")).as("x_min"), max(col("zx")).as("x_max"),
        min(col("zy")).as("y_min"), max(col("zy")).as("y_max"))
      .write.mode("overwrite").parquet(s"$dir/_spans")
  }

  /** Box query via the recorded spans: files whose [x,y] spans miss
    * the box are never opened (their zfile partitions prune at the
    * scan). Returns rows with the layout's zx/zy/z/zfile columns
    * still attached. */
  def prunedScan(spark: SparkSession, dir: String,
                 xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    // the skipping decision: one pass over the per-file span table
    // (catalog metadata at scale — bounded by file count, not rows)
    val cand = spark.read.parquet(s"$dir/_spans")
      .filter(!(col("x_max") < xLo || col("x_min") > xHi ||
        col("y_max") < yLo || col("y_min") > yHi))
      .select(col("zfile").cast("long")).collect()
      .map(_.getLong(0)).toIndexedSeq
    spark.read.parquet(dir)
      .filter(col("zfile").cast("long").isin(cand: _*))
      .filter(col("zx").between(xLo, xHi) && col("zy").between(yLo, yHi))
  }
}
