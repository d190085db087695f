package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** A3 (`/root/reference/run.py:44-47`): the reference prints
  * `len(batch)/elapsed` articles/second per micro-batch. The Spark
  * analog measures the SAME quantity without a second pass:
  * `Dataset.observe` accumulates metrics inside the job as rows
  * stream through the plan (an AccumulatorV2 under the hood), so
  * the row count costs nothing extra — unlike the re-read count()
  * the naive port would do (at 100 TB a post-write recount is a
  * full second scan of the output).
  */
object Metrics {

  /** One materialized write, with its in-flight metrics. */
  final case class WriteStats(rows: Long, seconds: Double, rowsPerSec: Double)

  /** Write `df` as parquet and return rows/elapsed/throughput from
    * the SAME job (observe-metrics, no recount scan). */
  def observedParquetWrite(df: DataFrame, outPath: String): WriteStats = {
    val obs = Observation()
    val t0 = System.nanoTime()
    df.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(outPath)
    val seconds = (System.nanoTime() - t0) / 1e9
    val rows = obs.get("rows").asInstanceOf[Long]
    WriteStats(rows, seconds, if (seconds > 0) rows / seconds else 0.0)
  }
}
