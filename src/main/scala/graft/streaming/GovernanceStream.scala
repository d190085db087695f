package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Continuous release-governance maintenance — the streaming twin of
  * [[graft.pipeline.GovernanceMaintenance]]: each arriving
  * micro-batch lands its additive sufficient statistic under
  * `run=b<batchId>`, so the k-anonymity release verdicts (q171) and
  * the bootstrap confidence intervals (q172) are servable at any
  * moment at O(batch) absorbed cost — the governance posture an
  * always-ingesting feed needs (the moment a delivery creates a
  * singleton QI cell is exactly when the suppress flag must flip,
  * not at the next nightly scan).
  *
  * Delivery semantics: foreachBatch is at-least-once; each absorb is
  * a dynamic partition overwrite keyed on the batch id, so a
  * re-delivered batch rewrites its own partition instead of
  * double-counting (the [[DedupScreenStream]] discipline).
  * [[graft.pipeline.GovernanceMaintenance]]'s compactors fold the
  * accumulated runs at a quiescent point.
  */
object GovernanceStream {

  /** One checkpointed pass over whatever QI-record parquet files
    * (nationkey, segment, band, sensitive) are new in `inDir`
    * (Trigger.AvailableNow); safe to call repeatedly as files land. */
  def runQiOnce(spark: SparkSession, inDir: String, storeDir: String,
                checkpointDir: String, schema: StructType): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.GovernanceMaintenance
          .absorbQi(spark, batch, storeDir, s"b$batchId")
      }
      .start()
    q.awaitTermination()
  }

  /** Same pass over raw document parquet (doc_id, source, text) for
    * the bootstrap partials. */
  def runBootOnce(spark: SparkSession, inDir: String, storeDir: String,
                  checkpointDir: String, schema: StructType): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.pipeline.GovernanceMaintenance
          .absorbBoot(spark, batch, storeDir, s"b$batchId")
      }
      .start()
    q.awaitTermination()
  }
}
