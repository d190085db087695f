package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** The shared checkpointed-ingest shape behind every absorb-per-batch
  * streaming twin ([[MixtureStream]], [[DriftStream]],
  * [[AnnIngestStream]], [[HybridIngestStream]]): a schema-pinned
  * file source, one file per trigger, `Trigger.AvailableNow`, and a
  * foreachBatch that hands (batch, batchId) to the store's absorb —
  * which keys its write `run=b<batchId>` so at-least-once
  * re-delivery replaces rather than duplicates. ONE definition of
  * the delivery discipline: a fix to the trigger or checkpoint
  * handling reaches every twin instead of drifting across four
  * copies (the first cut had exactly that — four verbatim clones).
  */
private[streaming] object FileIngest {

  def runOnce(spark: SparkSession, inDir: String, checkpointDir: String,
              schema: StructType)(onBatch: (DataFrame, Long) => Unit): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(onBatch)
      .start()
    q.awaitTermination()
  }
}
