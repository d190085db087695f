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
              schema: StructType)(onBatch: (DataFrame, Long) => Unit): Unit =
    drain(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir), checkpointDir)(onBatch)

  /** The RAW-LINES form of the same discipline — for sources whose
    * unit of quarantine is the unparsed line
    * ([[JsonlIngestStream]]), where a schema-pinned reader would
    * swallow exactly the torn bytes the absorb needs to keep. */
  def runOnceText(spark: SparkSession, inDir: String, checkpointDir: String)
                 (onBatch: (DataFrame, Long) => Unit): Unit =
    drain(spark.readStream
      .option("maxFilesPerTrigger", "1").text(inDir), checkpointDir)(onBatch)

  private def drain(stream: DataFrame, checkpointDir: String)
                   (onBatch: (DataFrame, Long) => Unit): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(onBatch)
      .start()
    q.awaitTermination()
  }
}
