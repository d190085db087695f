package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.pipeline.AnnIndex

/** Continuous-ingest ANN indexing: each arriving micro-batch of
  * vectors encodes against the FROZEN codebooks and appends to the
  * persisted [[AnnIndex]] — the streaming twin of
  * [[AnnIndex.append]], with [[DedupScreenStream]]'s delivery
  * discipline: the code append is keyed `run=b<batchId>` (dynamic
  * partition overwrite), so an at-least-once re-delivery replaces
  * its own rows instead of duplicating the index. Searches running
  * against the index see each batch atomically as its parquet
  * commit lands.
  *
  * Codebook drift is the operator's standard trade (class doc of
  * [[AnnIndex]]): frozen codebooks keep every batch O(batch); a
  * periodic [[AnnIndex.build]] re-trains offline.
  */
object AnnIngestStream {

  /** One checkpointed pass over whatever vector files are new in
    * `inDir` (Trigger.AvailableNow). The index at `indexDir` must
    * exist ([[AnnIndex.build]]). Schema: (vec_id long, vec
    * array<double>). */
  def runOnce(spark: SparkSession, inDir: String, indexDir: String,
              checkpointDir: String, schema: StructType): Unit = {
    FileIngest.runOnce(spark, inDir, checkpointDir, schema) {
      (batch, batchId) =>
        AnnIndex.append(spark,
          batch.select(col("vec_id"), col("vec")), indexDir, s"b$batchId")
    }
  }
}
