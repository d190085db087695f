package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.pipeline.HybridRetrieval

/** Continuous document ingest into the served hybrid-retrieval
  * store: each arriving micro-batch of documents lands as one
  * [[HybridRetrieval.append]] run — postings, df/stat deltas, raw
  * vectors (BEFORE codes) and the ANN codes, all keyed
  * `run=b<batchId>` so an at-least-once re-delivery replaces its own
  * partitions instead of double-counting df ([[DedupScreenStream]]'s
  * delivery discipline). Searches running against the store see each
  * batch's lexical side EXACTLY (integer-delta folds) as its commits
  * land; the ANN side carries [[graft.pipeline.AnnIndex]]'s frozen-
  * codebook trade, monitored by its drift telemetry.
  *
  * ID contract: the `run=` keying makes SAME-batch re-execution
  * idempotent, but a producer that re-drops already-absorbed
  * documents as NEW files delivers them under a new batch id and the
  * store counts them twice (inflated df/n/sumdl, duplicate raw
  * rows). Cross-run uniqueness of doc_ids is the producer's
  * obligation — the same contract every `append`-family store in
  * this engine states — and a content-dedup front (screen with
  * [[DedupScreenStream]] before ingesting here) is the engine's own
  * tool for producers that cannot promise it.
  */
object HybridIngestStream {

  /** One checkpointed pass over whatever document files are new in
    * `inDir` (Trigger.AvailableNow). The store at `dir` must exist
    * ([[HybridRetrieval.build]]). Schema: (doc_id long,
    * text string). */
  def runOnce(spark: SparkSession, inDir: String, dir: String,
              checkpointDir: String, schema: StructType): Unit = {
    FileIngest.runOnce(spark, inDir, checkpointDir, schema) {
      (batch, batchId) =>
        HybridRetrieval.append(spark,
          batch.select(col("doc_id"), col("text")), dir, s"b$batchId")
    }
  }
}
