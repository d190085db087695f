package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The (source, term, count) table materialized ONCE per (session,
  * corpus dir) for the gated stylometry/LOO consumers — the round-18
  * memory-hygiene fix's recovery (r18 verdict #2): scoping q177/
  * q179's count-table cache per call stopped a long-lived session
  * from pinning one dataset per audit export, but doubled both
  * queries (q179 0.46 → 1.02 s clean) because each invocation paid
  * the full tokenize + combine again. The count table is exactly the
  * shape the trained-stage memo machinery serves — built once in
  * Bench's untimed warmup, disclosed in `trained_stages`
  * (SparkEntry.trainedStageQueries), stats-bearing parquet so the
  * consumers' keyed joins keep adaptive broadcast at every scale
  * ([[graft.ops.ParquetStage]]'s checkpoint-vs-parquet note).
  *
  * Only the two GATED query entries consume this memo; the spec
  * hooks ([[Corpus.looNovelty]]/[[Corpus.stylometry]] over planted
  * frames) and the maintenance serve path
  * ([[graft.pipeline.CorpusStatsMaintenance]]'s own persisted store)
  * keep their scoped lifecycles — the memo is keyed by corpus DIR,
  * which an arbitrary planted frame does not have.
  *
  * Staleness/eviction: the [[graft.ops.SessionStage]] contract
  * (corpus snapshots immutable per path; reset() deletes the parquet
  * dir — ScaleProbe resets per rep so the probed exponents stay
  * end-to-end).
  */
object SourceTermStage {

  private val stage = new graft.ops.ParquetStage("source-term-counts",
    (s, d) => Corpus.sourceTermCounts(
      graft.Tables.documents(s, d).select(col("source"), col("text"))))

  /** The memoized (source, w, csw) count table for the corpus under
    * `d` (first call per (session, dir) tokenizes and writes; later
    * calls scan the parquet). */
  def counts(s: SparkSession, d: String): DataFrame = stage.get(s, d)

  /** How many times the count pass actually executed (spec hook:
    * q177 + q179, one build — TrainedStageSpec). */
  def buildCount: Int = stage.buildCount

  /** Drop the memo and its parquet dir (test isolation; ScaleProbe's
    * per-rep cold start). */
  private[graft] def reset(): Unit = stage.reset()
}
