package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The materialized citation-graph edge list both graph analytics
  * consume: q101 (PageRank) and q170 (triangle participation) rank
  * and count over the SAME derived (src, dst) frame, computed ONCE
  * per (session, corpus dir) and shared — the round-15 verdict's
  * shared-stage ask (#2), the [[NearDupStage]] pattern.
  *
  * Why it exists: built independently, q101 re-derives the edge map
  * once per power round (6 pruned corpus scans) and q170 derives it
  * again before canonicalizing — the two queries were the #2 and
  * #16 most expensive clean-bench entries, answering two questions
  * about ONE graph. A production pipeline materializes its link
  * table once (CommonCrawl publishes the edge list beside the rank
  * files for exactly this reason) and every analytic scans that.
  *
  * Mechanics: the edges materialize as PARQUET via
  * [[graft.ops.ParquetStage]] — two-long rows, ~3 per document,
  * orders smaller than the corpus. Round 17 replaced the original
  * `localCheckpoint` here: a checkpointed-RDD scan carries no size
  * statistics, and q101/q170 both JOIN against this frame, so a
  * stats-less memo blocks their adaptive broadcast exactly when the
  * graph grows (the same hazard the round-16 10× probe measured on
  * the pair memo — q147 5.1 s → 26.6 s); the parquet file also
  * survives `spark.catalog.clearCache()` (Verify/Bench call it
  * between queries) like any other store, and GraphSpec pins that
  * the consumers' plans read a stats-bearing file scan. Staleness/
  * eviction contract: [[graft.ops.SessionStage]]. The correctness
  * gate is untouched — both oracles replay the derivation from
  * scratch in SQL every run.
  */
object CitationStage {

  private val stage = new graft.ops.ParquetStage("citation-edges",
    (s, d) => Graph.citationEdges(graft.Tables.documents(s, d)))

  /** The derived citation edges (src, dst), materialized once per
    * (session, dir). */
  def edges(s: SparkSession, d: String): DataFrame = stage.get(s, d)

  /** How many times the derivation actually executed (spec hook:
    * two consumers, one build — GraphSpec). */
  def buildCount: Int = stage.buildCount

  /** Drop cached stages (test isolation). */
  private[graft] def reset(): Unit = stage.reset()
}
