package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank by power iteration — the crawl-authority
  * signal web-scale corpus pipelines rank domains/pages with when
  * deciding what to harvest and keep (CommonCrawl publishes exactly
  * this family of ranks for its corpus; RefinedWeb/CCNet-style
  * curation consumes URL-level authority as a quality prior). q101
  * exposes one ranking run over a derived citation graph as an
  * oracle-gated query.
  *
  * Distributed shape: one round = two hash equi-joins on `src`
  * (edges ⨝ ranks ⨝ outdeg — AQE-splittable; a viral page's
  * in-links spread across partitions) and one map-side-combined
  * aggregation on `dst` (a hot TARGET reduces to one partial per
  * partition before the shuffle — in-degree skew, the real-world
  * skew of link graphs, cannot concentrate). Rank state is one row
  * per node; the loop runs the [[ConnectedComponents]] device —
  * per-round localCheckpoint truncates lineage, superseded blocks
  * release immediately, and nothing O(graph) ever reaches the
  * driver.
  *
  * Cross-engine determinism (graft.ops.Determinism conventions):
  * ranks live as int64 MICRO-UNITS. Per-edge contributions compute
  * in double with a fixed operation order
  * (((rm/1e6)/outdeg)·1e6, floored) and micro-quantize BEFORE the
  * order-independent integer sum; the update
  * base + floor(d·inflow + 0.5) is the same left-assoc double
  * arithmetic in both engines. No exp/ln — the arithmetic is
  * division and multiplication only, bit-identical cross-engine.
  *
  * Simplification (documented): dangling-node mass (out-degree 0)
  * is dropped rather than redistributed, the common sparse-graph
  * shortcut — total rank then undershoots 1 by the dangling share;
  * GraphSpec pins conservation on dangling-free graphs.
  */
object PageRank {

  val Damping = 0.85
  val Rounds = 6

  /** Rank every node of `edges(src, dst)`. Returns (node,
    * rank_micro) — one row per distinct endpoint. */
  def run(edges: DataFrame, rounds: Int = Rounds,
          damping: Double = Damping): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // the edge list stays LAZY on purpose: each round re-derives it,
    // but q101's link table is a narrow map over a pruned doc_id
    // scan, and a checkpointed variant measured no faster (the
    // materialization write offsets the saved re-derivations).
    // Callers whose edges are genuinely expensive to produce should
    // checkpoint before calling.
    val e = edges
    val nodes = e.select($"src".as("node"))
      .union(e.select($"dst".as("node")))
      .distinct().localCheckpoint()
    val outdeg = e.groupBy($"src")
      .agg(count(lit(1)).as("outdeg")).localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pagerank: empty graph")
    // identical left-assoc double arithmetic to the SQL replay
    val baseMicro = math.floor((1 - damping) / n * 1e6 + 0.5).toLong
    val initMicro = math.floor(1e6 / n + 0.5).toLong
    var ranks = nodes.select($"node", lit(initMicro).as("rm"))
      .localCheckpoint()
    var backing = ranks
    for (_ <- 1 to rounds) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select($"dst", floor($"rm".cast("double") / lit(1e6) /
          $"outdeg".cast("double") * lit(1e6) + lit(0.5))
          .cast("long").as("c"))
      val inflow = contrib.groupBy($"dst").agg(sum($"c").as("infl"))
      val next = nodes
        .join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select($"node", (lit(baseMicro) +
          floor(lit(damping) * coalesce($"infl", lit(0L)).cast("double")
            + lit(0.5)).cast("long")).as("rm"))
        .localCheckpoint()
      ConnectedComponents.releaseCheckpoint(backing)
      backing = next
      ranks = next
    }
    // the returned frame is itself a checkpoint (LogicalRDD) — the
    // static node/out-degree tables' blocks can release now (the
    // ConnectedComponents exit discipline; clearCache() would NOT
    // free these, they are not catalog cache)
    ConnectedComponents.releaseCheckpoint(nodes)
    ConnectedComponents.releaseCheckpoint(outdeg)
    ranks
  }
}
