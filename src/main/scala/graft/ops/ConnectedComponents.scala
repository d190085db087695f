package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label
  * propagation (the Pregel/GraphX formulation): every vertex starts
  * labeled with its own id and repeatedly takes the minimum of its
  * own label and its neighbors' labels until nothing changes. The
  * fixpoint labels each vertex with the smallest vertex id in its
  * component — a canonical, deterministic cluster id.
  *
  * Why the engine needs it: every dedup family (q23/q24/q29/q34)
  * ends at verified near-duplicate PAIRS, but a curation pipeline
  * must act on CLUSTERS — "keep one representative per group of
  * mutual near-dups" is a connected-components question the moment
  * A~B and B~C without A~C (the reference stops at pairwise merge,
  * `/root/reference/process.py:119-129`; this is the transitive
  * closure of it).
  *
  * Scale shape (100 TB): each round is two hash-shuffles keyed on
  * vertex id — a join of the (symmetrized) edge list against the
  * label table and a min-aggregation back to vertices — exactly the
  * partitioning a 1000-executor cluster wants; no step ever
  * collects vertices or edges to the driver. Rounds needed = graph
  * diameter; near-dup clusters are short-diameter by construction
  * (members pairwise-similar to a shared core), so convergence is a
  * handful of rounds. For adversarial long-chain graphs the
  * alternating large-star/small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") trades the same
  * per-round shuffles for O(log²·) rounds — the driver loop below
  * would host it unchanged. Per-round `localCheckpoint` truncates
  * lineage so the plan doesn't grow exponentially with iterations
  * (the classic iterative-DataFrame trap); labels are a (long, long)
  * pair per vertex, 4 orders smaller than the documents they
  * describe.
  */
object ConnectedComponents {

  /** Labels every vertex incident to an edge in `edges` with the
    * minimum vertex id of its connected component. Edge orientation
    * is irrelevant (the edge list is symmetrized internally).
    *
    * @param edges   DataFrame with two integral id columns
    * @param srcCol  name of the first endpoint column
    * @param dstCol  name of the second endpoint column
    * @param maxIter safety bound on propagation rounds; exceeding it
    *                throws rather than returning wrong labels
    * @return DataFrame(id, label) — one row per distinct endpoint,
    *         label = min id of its component
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxIter: Int = 30): DataFrame = {
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // materialize the symmetrized edge list ONCE: every round joins
    // against it, and without this the whole upstream edge pipeline
    // (for q63, the minhash+LSH+verify chain) would re-execute per
    // round. The edge list of a dedup graph is orders smaller than
    // the corpus it came from, so executor-local storage holds it.
    val sym = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    // every vertex came from an edge, so the propagation join below
    // always matches — inner join, no coalesce needed
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()

    var iter = 0
    var changed = 1L
    while (changed > 0) {
      if (iter >= maxIter)
        throw new IllegalStateException(
          s"ConnectedComponents: no fixpoint after $maxIter rounds — " +
            "component diameter exceeds the bound; raise maxIter or switch " +
            "this loop to the large-star/small-star step")
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nbr_label")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nbr_label")).as("nbr_min"))
      // labels only ever decrease (min is monotone), so `label <
      // prev` counts exactly the vertices still moving; checkpoint
      // BEFORE the count so the action and the next round share one
      // materialization instead of recomputing the join
      val next = labels.join(nbrMin, "id")
        .select(col("id"), col("label").as("prev"),
          least(col("label"), col("nbr_min")).as("label"))
        .localCheckpoint()
      changed = next.filter(col("label") < col("prev")).count()
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    labels
  }
}
