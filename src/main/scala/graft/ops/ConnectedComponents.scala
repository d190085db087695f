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
  * Scale shape (100 TB): each round is three hash-shuffles keyed on
  * vertex id — the (symmetrized) edge list joined against the label
  * table, a min-aggregation back to vertices, and one pointer-jump
  * lookup — exactly the partitioning a 1000-executor cluster wants;
  * no step ever collects vertices or edges to the driver. The
  * pointer jump (label ← min(label, label(label)), classic path
  * shortcutting) is what bounds the rounds: plain neighbor-min
  * propagation needs O(diameter) rounds, which an adversarial
  * long-chain component turns into an O(n)-round job; with
  * shortcutting the label distance to the component minimum roughly
  * halves per round, so convergence is O(log diameter) — the same
  * round bound class as the alternating large-star/small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce
  * and Beyond") with a much simpler loop body. Correctness is
  * unchanged: every label is always the id of a node in the same
  * component (true of neighbor minima and of labels-of-labels by
  * induction), labels only decrease, and the fixpoint of the
  * combined step is the fixpoint of plain propagation — the
  * component minimum. Per-round `localCheckpoint` truncates lineage
  * so the plan doesn't grow with iterations (the classic
  * iterative-DataFrame trap); labels are a (long, long) pair per
  * vertex, 4 orders smaller than the documents they describe.
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
      val propagated = labels.join(nbrMin, "id")
        .select(col("id"), col("label").as("prev"),
          least(col("label"), col("nbr_min")).as("lab1"))
      // pointer jump: a label is itself a vertex id, so look up ITS
      // (previous-round) label — always <= itself — and shortcut to
      // it. This is what turns O(diameter) rounds into O(log d).
      val jumped = propagated.join(
          labels.select(col("id").as("jid"), col("label").as("jlabel")),
          propagated("lab1") === col("jid"))
        .select(col("id"), col("prev"),
          least(col("lab1"), col("jlabel")).as("label"))
        .localCheckpoint()
      // labels only ever decrease (min is monotone), so `label <
      // prev` counts exactly the vertices still moving; checkpoint
      // BEFORE the count so the action and the next round share one
      // materialization instead of recomputing the joins
      changed = jumped.filter(col("label") < col("prev")).count()
      labels = jumped.select(col("id"), col("label"))
      iter += 1
    }
    labels
  }
}
