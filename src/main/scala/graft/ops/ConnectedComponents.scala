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
  * component minimum.
  *
  * Iteration mechanics: per-round `localCheckpoint` truncates
  * lineage so the plan doesn't grow with iterations (the classic
  * iterative-DataFrame trap), and each superseded round's
  * checkpoint blocks are unpersisted as soon as the next round
  * lands — `spark.catalog.clearCache()` does NOT free
  * localCheckpoint storage, so without the explicit release every
  * round's label table would sit in executor storage until RDD GC.
  * Labels are a (long, long) pair per vertex, 4 orders smaller than
  * the documents they describe. NOTE: `run` EXECUTES jobs (the
  * convergence loop needs per-round actions) — callers get back a
  * small materialized label table, not a lazy plan.
  */
object ConnectedComponents {

  /** One propagation round as a lazy plan (exposed so tests can
    * audit the loop's join shapes, which `run`'s checkpointing hides
    * from the final plan): neighbor-min via the symmetrized edges,
    * then the pointer-jump shortcut. Output: (id, prev, label).
    *
    * `jump = false` skips the shortcut join — used for round 1 only,
    * where labels are still the identity so label-of-label == label
    * and the join is a provable no-op (one saved shuffle round-trip;
    * jumping starts paying once chains of labels exist). */
  private[graft] def roundStep(sym: DataFrame, labels: DataFrame,
                               jump: Boolean = true): DataFrame = {
    val nbrMin = sym
      .join(labels.select(col("id").as("dst"), col("label").as("nbr_label")), "dst")
      .groupBy(col("src").as("id")).agg(min(col("nbr_label")).as("nbr_min"))
    val propagated = labels.join(nbrMin, "id")
      .select(col("id"), col("label").as("prev"),
        least(col("label"), col("nbr_min")).as("lab1"))
    if (!jump) return propagated.select(col("id"), col("prev"), col("lab1").as("label"))
    // pointer jump: a label is itself a vertex id, so look up ITS
    // (previous-round) label — always <= itself — and shortcut to
    // it. This is what turns O(diameter) rounds into O(log d).
    propagated.join(
        labels.select(col("id").as("jid"), col("label").as("jlabel")),
        propagated("lab1") === col("jid"))
      .select(col("id"), col("prev"),
        least(col("lab1"), col("jlabel")).as("label"))
  }

  /** Release one DataFrame's localCheckpoint blocks (the checkpointed
    * plan is a LogicalRDD over the materialized RDD). Shared with the
    * other iterative driver loops (BpeTrainer). */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    org.apache.spark.sql.graftshim.DatasetShim.analyzed(df) match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Labels every vertex incident to an edge in `edges` with the
    * minimum vertex id of its connected component. Edge orientation
    * is irrelevant (the edge list is symmetrized internally).
    * Executes the convergence loop eagerly (see class doc).
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

    // every vertex came from an edge, so the propagation join in
    // roundStep always matches — inner joins, no coalesce needed
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    // the checkpointed DataFrame backing `labels` (after round 1,
    // `labels` is a projection OVER the round's checkpoint, so the
    // release must target the checkpoint handle itself)
    var backing = labels

    var iter = 0
    var changed = 1L
    while (changed > 0) {
      if (iter >= maxIter) {
        releaseCheckpoint(sym)
        releaseCheckpoint(backing)
        throw new IllegalStateException(
          s"ConnectedComponents: no fixpoint after $maxIter rounds — " +
            "even with pointer jumping the component structure exceeds " +
            "the bound; raise maxIter")
      }
      val jumped = roundStep(sym, labels, jump = iter > 0).localCheckpoint()
      // labels only ever decrease (min is monotone), so `label <
      // prev` counts exactly the vertices still moving; checkpoint
      // BEFORE the count so the action and the next round share one
      // materialization instead of recomputing the joins
      changed = jumped.filter(col("label") < col("prev")).count()
      // the previous round's blocks are now superseded — free them
      releaseCheckpoint(backing)
      backing = jumped
      labels = jumped.select(col("id"), col("label"))
      iter += 1
    }
    releaseCheckpoint(sym)
    labels
  }
}
