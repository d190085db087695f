package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup CLUSTER maintenance: the persisted label
  * table (doc_id, label = min doc_id of its near-dup component) that
  * q63 computes from scratch, kept current as ingest batches arrive —
  * WITHOUT re-running connected components over the whole corpus.
  *
  * Per batch, the update is bounded by what the batch can change:
  *   1. new edges = batch↔corpus verified pairs
  *      ([[DedupIndex.nearEdgesAgainst]] — the FULL edge set, so a
  *      batch doc that near-dups members of two different clusters
  *      MERGES them, exactly as a from-scratch rerun would) plus
  *      batch-internal pairs ([[DedupIndex.nearEdgesWithin]]);
  *   2. touched components = existing labels of any edge endpoint;
  *   3. connected components re-run over ONLY the touched components'
  *      members (as member→label identity edges, which preserve each
  *      component's current min) + the new edges;
  *   4. everything else is untouched — and with DELTA epochs it is
  *      not even rewritten.
  *
  * Equivalence to from-scratch (StreamingSpec proves it end-to-end):
  * components only change through new edges; every member of every
  * component reachable from a new edge is in the bounded re-run, so
  * its label is the true min over the merged component; everything
  * else is untouched by construction.
  *
  * Storage layout (round-8 fix for the epoch-accumulation wart):
  * epochs are DELTAS. `epoch=0` is the init snapshot; each absorb
  * writes ONLY the recomputed (touched) rows under `epoch=<n>`, and
  * [[current]] merges with latest-wins per doc (labels are never
  * deleted, only re-pointed, so max-epoch-per-doc is the current
  * labeling). Each epoch dir is written whole (`overwrite` of the
  * explicit `epoch=<n>` path), so a re-delivered batch REPLACES its
  * own delta idempotently — and an EMPTY delta (or an init over a
  * corpus with no near-dup edges at all) still writes one
  * schema-bearing parquet file, so first-deploy reads never hit
  * schema-inference failures. [[compact]] folds every epoch into one,
  * bounding what readers list; run it on whatever cadence bounds
  * operational partition counts (e.g. daily after N absorbs).
  *
  * Scale shape: step 3's input is O(touched members + new edges) —
  * for a daily batch against a 100 TB corpus that is the handful of
  * clusters the batch brushes, not the corpus — and the delta write
  * is the same O(touched) rows, not the full label table.
  */
object ClusterMaintenance {

  /** Initialize the label table from a full corpus: the from-scratch
    * q63 chain (LSH pairs → connected components), written as
    * `epoch=0`. Any earlier epochs under `labelDir` are cleared. */
  def init(spark: SparkSession, corpus: DataFrame, labelDir: String): Unit = {
    val edges = DedupIndex.nearEdgesWithin(spark, corpus)
    val labels = graft.ops.ConnectedComponents.run(edges, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("label"))
    // RESET (not heal) any in-flight compaction: init is destroying
    // the store's contents — healing here would later resurrect the
    // PREVIOUS deployment's snapshot over the fresh epoch=0
    graft.ops.StoreCompaction.reset(spark, labelDir)
    val fs = new Path(labelDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    epochPaths(spark, labelDir).foreach(p => fs.delete(p, true))
    writeEpoch(labels, labelDir, 0L)
  }

  /** The current label snapshot: latest-wins merge of the delta
    * epochs — for each doc, the label row with the highest epoch.
    * Partition value inference may type `epoch` int or long —
    * normalize. Empty table (no-duplicate corpus) yields an empty
    * (doc_id, label) frame, not an error. */
  def current(spark: SparkSession, labelDir: String): DataFrame = {
    graft.ops.StoreCompaction.heal(spark, labelDir, "epoch")
    spark.read.parquet(labelDir)
      .withColumn("epoch", col("epoch").cast("long"))
      .groupBy(col("doc_id"))
      .agg(max_by(col("label"), col("epoch")).as("label"))
  }

  /** Absorb one ingest batch: bounded component re-run (class doc),
    * ONLY the recomputed rows written as the `epoch = batchId + 1`
    * delta (whole-dir overwrite — a re-delivered batch replaces its
    * own delta). `excludeRun` forwards to the index reads, mirroring
    * [[DedupScreenStream.deliver]]'s at-least-once discipline.
    * `extraEdges`: additional verified near-dup edges to fold in
    * beyond the main index probe (the screened-doc side index —
    * see [[DedupScreenStream]]). */
  def absorb(spark: SparkSession, batch: DataFrame, indexDir: String,
             labelDir: String, batchId: Long,
             excludeRun: Option[String] = None,
             extraEdges: Option[DataFrame] = None): Unit = {
    val probed = DedupIndex.nearEdgesAgainst(spark, batch, indexDir, excludeRun)
      .union(DedupIndex.nearEdgesWithin(spark, batch))
    val newEdges = extraEdges.fold(probed)(probed.union)
      .localCheckpoint() // referenced 3× below; edges are tiny
    val labels = current(spark, labelDir)

    val endpoints = newEdges.select(col("id_a").as("doc_id"))
      .union(newEdges.select(col("id_b").as("doc_id"))).distinct()
    val touchedLabels = labels.join(endpoints, Seq("doc_id"))
      .select(col("label")).distinct()
    val touched = labels.join(touchedLabels, Seq("label"))
    // member→label identity edges keep every touched member in the
    // graph (and with it the component's current min id)
    val memberEdges = touched.select(col("doc_id").as("id_a"), col("label").as("id_b"))
    val recomputed = graft.ops.ConnectedComponents
      .run(memberEdges.union(newEdges), "id_a", "id_b")
      .select(col("id").as("doc_id"), col("label"))
    // materialize BEFORE writing: on re-delivery the current snapshot
    // being merged includes the very epoch dir being overwritten, and
    // a lazy plan would read files mid-replacement
    writeEpoch(recomputed.localCheckpoint(), labelDir, batchId + 1L)
  }

  /** Fold every delta epoch into a single `epoch=<max>` snapshot so
    * [[current]] lists O(1) partitions regardless of how many batches
    * have been absorbed. Crash-recoverable via
    * [[graft.ops.StoreCompaction]] (snapshot to a temp dir, commit
    * marker, delete, rename — [[current]] heals an interrupted fold
    * on its next read; the first cut overwrote the live max-epoch dir
    * in place, where a crash mid-write silently served stale labels).
    * Run at a QUIESCENT point (stream stopped or checkpoint
    * committed): a re-delivery of an already-compacted batch would
    * overwrite the merged snapshot with that batch's delta. */
  def compact(spark: SparkSession, labelDir: String): Unit = {
    graft.ops.StoreCompaction.heal(spark, labelDir, "epoch")
    val paths = epochPaths(spark, labelDir)
    if (paths.length <= 1) return
    val maxEpoch = paths.map(epochOf).max
    graft.ops.StoreCompaction.fold(spark, labelDir, "epoch", maxEpoch.toString,
      current(spark, labelDir)
        .select(col("doc_id").cast("long"), col("label").cast("long")))
  }

  /** How many epoch partitions a reader currently lists (spec hook
    * for the compaction contract). */
  private[graft] def epochCount(spark: SparkSession, labelDir: String): Int = {
    graft.ops.StoreCompaction.heal(spark, labelDir, "epoch")
    epochPaths(spark, labelDir).length
  }

  private def epochPaths(spark: SparkSession, labelDir: String): Array[Path] = {
    val root = new Path(labelDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("epoch="))
  }

  private def epochOf(p: Path): Long = p.getName.stripPrefix("epoch=").toLong

  /** One epoch dir, written whole: explicit-path overwrite keeps the
    * write idempotent per epoch, and Spark's writer emits at least
    * one schema-bearing file even for zero rows — the empty-corpus /
    * empty-delta cases stay readable. */
  private def writeEpoch(labels: DataFrame, labelDir: String, epoch: Long): Unit =
    labels.select(col("doc_id").cast("long"), col("label").cast("long"))
      .write.mode("overwrite").parquet(s"$labelDir/epoch=$epoch")
}
