package graft.pipeline

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
  *   4. untouched label rows carry over verbatim.
  *
  * Equivalence to from-scratch (StreamingSpec proves it end-to-end):
  * components only change through new edges; every member of every
  * component reachable from a new edge is in the bounded re-run, so
  * its label is the true min over the merged component; everything
  * else is untouched by construction.
  *
  * Scale shape: step 3's input is O(touched members + new edges) —
  * for a daily batch against a 100 TB corpus that is the handful of
  * clusters the batch brushes, not the corpus. The label table
  * itself is (long, long) rows for CLUSTERED docs only. Snapshots
  * are epoch-versioned (`epoch=<n>` partitions, one per absorbed
  * batch, replaced idempotently on re-delivery — the same keyed-sink
  * discipline as [[DedupScreenStream]]'s verdict sink); readers take
  * the max epoch. A production deployment compacts old epochs away;
  * the read path already ignores them.
  */
object ClusterMaintenance {

  /** Initialize the label table from a full corpus: the from-scratch
    * q63 chain (LSH pairs → connected components), written as
    * `epoch=0`. */
  def init(spark: SparkSession, corpus: DataFrame, labelDir: String): Unit = {
    val edges = DedupIndex.nearEdgesWithin(spark, corpus)
    val labels = graft.ops.ConnectedComponents.run(edges, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("label"))
    labels.withColumn("epoch", lit(0L))
      .write.partitionBy("epoch").mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .parquet(labelDir)
  }

  /** The current label snapshot: rows of the max epoch. (Partition
    * value inference may type `epoch` int or long — normalize.) */
  def current(spark: SparkSession, labelDir: String): DataFrame = {
    val all = spark.read.parquet(labelDir)
      .withColumn("epoch", col("epoch").cast("long"))
    val maxEpoch = all.agg(max(col("epoch"))).head().getLong(0)
    all.filter(col("epoch") === lit(maxEpoch)).select(col("doc_id"), col("label"))
  }

  /** Absorb one ingest batch: bounded component re-run (class doc),
    * snapshot written as `epoch = batchId + 1` (dynamic partition
    * overwrite — a re-delivered batch replaces its own epoch).
    * `excludeRun` forwards to the index reads, mirroring
    * [[DedupScreenStream.deliver]]'s at-least-once discipline. */
  def absorb(spark: SparkSession, batch: DataFrame, indexDir: String,
             labelDir: String, batchId: Long,
             excludeRun: Option[String] = None): Unit = {
    val newEdges = DedupIndex.nearEdgesAgainst(spark, batch, indexDir, excludeRun)
      .union(DedupIndex.nearEdgesWithin(spark, batch))
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
    val untouched = labels.join(touchedLabels, Seq("label"), "left_anti")
      .select(col("doc_id"), col("label"))
    // materialize BEFORE writing: on re-delivery the current snapshot
    // can be the very epoch being overwritten, and a lazy plan would
    // read files mid-replacement
    val updated = untouched.union(recomputed).localCheckpoint()
    updated.withColumn("epoch", lit(batchId + 1L))
      .write.partitionBy("epoch").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(labelDir)
  }
}
