package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental release-governance maintenance — the
  * [[CorpusStatsMaintenance]] doctrine applied to the round-16
  * governance/uncertainty pair:
  *
  *  - **q171 k-anonymity / l-diversity**: the audit's whole input is
  *    the per-(QI cell, sensitive value) record count — additive
  *    across disjoint deliveries — so a data owner re-checks the
  *    release verdicts after EVERY ingest at O(batch) cost (the
  *    moment a delivery creates a singleton QI cell is exactly when
  *    the suppress flag must flip, not at the next nightly scan).
  *  - **q172 Poisson-bootstrap CI**: the replicate weight is a pure
  *    function of (doc_id, replicate), so the per-(source, replicate)
  *    weighted sums and the point-estimate sums are BOTH additive —
  *    the full-corpus confidence interval tightens delivery by
  *    delivery without ever resampling the corpus (the incremental
  *    posture Chamandy et al.'s streaming formulation was built for).
  *
  * Store layout (one root, three keyed sub-stores, all `run=<id>`
  * partitioned): `dir/qicounts` (nationkey, segment, band, sensitive,
  * n), `dir/bootreps` (source, b, s, wsum), `dir/bootpoint` (source,
  * n_docs, lsum). Absorbs are idempotent under re-delivery (dynamic
  * partition overwrite keyed on the run id — the house at-least-once
  * convention); compaction folds runs with the crash-recoverable
  * [[graft.ops.StoreCompaction]] protocol; reads always aggregate,
  * so an uncompacted store serves the same integers as a compacted
  * one. Serving goes through the SAME `FromCounts` derivations the
  * gated queries run — served ≡ batch is structural
  * (GovernanceMaintenanceSpec proves it over the union).
  *
  * Store sizes are corpus-free: O(occupied QI cells × sensitive
  * values) and O(sources × B) per run.
  */
object GovernanceMaintenance {

  private def qiStore(dir: String)  = s"$dir/qicounts"
  private def repStore(dir: String) = s"$dir/bootreps"
  private def ptStore(dir: String)  = s"$dir/bootpoint"

  // ---- q172 delivery markers --------------------------------------
  // A bootstrap delivery spans TWO sub-stores (bootreps + bootpoint),
  // and two parquet writes are not atomic together: a crash between
  // them leaves run=<id> present in one store but absent from the
  // other, and a compaction before the retry would fold that
  // half-landed state into run=base permanently (the round-16
  // advisor's window). absorbBoot acknowledges a delivery through
  // the shared [[graft.ops.DeliveryMarker]] protocol (marker written
  // only AFTER both writes; unmarked runs invisible to reads and
  // dropped by compaction; markers cleared after the last fold) —
  // protocol semantics documented once there.

  import graft.ops.DeliveryMarker

  /** Run ids whose delivery committed BOTH sub-stores. */
  private[graft] def approvedBootRuns(spark: SparkSession,
                                      dir: String): Set[String] =
    DeliveryMarker.approved(spark, dir)

  // ---- q171: k-anonymity / l-diversity --------------------------

  /** Full rebuild from a records snapshot → `run=base`. `rows` is
    * the q171 input shape (nationkey, segment, band, sensitive). */
  def buildQi(spark: SparkSession, rows: DataFrame, dir: String): Unit =
    graft.queries.Cleaning.qiCounts(rows)
      .withColumn("run", lit("base"))
      .write.partitionBy("run").mode("overwrite").parquet(qiStore(dir))

  /** Absorb one delivery under `run=<runId>` — O(batch), idempotent
    * under re-delivery. */
  def absorbQi(spark: SparkSession, rows: DataFrame, dir: String,
               runId: String): Unit = {
    graft.ops.StoreCompaction.heal(spark, qiStore(dir), "run")
    graft.queries.Cleaning.qiCounts(rows)
      .withColumn("run", lit(runId))
      .write.partitionBy("run").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(qiStore(dir))
  }

  /** Fold every run into one summed partition (crash-recoverable;
    * run at a quiescent point — the store family's contract). */
  def compactQi(spark: SparkSession, dir: String): Unit =
    graft.ops.StoreCompaction.fold(spark, qiStore(dir), "run", "base",
      spark.read.parquet(qiStore(dir))
        .groupBy(col("nationkey"), col("segment"), col("band"),
          col("sensitive"))
        .agg(sum(col("n")).as("n")))

  /** The q171 release audit from the store — heal-on-read,
    * aggregation always applied so compaction is invisible. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.StoreCompaction.heal(spark, qiStore(dir), "run")
    graft.queries.Cleaning.kAnonymityFromCounts(
      spark.read.parquet(qiStore(dir))
        .groupBy(col("nationkey"), col("segment"), col("band"),
          col("sensitive"))
        .agg(sum(col("n")).as("n")))
  }

  // ---- q172: Poisson-bootstrap CI --------------------------------

  /** Full rebuild from a documents snapshot → `run=base`. `docs` is
    * a raw (doc_id, source, text) document frame. */
  def buildBoot(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    // fresh store: stale markers from a previous deployment must not
    // approve future runs that happen to reuse an id
    DeliveryMarker.clearAll(spark, dir)
    val in = graft.queries.Sketch.bootInput(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.queries.Sketch.bootRepPartials(in)
        .withColumn("run", lit("base"))
        .write.partitionBy("run").mode("overwrite").parquet(repStore(dir))
      graft.queries.Sketch.bootPointPartials(in)
        .withColumn("run", lit("base"))
        .write.partitionBy("run").mode("overwrite").parquet(ptStore(dir))
    } finally in.unpersist()
  }

  /** Absorb one document delivery under `run=<runId>` — O(batch·B)
    * map work, O(sources·B) rows written, idempotent. Both
    * sub-stores write under the SAME run id, and the delivery is
    * acknowledged by the [[DeliveryMarker]] created only
    * AFTER both writes land — until then the read/compact paths
    * ignore the run, so a crash between the two writes can never be
    * served or folded (see the marker note above). */
  def absorbBoot(spark: SparkSession, docs: DataFrame, dir: String,
                 runId: String): Unit = {
    graft.ops.StoreCompaction.heal(spark, repStore(dir), "run")
    graft.ops.StoreCompaction.heal(spark, ptStore(dir), "run")
    val in = graft.queries.Sketch.bootInput(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.queries.Sketch.bootRepPartials(in)
        .withColumn("run", lit(runId))
        .write.partitionBy("run").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(repStore(dir))
      graft.queries.Sketch.bootPointPartials(in)
        .withColumn("run", lit(runId))
        .write.partitionBy("run").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(ptStore(dir))
      // commit point: both halves are durable — acknowledge
      DeliveryMarker.mark(spark, dir, runId)
    } finally in.unpersist()
  }

  /** Fold both bootstrap sub-stores (each crash-recoverable). Only
    * marker-approved runs fold; a half-landed (unacknowledged) run's
    * partitions are DROPPED, not merged — its delivery will be
    * retried whole under the at-least-once contract. Markers for the
    * folded runs delete after BOTH folds complete (a crash between
    * the folds leaves the second store's approved partitions
    * readable through the same filter, so serving stays consistent
    * across the window). */
  def compactBoot(spark: SparkSession, dir: String): Unit = {
    val approved = approvedBootRuns(spark, dir)
    graft.ops.StoreCompaction.fold(spark, repStore(dir), "run", "base",
      DeliveryMarker.approvedOnly(spark.read.parquet(repStore(dir)), approved)
        .groupBy(col("source"), col("b"))
        .agg(sum(col("s")).as("s"), sum(col("wsum")).as("wsum")))
    graft.ops.StoreCompaction.fold(spark, ptStore(dir), "run", "base",
      DeliveryMarker.approvedOnly(spark.read.parquet(ptStore(dir)), approved)
        .groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("lsum")).as("lsum")))
    DeliveryMarker.clear(spark, dir, approved)
  }

  /** The q172 CI table from the store — heal-on-read, aggregation
    * always applied so compaction is invisible. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.StoreCompaction.heal(spark, repStore(dir), "run")
    graft.ops.StoreCompaction.heal(spark, ptStore(dir), "run")
    // serve only marker-acknowledged deliveries: a crash between the
    // two absorb writes must never skew the CI against its own point
    // estimate (run filters hit the partition column — pruned reads)
    val approved = approvedBootRuns(spark, dir)
    graft.queries.Sketch.bootstrapCiFromCounts(
      DeliveryMarker.approvedOnly(spark.read.parquet(repStore(dir)), approved)
        .groupBy(col("source"), col("b"))
        .agg(sum(col("s")).as("s"), sum(col("wsum")).as("wsum")),
      DeliveryMarker.approvedOnly(spark.read.parquet(ptStore(dir)), approved)
        .groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("lsum")).as("lsum")))
  }
}
