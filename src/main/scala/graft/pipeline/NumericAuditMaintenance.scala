package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental numeric-feed forensics — the [[CorpusStatsMaintenance]]
  * doctrine applied to q164's Benford audit. The audit's whole input
  * is the leading-digit histogram, which is additive across disjoint
  * deliveries, so a feed owner gets the per-digit χ² screen after
  * EVERY delivery at O(batch) cost — the continuous posture a fraud /
  * truncated-export alarm actually needs (a nightly full-table digit
  * scan answers yesterday's question) — while the gated q164 chain
  * stays the from-scratch truth the store is specced against.
  *
  * Store layout: `dir/digitcounts/run=<id>/` parquet (digit, n_obs).
  * [[absorb]] is idempotent under re-delivery (dynamic partition
  * overwrite keyed on the run id — the house at-least-once
  * convention); [[compact]] folds runs with the crash-recoverable
  * [[graft.ops.StoreCompaction]] marker protocol; reads always
  * aggregate, so an uncompacted store serves the same integers as a
  * compacted one. Serving goes through the SAME
  * `Relational.benfordFromCounts` derivation the gated query runs —
  * served ≡ batch is structural. The store is ≤ 9 rows per run
  * regardless of feed size.
  */
object NumericAuditMaintenance {

  private def store(dir: String) = s"$dir/digitcounts"

  /** Full rebuild from a snapshot → `run=base`. */
  def build(spark: SparkSession, prices: DataFrame, dir: String): Unit =
    graft.queries.Relational.digitCounts(prices)
      .withColumn("run", lit("base"))
      .write.partitionBy("run").mode("overwrite").parquet(store(dir))

  /** Absorb one delivery under `run=<runId>` — O(batch), idempotent
    * under re-delivery. */
  def absorb(spark: SparkSession, prices: DataFrame, dir: String,
             runId: String): Unit = {
    graft.ops.StoreCompaction.heal(spark, store(dir), "run")
    graft.queries.Relational.digitCounts(prices)
      .withColumn("run", lit(runId))
      .write.partitionBy("run").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(store(dir))
  }

  /** Fold every run into one summed partition (crash-recoverable;
    * run at a quiescent point — the store family's contract). */
  def compact(spark: SparkSession, dir: String): Unit =
    graft.ops.StoreCompaction.fold(spark, store(dir), "run", "base",
      spark.read.parquet(store(dir))
        .groupBy(col("digit")).agg(sum(col("n_obs")).as("n_obs")))

  /** The q164 table from the store — heal-on-read, aggregation
    * always applied so compaction is invisible to consumers. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.StoreCompaction.heal(spark, store(dir), "run")
    graft.queries.Relational.benfordFromCounts(
      spark.read.parquet(store(dir))
        .groupBy(col("digit")).agg(sum(col("n_obs")).as("n_obs")))
  }
}
