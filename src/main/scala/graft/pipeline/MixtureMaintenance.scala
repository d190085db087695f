package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Incremental domain-mixture maintenance: keep q99's tempered
  * sampling rates CURRENT as the corpus grows, without rescanning
  * the corpus. The batch query (q99) derives per-domain token
  * counts from a full scan; at 100 TB a daily ingest cannot re-count
  * everything to refresh the mixture, so this store absorbs each
  * batch's per-domain count DELTA (one tiny aggregated row set per
  * run) and cutting a training snapshot becomes O(domains):
  * `currentRates` folds the deltas and applies the identical
  * tempered-rate formula, and [[decide]] screens any doc set against
  * those rates with the same content-hash integer compare — the
  * [[DedupIndex]]/[[ClusterMaintenance]] operating mode applied to
  * the mixing stage.
  *
  * Epoch semantics (documented contract): rates DRIFT as batches
  * land, so a document's keep verdict is a function of (doc,
  * rates-at-snapshot-time), not a permanent property — exactly how
  * tempered sampling behaves when a corpus is re-cut per training
  * run. Determinism: for a FIXED store state, `currentRates` and
  * `decide` are pure (exact integer count sums; the q99 micro-
  * rounded rate; content-hash compare), so re-cutting the same
  * snapshot reproduces the same corpus bit-for-bit.
  *
  * Store layout: `dir/domain_counts/run=<id>` parquet rows
  * (lang, n_docs, n_tokens) — one aggregated delta per absorbed
  * batch. Re-running a runId REPLACES that run (at-least-once
  * delivery stays idempotent); [[compact]] folds all runs to
  * `run=base` via the crash-recoverable [[graft.ops.StoreCompaction]]
  * protocol, and every read entry point heals an interrupted fold
  * first.
  */
object MixtureMaintenance {

  private def countsPath(dir: String) = s"$dir/domain_counts"

  /** Absorb one ingest batch: one scan of the BATCH aggregates its
    * per-domain (n_docs, n_tokens) and lands it under
    * `run=<runId>`. Nothing O(corpus). */
  def absorb(spark: SparkSession, docs: DataFrame, dir: String,
             runId: String): Unit = {
    graft.ops.StoreCompaction.heal(spark, countsPath(dir), "run")
    docs
      .select(col("lang"), TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .write.mode("overwrite").parquet(s"${countsPath(dir)}/run=$runId")
  }

  /** Fold per-domain counts across every absorbed run and apply the
    * tempered-rate formula — IDENTICAL to q99's
    * ([[graft.queries.Learn.temperedRates]]), so maintained rates
    * and the from-scratch query can never drift. Returns
    * (lang, n_docs, n_tokens, rate_micro). */
  def currentRates(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.StoreCompaction.heal(spark, countsPath(dir), "run")
    // a store with no absorbed runs yet (fresh deployment, or a
    // screening job racing the first ingest) has EVERY domain unseen:
    // an empty rate table, so decide's unseen-domain default keeps
    // everything — the ClusterMaintenance empty-init discipline, not
    // a crash (probe semantics: StoreCompaction.hasParquetData).
    val folded =
      if (!graft.ops.StoreCompaction.hasParquetData(spark, countsPath(dir)))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "lang STRING, n_docs BIGINT, n_tokens BIGINT"))
      else spark.read.parquet(countsPath(dir))
        .groupBy(col("lang"))
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    graft.queries.Learn.temperedRates(folded)
  }

  /** Keep/drop verdicts for any (doc_id, lang, text) frame under
    * the CURRENT rates: (doc_id, lang, keep). The rate table is
    * O(domains) — broadcast; the doc side is one narrow pass
    * (content hash + integer compare), no text shuffle. */
  def decide(spark: SparkSession, docs: DataFrame, dir: String): DataFrame =
    decideWith(docs,
      currentRates(spark, dir).select(col("lang"), col("rate_micro")))

  /** The keep decision under a GIVEN (lang, rate_micro) table — the
    * ONE formula shared by [[decide]] (persisted-store rates) and
    * self-contained consumers that derive rates from the corpus at
    * hand ([[CurationExport]] without a store): content-hash integer
    * compare, rate table broadcast, no text shuffle. */
  def decideWith(docs: DataFrame, rates: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        TextOps.fingerprint(col("text")).as("h"))
      .join(broadcast(rates.select(col("lang"), col("rate_micro"))),
        Seq("lang"), "left")
      .select(col("doc_id"), col("lang"),
        // a domain never absorbed has no rate: keep (rate 1) — a
        // brand-new domain is by definition the smallest
        coalesce(pmod(col("h"), lit(1000000L)) < col("rate_micro"),
          lit(true)).as("keep"))

  /** Fold all `run=` deltas into one `run=base` (crash-recoverable;
    * run at a quiescent point — [[DedupIndex.compact]]'s contract). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val path = countsPath(dir)
    graft.ops.StoreCompaction.fold(spark, path, "run", "base",
      spark.read.parquet(path).drop("run")
        .groupBy(col("lang"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens")))
  }

  /** How many `run=` partitions the store currently holds (spec
    * hook for the compaction contract). */
  private[graft] def runCount(spark: SparkSession, dir: String): Int =
    graft.ops.StoreCompaction.runCount(spark, countsPath(dir), "run")
}
