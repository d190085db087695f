package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus-statistics maintenance — the lexical half of
  * the [[CorpusAudit]] report pack WITHOUT re-tokenizing the corpus
  * per delivery. At 100 TB the audit's term-statistics tables (Zipf
  * slope q139, lexical diversity q140, Good–Turing coverage q152)
  * each cost a full corpus tokenize; but all three are pure
  * functions of ONE sufficient statistic, the (lang, term) count
  * table, and counts are additive across disjoint deliveries. So
  * the store keeps per-run term counts ([[absorb]] tokenizes only
  * the arriving batch), folds them with the [[graft.ops
  * .StoreCompaction]] crash-recoverable protocol, and serves the
  * statistics through the SAME `FromCounts` derivations the gated
  * queries run — served ≡ batch is structural, not aspirational
  * (the [[MixtureMaintenance]]/[[HybridRetrieval]] store doctrine).
  *
  * Store layout: `dir/termcounts/run=<id>/` parquet (lang, w, c).
  * [[absorb]] is idempotent under re-delivery (dynamic partition
  * overwrite keyed on the run id — the house at-least-once
  * convention); a token-less batch writes nothing and serves
  * unchanged. [[compact]] folds every run into one partition,
  * SUMMING duplicate (lang, term) rows — the fold is the only place
  * rows merge, reads always aggregate, so an uncompacted store
  * serves the same integers as a compacted one.
  *
  * Scale shape: absorb is O(batch); the store holds O(langs·vocab)
  * rows regardless of corpus size (vocabulary grows ~N^β, q149's
  * own fit); serving aggregates the store, never the corpus.
  */
object CorpusStatsMaintenance {

  private def store(dir: String) = s"$dir/termcounts"

  private def counts(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))

  /** Full rebuild from a corpus snapshot → `run=base`. */
  def build(spark: SparkSession, docs: DataFrame, dir: String): Unit =
    counts(docs).withColumn("run", lit("base"))
      .write.partitionBy("run").mode("overwrite").parquet(store(dir))

  /** Absorb one delivery under `run=<runId>` — O(batch), idempotent
    * under re-delivery (the partition overwrites itself). */
  def absorb(spark: SparkSession, docs: DataFrame, dir: String,
             runId: String): Unit = {
    graft.ops.StoreCompaction.heal(spark, store(dir), "run")
    counts(docs).withColumn("run", lit(runId))
      .write.partitionBy("run").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(store(dir))
  }

  /** Fold every run into one summed partition (crash-recoverable —
    * the StoreCompaction marker protocol; run at a quiescent point,
    * the store family's documented contract). `force` reruns the
    * fold even over a single partition. */
  def compact(spark: SparkSession, dir: String): Unit =
    graft.ops.StoreCompaction.fold(spark, store(dir), "run", "base",
      spark.read.parquet(store(dir))
        .groupBy(col("lang"), col("w")).agg(sum(col("c")).as("c")))

  /** The summed (lang, w, c) view of whatever runs are on disk —
    * heal-on-read, aggregation always applied so compaction is
    * invisible to consumers. */
  private def merged(spark: SparkSession, dir: String): DataFrame = {
    graft.ops.StoreCompaction.heal(spark, store(dir), "run")
    spark.read.parquet(store(dir))
      .groupBy(col("lang"), col("w")).agg(sum(col("c")).as("c"))
  }

  /** q140's table from the store — same derivation as the query. */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    graft.queries.Corpus.lexicalDiversityFromCounts(merged(spark, dir))

  /** q152's table from the store. */
  def goodTuring(spark: SparkSession, dir: String): DataFrame =
    graft.queries.Corpus.goodTuringFromCounts(merged(spark, dir))

  /** q139's table from the store. */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame =
    graft.queries.Corpus.zipfSlopeFromCounts(
      merged(spark, dir).withColumnRenamed("c", "freq"))
}
