package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The curation END PRODUCT as a materialized artifact: one job that
  * composes the engine's dedup → quality → split stages and WRITES
  * the training corpus, instead of answering queries about it
  * (q67 reports the cleaned corpus, q65 the split; a training run
  * consumes files). Output layout: parquet partitioned by `split`
  * (train/val/test), one row per surviving document with its
  * near-dup cluster id and quality score attached — the lineage
  * columns an audit needs.
  *
  * Stage shapes (each individually proven by its query twin):
  *   1. near-dup clusters from [[graft.queries.NearDupStage]] (the
  *      shared LSH → connected-components label table);
  *   2. keep = cluster representatives only (q67: broadcast drop-set
  *      anti-join — the corpus scan never shuffles);
  *   3. quality floor via the fused TextStats kernel (q26/q39's
  *      score, one codegen pass);
  *   4. split = hash of the CLUSTER id, 80/10/10 (q65: no near-dup
  *      pair ever straddles train/test);
  *   5. write partitioned by split — static overwrite, so re-running
  *      the export is idempotent.
  *
  * At 100 TB: one corpus scan for the label stage (shared, not
  * per-consumer), one for the export; everything between is
  * id-width. */
object CurationExport {

  private val HashMod = 1000000007L
  private val PermMult = 2654435761L

  /** Run the export; returns per-split counts (the run report).
    * `format`: "parquet" (default — typed, splittable, the training
    * stack's native input) or "jsonl" (JSON Lines, one document per
    * line — the pretraining-corpus interchange format; Spark's json
    * sink escapes embedded newlines/quotes/unicode, so a document is
    * ALWAYS exactly one line and a round-trip read reproduces the
    * text byte-for-byte — ExportSpec pins it). Both lay out
    * `split=` partition dirs. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          minQuality: Double = 0.0, format: String = "parquet"): DataFrame = {
    require(format == "parquet" || format == "jsonl",
      s"unsupported export format '$format' (parquet | jsonl)")
    val labels = graft.queries.NearDupStage.labels(spark, sfDir)
    val drop = labels.filter(col("id") =!= col("label"))
      .select(col("id").as("doc_id"))
    val clusters = labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))

    val h = pmod(col("unit_id"), lit(HashMod)) * lit(PermMult) % lit(HashMod)
    val kept = graft.Tables.documents(spark, sfDir)
      .join(drop, Seq("doc_id"), "left_anti")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("unit_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("quality",
        graft.ops.expressions.TextStats(col("text")).getField("quality"))
      .filter(col("quality") >= minQuality)
      .withColumn("split",
        when(pmod(h, lit(10L)) < 8, "train")
          .when(pmod(h, lit(10L)) === 8, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("lang"), col("text"),
        col("unit_id"), col("quality"), col("split"))

    val w = kept.write.partitionBy("split").mode("overwrite")
      .option("partitionOverwriteMode", "static")
    if (format == "jsonl") w.json(outDir) else w.parquet(outDir)

    readBack(spark, outDir, format)
      .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"))
  }

  /** Read a written export (the report path above; also the
    * consumer-side entry point — jsonl reads pin the export's schema
    * instead of inferring, so doc ids stay LONG and a corrupt line
    * fails loudly rather than widening every column to string). */
  def readBack(spark: SparkSession, outDir: String,
               format: String = "parquet"): DataFrame =
    if (format == "jsonl")
      spark.read
        .schema("doc_id LONG, lang STRING, text STRING, unit_id LONG, " +
          "quality DOUBLE, split STRING")
        .option("mode", "FAILFAST").json(outDir)
    else spark.read.parquet(outDir)
}
