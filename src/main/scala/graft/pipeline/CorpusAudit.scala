package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The corpus-audit report pack as a materialized artifact: one call
  * that runs the data-governance query family and WRITES each table
  * under `outDir/<table>/` plus a `manifest` of row counts — what a
  * curation team attaches to a data-release review (the audit analog
  * of [[CurationExport]]: the export ships the corpus, this ships
  * the evidence about it). Each table IS its oracle-gated query —
  * the report can never disagree with the gated answers because it
  * is produced by the same `SparkEntry.queries` entries the
  * correctness gate hashes.
  *
  * Tables: lexical statistics (zipf_slope q139, lexical_diversity
  * q140, distinct_ngrams q141, heaps_fit q149), term tables
  * (burstiness q142, pmi_bigrams q125, boilerplate_grams q126),
  * length structure (mad_fences q135, length_tail q145,
  * gini_lengths q146, token_alloc q136), label hygiene
  * (lang_confusion q144), embedding structure (group_frechet q143,
  * centroid_confusion q150, embed_diversity q114), readability
  * (q148), char entropy rollup (q137), and source overlap (q138).
  *
  * Writes are static overwrite per table — a re-run reproduces the
  * identical artifact (every underlying query is deterministic, the
  * repo's whole-pack doctrine). At 100 TB each table is one
  * independent job over the shared scans; run them all or cherry-pick
  * with `only`. */
object CorpusAudit {

  /** Report table name → catalog query that defines it. */
  val Tables: Map[String, String] = Map(
    "zipf_slope" -> "q139_zipf_slope",
    "lexical_diversity" -> "q140_lexical_diversity",
    "distinct_ngrams" -> "q141_distinct_ngrams",
    "heaps_fit" -> "q149_heaps_fit",
    "burstiness" -> "q142_burstiness",
    "pmi_bigrams" -> "q125_pmi_bigrams",
    "boilerplate_grams" -> "q126_boilerplate_grams",
    "mad_fences" -> "q135_mad_fences",
    "length_tail" -> "q145_length_tail",
    "gini_lengths" -> "q146_gini_lengths",
    "token_alloc" -> "q136_token_alloc",
    "lang_confusion" -> "q144_lang_confusion",
    "group_frechet" -> "q143_group_frechet",
    "centroid_confusion" -> "q150_centroid_confusion",
    "embed_diversity" -> "q114_embed_diversity",
    "readability" -> "q148_readability",
    "char_entropy" -> "q137_char_entropy",
    "source_overlap" -> "q138_source_overlap")

  /** Run the pack (or the `only` subset) over `sfDir`, write each
    * table under `outDir/<table>/`, and return the manifest
    * (table, query, n_rows) — also persisted at `outDir/manifest/`.
    * Unknown `only` names refuse loudly (the Bench filter's
    * doctrine: a typo must not produce a plausible empty report). */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Option[Set[String]] = None): DataFrame = {
    import spark.implicits._
    only.foreach { o =>
      val unknown = o -- Tables.keySet
      require(unknown.isEmpty,
        s"CorpusAudit: unknown tables ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val picked = Tables.toSeq.sortBy(_._1)
      .filter { case (t, _) => only.forall(_.contains(t)) }
    val rows = picked.map { case (table, query) =>
      val df = graft.SparkEntry.queries(query)(spark, sfDir)
      df.write.mode("overwrite").parquet(s"$outDir/$table")
      // count the WRITTEN artifact, not the plan — the manifest
      // certifies what is on disk
      (table, query, spark.read.parquet(s"$outDir/$table").count())
    }
    val manifest = rows.toDF("table", "query", "n_rows").orderBy($"table")
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
    spark.catalog.clearCache() // the queries' cache contract
    manifest
  }

  /** Read one written table back (the consumer entry point). */
  def readBack(spark: SparkSession, outDir: String, table: String): DataFrame = {
    require(Tables.contains(table), s"CorpusAudit: unknown table '$table'")
    spark.read.parquet(s"$outDir/$table")
  }
}
