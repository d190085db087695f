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
  * (lang_confusion q144, label_agreement q165), embedding
  * separability (fisher_ratio q166), embedding structure (group_frechet q143,
  * centroid_confusion q150, embed_diversity q114), readability
  * (q148), char entropy rollup (q137), source overlap (q138),
  * vocabulary coverage (good_turing q152, vocab_richness q162),
  * drift and predictability
  * (source_drift q153, entropy_rate q154, length_drift q159,
  * kn_xent q168), term
  * provenance (term_dispersion q160), ingest language hygiene
  * (code_switch q161), mixture posture (concentration q155,
  * mixture_weights q151, temperature_mix q163), coverage geometry
  * (kcenter_coreset q156), retrieval-ranker health (rank_overlap
  * q158), numeric-feed / event-stream forensics (benford_digits
  * q164, cusum_drift q169 — the operational alarms a release review
  * reads next to the text statistics), release governance
  * (k_anonymity q171), statistical uncertainty (bootstrap_ci q172),
  * batch-shape economics (padding_waste q173), label quality
  * (label_noise q174), discourse structure (topic_boundaries q175),
  * dimensionality-cut cost (jl_distortion q176), source
  * data-valuation (loo_novelty q177), credential leakage
  * (secret_scan q178), provenance stylometry (stylometry q179),
  * duplication concentration (dup_spectrum q180), and exact
  * syndication flow (syndication q181).
  *
  * Writes are static overwrite per table — a re-run reproduces the
  * identical table contents (every underlying query is deterministic,
  * the repo's whole-pack doctrine). At 100 TB each table is one
  * independent job over the shared scans; run them all or cherry-pick
  * with `only`.
  *
  * Crash-atomicity (round-14 audit): the manifest is written LAST, so
  * a crash mid-pack used to leave a PRIOR run's manifest certifying a
  * MIXED set of tables. Every table now carries a `_runid` sidecar
  * (underscore-prefixed — invisible to parquet readers), written
  * AFTER the table lands; the manifest records each table's run id,
  * and [[readBack]] refuses a table whose sidecar is missing (crash
  * during that table's write) or disagrees with the manifest row
  * (pack crashed before re-certifying). A subset re-run MERGES into
  * an existing manifest rather than overwriting it, so the tables it
  * did not rewrite stay certified under their original run ids. */
object CorpusAudit {

  /** Per-directory certificate file. Underscore prefix: Spark/parquet
    * readers treat it as metadata and never read it as data. */
  private val RunIdFile = "_runid"

  private def hfs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeRunId(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, runId: String): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, RunIdFile), true)
    try out.write(runId.getBytes("UTF-8")) finally out.close()
  }

  private[graft] def readRunId(spark: SparkSession, dir: String): Option[String] = {
    val fs = hfs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, RunIdFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

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
    "source_overlap" -> "q138_source_overlap",
    "good_turing" -> "q152_good_turing",
    "source_drift" -> "q153_source_kl",
    "entropy_rate" -> "q154_entropy_rate",
    "concentration" -> "q155_concentration",
    "mixture_weights" -> "q151_doremi_weights",
    "length_drift" -> "q159_length_drift",
    "term_dispersion" -> "q160_term_dispersion",
    "code_switch" -> "q161_code_switch",
    "vocab_richness" -> "q162_chao_richness",
    "temperature_mix" -> "q163_temperature_mix",
    "label_agreement" -> "q165_label_agreement",
    "fisher_ratio" -> "q166_fisher_ratio",
    "kn_xent" -> "q168_kn_xent",
    "kcenter_coreset" -> "q156_kcenter_coreset",
    "rank_overlap" -> "q158_rank_overlap",
    "benford_digits" -> "q164_benford_digits",
    "cusum_drift" -> "q169_cusum_drift",
    "k_anonymity" -> "q171_k_anonymity",
    "bootstrap_ci" -> "q172_bootstrap_ci",
    "padding_waste" -> "q173_padding_waste",
    "label_noise" -> "q174_label_noise",
    "topic_boundaries" -> "q175_text_tiling",
    "jl_distortion" -> "q176_jl_distortion",
    "loo_novelty" -> "q177_loo_novelty",
    "secret_scan" -> "q178_secret_scan",
    "stylometry" -> "q179_stylometry",
    "dup_spectrum" -> "q180_dup_spectrum",
    "syndication" -> "q181_syndication")

  /** Run the pack (or the `only` subset) over `sfDir`, write each
    * table under `outDir/<table>/`, and return the manifest
    * (table, query, n_rows, run_id) — also persisted at
    * `outDir/manifest/`, MERGED with any existing manifest so a
    * subset re-run keeps the untouched tables certified. Unknown
    * `only` names refuse loudly (the Bench filter's doctrine: a typo
    * must not produce a plausible empty report). */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          only: Option[Set[String]] = None): DataFrame = {
    import spark.implicits._
    only.foreach { o =>
      val unknown = o -- Tables.keySet
      require(unknown.isEmpty,
        s"CorpusAudit: unknown tables ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val fs = hfs(spark, outDir)
    val runId = java.util.UUID.randomUUID().toString
    val picked = Tables.toSeq.sortBy(_._1)
      .filter { case (t, _) => only.forall(_.contains(t)) }
    val rows = picked.map { case (table, query) =>
      val dir = s"$outDir/$table"
      // de-certify FIRST: a crash anywhere inside this table's write
      // leaves it visibly uncertified, never certified-by-the-old-run
      fs.delete(new org.apache.hadoop.fs.Path(dir, RunIdFile), false)
      val df = graft.SparkEntry.queries(query)(spark, sfDir)
      df.write.mode("overwrite").parquet(dir)
      // count the WRITTEN artifact, not the plan — the manifest
      // certifies what is on disk
      val n = spark.read.parquet(dir).count()
      writeRunId(fs, dir, runId)
      (table, query, n, runId)
    }
    // carry forward manifest rows for tables this run did not touch
    // (subset re-runs); a legacy pre-run_id manifest can't certify
    // sidecar-less tables, so it is not carried
    val manifestDir = s"$outDir/manifest"
    val prior: Seq[(String, String, Long, String)] =
      if (!fs.exists(new org.apache.hadoop.fs.Path(manifestDir))) Seq.empty
      else try spark.read.parquet(manifestDir)
        .as[(String, String, Long, String)].collect().toSeq
        .filterNot(r => picked.exists(_._1 == r._1))
      catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty }
    // prior is COLLECTED above, so the merged manifest is a local
    // relation — overwriting the directory it was read from is safe
    val manifest = (rows ++ prior).sortBy(_._1)
      .toDF("table", "query", "n_rows", "run_id")
    manifest.coalesce(1).write.mode("overwrite").parquet(manifestDir)
    spark.catalog.clearCache() // the queries' cache contract
    manifest
  }

  /** Read one written table back (the consumer entry point), refusing
    * artifacts the manifest does not certify: a missing `_runid`
    * sidecar means the pack crashed during this table's write; a
    * sidecar the manifest row disagrees with means the pack crashed
    * after rewriting the table but before re-certifying it. */
  def readBack(spark: SparkSession, outDir: String, table: String): DataFrame = {
    require(Tables.contains(table), s"CorpusAudit: unknown table '$table'")
    import spark.implicits._
    val tableRun = readRunId(spark, s"$outDir/$table").getOrElse(throw
      new IllegalStateException(s"CorpusAudit: '$table' has no run " +
        "certificate — the pack crashed during this table's write; re-run it"))
    val certified = spark.read.parquet(s"$outDir/manifest")
      .where($"table" === table).select($"run_id").as[String].collect()
    require(certified.nonEmpty,
      s"CorpusAudit: the manifest does not list '$table'")
    if (certified.head != tableRun) throw new IllegalStateException(
      s"CorpusAudit: '$table' was written by run $tableRun but the " +
        s"manifest certifies ${certified.head} — the pack crashed " +
        "between the table write and the manifest write; re-run it")
    spark.read.parquet(s"$outDir/$table")
  }
}
