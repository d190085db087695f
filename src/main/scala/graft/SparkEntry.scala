package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder
  * prompt. Query packs live under graft.queries; each pack exposes
  * (queries, oracles) with the shared determinism conventions of
  * graft.ops.Determinism so the DuckDB replay hash-matches.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. TPC-H Q1-style pricing summary (scan → pushed filter →
    * partial+final hash agg → sort). */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Cache contract: several builders (q24/q29/q34/q68/q75/q93/
    * q95/q100/q103/q104/q106/q111/q112/q115/q116/q125/q154/q158/
    * q161/q165/q168/q170/q172/q174/q175/q176/q181) persist a
    * derived stage that the returned
    * plan references several times (Spark has no DAG-level CSE
    * across multi-referenced DataFrames). The cache is owned by the
    * returned plan's lifetime — a harness that executes MANY entries
    * from this map must call `spark.catalog.clearCache()` between
    * (or after) queries, as Verify and Bench do, or cached blocks
    * accumulate across the run. Builders with a driver-looped or
    * index-lifecycle stage (q63/q65 connected components, q90/q92/
    * q98/q101/q104/q105/q108 training/counting) additionally EXECUTE
    * jobs during construction; they return correct plans either way,
    * but plan-only consumers should expect query-execution time. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.TextVector.queries ++
      graft.queries.Search.queries ++ graft.queries.Quality.queries ++
      graft.queries.Clusters.queries ++ graft.queries.Corpus.queries ++
      graft.queries.Cleaning.queries ++ graft.queries.Sketch.queries ++
      graft.queries.Learn.queries ++ graft.queries.Graph.queries

  /** Queries whose builder reads a [[graft.ops.SessionStage]] memo —
    * a per-(session, corpus) trained artifact (near-dup labels, BPE
    * merge table, probe weights, q104/q108's quantizer) built ONCE
    * and shared by every consumer. Bench semantics disclosure: the
    * memo is built during Bench's UNTIMED warmup pass, so these
    * queries' timed numbers measure the CONSUMER path only — the
    * documented production shape (train once, read many; the
    * correctness gate replays full training every run). Bench names
    * them in its JSON (`trained_stages`) so round-over-round
    * comparisons cannot misread memoization as a faster trainer.
    * Keyed by stage, asserted by the buildCount specs
    * (ClusterSpec/BpeSpec/LearnSpec/SemDedupSpec). */
  val trainedStageQueries: Map[String, Seq[String]] = Map(
    "near_dup_labels" -> Seq("q63_dedup_clusters", "q65_leakage_split",
      "q67_dedup_keep", "q128_source_redundancy", "q180_dup_spectrum"),
    "near_dup_pairs" -> Seq("q147_editdist_verify", "q157_containment"),
    "bpe_merges" -> Seq("q92_bpe_vocab", "q105_bpe_fertility"),
    "probe_weights" -> Seq("q98_linear_probe", "q113_probe_calibration",
      "q132_threshold_sweep", "q174_label_noise"),
    "ivf_quantizer" -> Seq("q104_semdedup", "q108_embed_outliers",
      "q115_corpus_map"),
    "pc_fit" -> Seq("q129_top_pc", "q130_whiten"),
    "citation_edges" -> Seq("q101_pagerank", "q170_triangles"),
    "source_term_counts" -> Seq("q177_loo_novelty", "q179_stylometry"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted keys fall back to the
    * driver's rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.TextVector.oracles ++
      graft.queries.Search.oracles ++ graft.queries.Quality.oracles ++
      graft.queries.Clusters.oracles ++ graft.queries.Corpus.oracles ++
      graft.queries.Cleaning.oracles ++ graft.queries.Sketch.oracles ++
      graft.queries.Learn.oracles ++ graft.queries.Graph.oracles
}
