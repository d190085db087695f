package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scaling probe for the dedup/ANN family — the measurement
  * behind the README scaling notes' exponent table. Synthesizes a
  * corpus ~10× sf0.1 (same schema, DETERMINISTIC hash-driven
  * generator — no RNG state, so re-runs measure the same corpus)
  * with planted duplicate structure (5% exact-copy families, 5%
  * near-dup perturbations off the same template pool — a generator
  * with no dup families would let the near-dup queries' candidate
  * stages degenerate to empty and the probe would measure nothing),
  * then times the six scale-sensitive queries at sf0.1 and at the
  * synthetic 10× and reports the measured growth exponent
  * ln(t₁₀ₓ/t₁ₓ)/ln(10) per query.
  *
  * Reading the exponents: 1.0 = linear, 1.5 = the n·√n bound
  * SemDeDup claims, 2.0 = quadratic (a scale-killer — the probe
  * prints a FLAG). Fixed per-job overhead deflates exponents at
  * these sizes (a constant-cost query measures ≈ 0), so the
  * interesting direction is the UPPER side only.
  *
  * Usage: `sbt "runMain graft.ScaleProbe [workDir]"` (default
  * /tmp/graft-scaleprobe). Prints one table row per query plus a
  * JSON line for machine reading.
  */
object ScaleProbe {

  private val Words = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")
  private val Langs = Seq("en", "zh", "es", "fr", "de")
  private val Templates = 64 // dup-family pool size

  /** Deterministic word at (seed, i): the same splittable-hash
    * device the engine's kernels use (multiply-shift over a fixed
    * odd constant), mapped into the pool. */
  private def wordAt(seed: org.apache.spark.sql.Column,
                     i: org.apache.spark.sql.Column) = {
    val h = pmod(hash(seed * lit(2654435761L) + i), lit(Words.length))
    element_at(typedLit(Words), (h + lit(1)).cast("int"))
  }

  private def textOf(seed: org.apache.spark.sql.Column,
                     nWords: org.apache.spark.sql.Column) =
    concat_ws(" ", transform(sequence(lit(0L), nWords - lit(1)),
      i => wordAt(seed, i)))

  /** The synthetic document text at a doc_id: 1-in-20 exact-copy
    * family members (text depends only on the 64-template pool id),
    * 1-in-20 near-dups (template + one unique tail word), the rest
    * unique bodies — shared by [[generate]] and
    * [[fixedScreenBatch]] so a batch drawn from DISJOINT ids still
    * lands exact/near hits in every index built from this
    * generator. */
  private def textExpr(docId: org.apache.spark.sql.Column) = {
    val mode = pmod(docId, lit(20L))
    val tid = pmod(hash(docId), lit(Templates.toLong)) // family
    val bodyLen = lit(40L) + pmod(hash(docId + lit(7L)), lit(50L))
    val tmplLen = lit(40L) + pmod(hash(tid + lit(7L)), lit(50L))
    when(mode === 7L, textOf(tid, tmplLen)) // exact-copy family
      .when(mode === 8L, // near-dup: template + a tiny unique tail
        concat(textOf(tid, tmplLen), lit(" "), wordAt(docId, lit(-1L))))
      .otherwise(textOf(docId, bodyLen))
  }

  /** The FIXED ingest batch for the screen-latency receipt (r18
    * verdict #4): 500 docs at ids disjoint from every generated
    * corpus, from the same generator — so ~25 are exact copies of
    * template families the index holds, ~25 near-dups, the rest
    * unique. Its derivation cost is CONSTANT across index scales by
    * construction; what the probe measures is whether screening it
    * stays O(batch) as the index grows. */
  private[graft] def fixedScreenBatch(spark: SparkSession) =
    spark.range(500).select((col("id") + lit(10000000L)).as("doc_id"))
      .select(col("doc_id"), textExpr(col("doc_id")).as("text"))

  /** The documents table as a DataFrame at a given size — the
    * projection [[generate]] persists, exposed so the screen-latency
    * probe (and its spec) can build [[graft.pipeline.DedupIndex]]
    * stores over generator corpora of ANY size without writing the
    * other four probe tables to disk first. */
  private[graft] def docsDf(spark: SparkSession, nDocs: Long): DataFrame =
    spark.range(nDocs).select(col("id").as("doc_id"))
      .select(col("doc_id"), textExpr(col("doc_id")).as("text"),
        element_at(typedLit(Langs),
          (pmod(hash(col("doc_id") + lit(3L)), lit(Langs.length)) + lit(1))
            .cast("int")).as("lang"),
        concat(lit("src"),
          pmod(hash(col("doc_id") + lit(11L)), lit(20L))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))

  /** Write documents.parquet + embeddings.parquet mirroring the
    * testdata shapes (5 000 docs ≈ 300 chars / 2 000 × 64-dim vecs
    * at sf0.1 → `mult` times that here), plus the two numeric-feed
    * tables the round-16 probe additions read: lineitem (600 000 ×
    * mult uniform prices — the q164 Benford input; TPC-H's own
    * generator is uniform, so the synthetic side matches the real
    * side's distribution shape) and events (100 000 × mult rows over
    * the same 30-day window and 5 event types as the testdata — the
    * q169 CUSUM input; only the (event_type, ts) columns the query
    * reads are generated, column pruning makes the rest dead
    * weight). */
  def generate(spark: SparkSession, dir: String, mult: Int): Unit = {
    val nDocs = 5000L * mult
    val nVecs = 2000L * mult
    docsDf(spark, nDocs)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.range(nVecs).select(col("id").as("vec_id"),
        transform(sequence(lit(0L), lit(63L)), j =>
          ((pmod(hash(col("id") * lit(31L) + j), lit(1000000L)).cast("double")
            / lit(1000000.0)) - lit(0.5)).cast("float")).as("embedding"),
        pmod(hash(col("id") + lit(5L)), lit(10L)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // q164's input: uniform cents in [90 068, 10 499 991] — the real
    // table's observed price range
    spark.range(600000L * mult)
      .select((lit(90068L) + pmod(hash(col("id") + lit(13L)),
          lit(10409924L))).cast("double")./(lit(100.0))
        .as("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // q169's input: micros spread hash-uniform over Jan 2024 (the
    // real window), 5 event types — TIMESTAMP_MICROS layout, the
    // branch of Tables.events the driver's current data generation
    // also takes
    val jan1Us = 1704067200000000L // 2024-01-01T00:00:00Z
    val spanUs = 30L * 86400L * 1000000L
    spark.range(100000L * mult)
      .select(expr(s"timestamp_micros($jan1Us + " +
          s"pmod(hash(id + 17), ${spanUs}L))").as("ts"),
        element_at(typedLit(Seq("click", "error", "purchase", "signup",
          "view")), (pmod(hash(col("id") + lit(19L)), lit(5L)) + lit(1))
          .cast("int")).as("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // q171's input: the QI columns only (nation 0..24, 5 segments,
    // balances hash-uniform over the real table's [-999.99, 9999.99])
    spark.range(15000L * mult)
      .select(col("id").as("c_custkey"),
        pmod(hash(col("id") + lit(23L)), lit(25L)).cast("int")
          .as("c_nationkey"),
        ((pmod(hash(col("id") + lit(29L)), lit(1099999L)) - lit(99999L))
          .cast("double") / lit(100.0)).as("c_acctbal"),
        element_at(typedLit(Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY")),
          (pmod(hash(col("id") + lit(31L)), lit(5L)) + lit(1))
            .cast("int")).as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
  }

  /** Direct (src, dst) edge generator for the graph probes: the
    * gated q170 derives its citation graph in-query with constants
    * bounded to ~9k docs (Graph.scala's overflow note), so the 10×
    * probe generates the edge list itself and times the OPERATOR
    * ([[graft.queries.Graph.triangleCounts]]) over it. Shape matches
    * the citation derivation's skew — per node, 5 backward edges
    * hash-uniform over ALL earlier nodes (harmonic in-degree: early
    * nodes become hubs, exercising the degree-orientation bound) —
    * plus 3 LOCAL backward edges within the previous 8 nodes, which
    * plant real triangle density (two neighbors sharing a nearby
    * third close wedges constantly; a pure uniform-random graph at
    * mean degree 8 would have ~0 triangles and the closure join
    * would measure nothing). */
  def generateEdges(spark: SparkSession, dir: String, nodes: Long): Unit = {
    val n = spark.range(nodes).filter(col("id") >= 2L)
    val global = n.select(col("id").as("src"), explode(
        transform(sequence(lit(0L), lit(4L)), k =>
          pmod(hash(col("id") * lit(37L) + k), col("id")))).as("dst"))
    val local = n.select(col("id").as("src"), explode(
        transform(sequence(lit(5L), lit(7L)), k =>
          greatest(lit(0L), col("id") - lit(1L) -
            pmod(hash(col("id") * lit(41L) + k), lit(8L))))).as("dst"))
    global.unionByName(local).filter(col("dst") =!= col("src"))
      .write.mode("overwrite").parquet(s"$dir/edges.parquet")
  }

  private val Probed = Seq("q24_near_dup", "q29_simhash_dedup",
    "q34_embed_dup", "q93_span_dedup", "q104_semdedup", "q90_ivf_pq",
    // round-13 additions: the new shingle-heavy text-analysis ops
    "q121_decontamination", "q123_ngram_novelty", "q125_pmi_bigrams",
    "q126_boilerplate_grams",
    // round-14 additions: the two-phase prefix-sum packers (their
    // exponent is the de-skew fix's receipt), the MAD fences, the
    // char-entropy kernel, the KMV source-overlap sketch, and the
    // token-explode-heavy corpus statistics
    "q133_token_packing", "q54_seq_pack", "q135_mad_fences",
    "q137_char_entropy", "q138_source_overlap",
    "q139_zipf_slope", "q140_lexical_diversity",
    "q141_distinct_ngrams", "q142_burstiness", "q146_gini_lengths",
    "q143_group_frechet", "q144_lang_confusion", "q145_length_tail",
    "q147_editdist_verify", "q148_readability",
    "q149_heaps_fit", "q150_centroid_confusion",
    // round-15 additions: the token-width-join statistics pack, the
    // K-pass coreset selector, and the bounded-pair containment
    "q151_doremi_weights", "q152_good_turing", "q153_source_kl",
    "q154_entropy_rate", "q155_concentration",
    "q156_kcenter_coreset", "q157_containment",
    // the ranker-agreement profile (two corpus ranker passes, O(q·k²)
    // after), the histogram-CDF drift pair, the top-K dispersion
    // table, and the sentence-explode code-switch report
    "q158_rank_overlap", "q159_length_drift",
    "q160_term_dispersion", "q161_code_switch", "q162_chao_richness",
    "q163_temperature_mix", "q165_label_agreement",
    "q166_fisher_ratio", "q167_semantic_contam", "q168_kn_xent",
    // round-16 additions: the numeric-feed audits (both O(aggregate)
    // — 9-row and 150-row outputs off one linear pass) and the
    // triangle OPERATOR over a directly-generated edge list (below)
    "q164_benford_digits", "q169_cusum_drift", "q170_triangles",
    // the governance/uncertainty pack: QI-cell audit (one combine),
    // the B×-explode bootstrap, the bucket-ladder waste table, and
    // the probe-training + K-fanned-scoring noise matrix
    "q171_k_anonymity", "q172_bootstrap_ci", "q173_padding_waste",
    "q174_label_noise",
    // the discourse segmenter (token explode + adjacent-block join),
    // the JL projection audit (narrow HOF map + id-keyed pairs), and
    // the LOO data-valuation pass (q151's token-width-join shape)
    "q175_text_tiling", "q176_jl_distortion", "q177_loo_novelty",
    // the credential screen (one tokenize, fused flag predicates)
    "q178_secret_scan",
    // round-17 additions: the Burrows-Delta profile (the q151-family
    // token pass, O(sources·F) after) and the cluster-size spectrum
    // (the full q24+CC chain — NearDupStage resets per rep — plus an
    // O(clusters) rollup)
    "q179_stylometry", "q180_dup_spectrum",
    // the exact syndication matrix (one fingerprint pass, bounded
    // per-group pair fan-out)
    "q181_syndication",
    // round-19 (r18 verdict #4): the incremental-screening latency
    // receipt — NOT a gated query: DedupIndex.screen of the SAME
    // fixed 500-doc batch against an index built over the 1× vs the
    // mult× corpus. The O(batch)-not-O(corpus) claim
    // (DedupIndex.scala screen scale-shape note) is structural
    // (band-key equi-joins, never a corpus scan); this measures it —
    // the receipt is a flat exponent (≈ 0) in INDEX size. Index
    // builds are untimed setup (the thing a daily ingest amortizes);
    // only the screen is timed.
    "dedup_screen",
    // round-20 (r19 verdict #5): the SKEW receipt — no declared query
    // trips AQE's skew threshold at sf0.1, so the salting devices
    // (q19/q82) were structural claims without a measurement. Both
    // probes join a planted-hot-key fact table (key 0 owns 40% of
    // rows — [[skewFact]]) against a dim table too big to broadcast
    // honestly at scale (MERGE-hinted so both variants compare the
    // same join family the 100 TB plan would use): `skew_join_plain`
    // funnels the hot key's whole occurrence set through ONE reducer
    // partition; `skew_join_salted` is q82's device — dim replicated
    // per salt, fact hashed to one salt — spreading it over
    // SkewSalts reducers. Equal results by construction (the salt
    // never changes the join predicate's matches); the receipt is
    // the big-scale time ratio.
    "skew_join_plain", "skew_join_salted")
    // q101 is NOT probed: its in-query citation-edge derivation
    // documents a ~9k-doc bound (doc_id·A must stay under 2^63 —
    // Graph.scala's constants note), which the 10× synthetic corpus
    // exceeds; its per-round join+agg shape is covered by the other
    // probes. q170 IS probed, but as the triangleCounts operator
    // over [[generateEdges]]' planted graph — same reason, and the
    // probe graph is DENSER than the gated derivation (8 edges/node,
    // local triangle structure) so the wedge/closure joins do real
    // work at 10× (the round-15 verdict's ask).

  /** Salt fan-out of the skew probes (q82 uses 8; the probe matches). */
  private val SkewSalts = 8

  /** Planted-hot-key fact table for the skew receipt: key 0 owns 40 %
    * of the rows (deterministic id stripe — the q19/q82 "one giant
    * tenant" shape), the rest spread hash-uniform over n/100 keys.
    * `sid` rides along as the salting source (derived from the row
    * id, never rand() — guide §2.5's retry-determinism rule). */
  private[graft] def skewFact(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("sid"),
      when(pmod(col("id"), lit(5L)) < 2L, lit(0L))
        .otherwise(pmod(hash(col("id") * lit(7L) + lit(3L)),
          lit(math.max(n / 100L, 1L)))).as("k"),
      pmod(col("id"), lit(1000L)).as("v"))

  private[graft] def skewDim(spark: SparkSession, n: Long): DataFrame =
    spark.range(math.max(n / 100L, 1L)).select(col("id").as("k"),
      pmod(col("id"), lit(25L)).as("grp"))

  /** The two skew variants over the generated (fact, dim) pair under
    * `dir`. Both MERGE-hinted: at probe sizes the dim side would
    * auto-broadcast and no shuffle skew could exist — the 100 TB
    * regime this receipt stands in for is the shuffled one. Results
    * are identical by construction; the probe asserts it once per
    * scale (25 rows). */
  private[graft] def skewJoin(s: SparkSession, dir: String,
                              salted: Boolean): DataFrame = {
    val fact = s.read.parquet(s"$dir/fact.parquet")
    val dim = s.read.parquet(s"$dir/dim.parquet")
    val joined =
      if (!salted) fact.join(dim.hint("merge"), Seq("k"))
      else {
        val dimS = dim.select(col("k"), col("grp"),
          explode(sequence(lit(0L), lit(SkewSalts.toLong - 1L))).as("salt"))
        fact.withColumn("salt", pmod(hash(col("sid")), lit(SkewSalts.toLong)))
          .join(dimS.hint("merge"), Seq("k", "salt"))
      }
    joined.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .orderBy(col("grp"))
  }

  /** q170 probes the operator over the generated edge list;
    * dedup_screen probes DedupIndex.screen of the fixed batch
    * against a prebuilt index (its "dir" is the INDEX dir); the
    * skew_join pair probes [[skewJoin]] over the planted-hot-key
    * tables; every other name is the gated query itself. */
  private def probeFn(name: String): (SparkSession, String) => DataFrame =
    if (name == "q170_triangles")
      (s, dir) => graft.queries.Graph.triangleCounts(
        s.read.parquet(s"$dir/edges.parquet"))
    else if (name == "dedup_screen")
      (s, idxDir) => graft.pipeline.DedupIndex.screen(
        s, fixedScreenBatch(s), idxDir)
    else if (name == "skew_join_plain") (s, dir) => skewJoin(s, dir, salted = false)
    else if (name == "skew_join_salted") (s, dir) => skewJoin(s, dir, salted = true)
    else SparkEntry.queries(name)

  /** The (1×, 10×) input dirs per probe — q170's planted graphs and
    * dedup_screen's prebuilt indexes live under the work dir;
    * everything else reads the real sf0.1 tables at 1× and the
    * synthetic corpus at 10×. */
  private def dirsFor(name: String, work: String, baseDir: String,
                      big: String): (String, String) =
    if (name == "q170_triangles") (s"$work/g1x", s"$work/g10x")
    else if (name == "dedup_screen") (s"$work/idx1x", s"$work/idxbig")
    else if (name.startsWith("skew_join")) (s"$work/skew1x", s"$work/skewbig")
    else (baseDir, big)

  /** Wall seconds for one full execution (all rows materialized);
    * best of `reps` — the scaling signal wants the floor, not the
    * contention tail. */
  private def time(spark: SparkSession, name: String, dir: String,
                   reps: Int = 2): Double =
    (1 to reps).map { _ =>
      // full chain including training: of the probed set only q104
      // (the shared ivf quantizer) and q174 (the probe weights)
      // consume a SessionStage memo — reset them so every rep pays
      // the whole pipeline, which is the thing whose scaling is
      // being measured
      graft.queries.TextVector.centsStageReset()
      graft.queries.ProbeStage.reset()
      // q147/q157 read the memoized pair stage — reset so the probe
      // keeps measuring their FULL chain (the exponent the README
      // table claims is the end-to-end one)
      graft.queries.NearDupStage.reset()
      // q177/q179 read the memoized source-term count table (r19)
      graft.queries.SourceTermStage.reset()
      // chains that persist a derived stage (SparkEntry's cache
      // contract) would otherwise serve rep 2 from rep 1's cached
      // blocks — the min would then measure the CACHE, not the
      // chain, and the growth exponent would collapse toward 0
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      probeFn(name)(spark, dir).foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }.min

  /** The token-stream counters whose claimed shape is linear in
    * TOKENS, not docs (README: q144/q173/q153/q159/q155 sit closest
    * to the token-bound regime) — for these the probe also reports
    * the token-normalized exponent ln(t_big/t_1)/ln(tokens ratio),
    * because the synthetic corpus's tokens-per-doc differs from
    * sf0.1's and the doc-ratio denominator under-normalizes exactly
    * the rows where fixed overhead can no longer hide a superlinear
    * term (round-17 verdict #3). */
  private val TokenNormalized = Set("q144_lang_confusion",
    "q153_source_kl", "q155_concentration", "q159_length_drift",
    "q173_padding_waste")

  /** Total corpus tokens of the documents table under `dir` — the
    * denominator the token-normalized exponents scale by. */
  private def corpusTokens(spark: SparkSession, dir: String): Long =
    spark.read.parquet(s"$dir/documents.parquet")
      .agg(sum(graft.ops.TextOps.tokenCount(col("text")).cast("long")))
      .head().getLong(0)

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft-scaleprobe")
    val baseDir = "/root/testdata/sf0.1"
    // second scale point (r17): GRAFT_PROBE_MULT=30 pushes the
    // near-linear token counters to a corpus where fixed overhead
    // cannot hide a superlinear term
    val mult = sys.env.getOrElse("GRAFT_PROBE_MULT", "10").toInt
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val big = s"$work/sf1x$mult"
    generate(spark, big, mult)
    // graph-probe inputs: 1× matches the gate-scale node count, 10×
    // is the scale side — both from the same planted-triangle shape
    generateEdges(spark, s"$work/g1x", 5000L)
    generateEdges(spark, s"$work/g10x", 5000L * mult)

    // dev-loop filter (Bench's SPARK_GRAFT_BENCH_ONLY doctrine):
    // probe only the named queries; unknown names REFUSE, a typo must
    // not emit a plausible empty table
    val only = sys.env.get("GRAFT_PROBE_ONLY").map(_.split(',').toSet)
    only.foreach { o =>
      val unknown = o -- Probed.toSet
      if (unknown.nonEmpty) {
        System.err.println(s"[probe] REFUSING: unknown GRAFT_PROBE_ONLY " +
          s"names ${unknown.toSeq.sorted.mkString(",")}")
        sys.exit(2)
      }
    }
    val probed = Probed.filter(n => only.forall(_.contains(n)))

    // dedup_screen setup: prebuild the two indexes the screen-latency
    // receipt probes — UNTIMED, like the corpus generation above (the
    // build is the amortized daily-ingest cost; the receipt times only
    // the screen). Both indexes come from the same generator family —
    // the 1× side over the first 5 000 doc_ids, the big side over all
    // 5 000·mult — so the fixed batch meets the same planted dup
    // structure (and the same per-band selectivity) at both scales;
    // only the index SIZE differs, which is the variable under test.
    if (probed.contains("dedup_screen")) {
      graft.pipeline.DedupIndex.build(spark,
        docsDf(spark, 5000L).select(col("doc_id"), col("text")),
        s"$work/idx1x")
      graft.pipeline.DedupIndex.build(spark,
        docsDf(spark, 5000L * mult).select(col("doc_id"), col("text")),
        s"$work/idxbig")
    }

    // skew-receipt setup (r19 verdict #5): planted-hot-key fact + dim
    // at both scales — UNTIMED, like every other generator above —
    // and a one-shot equality check (25 rows) pinning that the salted
    // and plain variants compute the same table before their times
    // are compared.
    if (probed.exists(_.startsWith("skew_join"))) {
      val skewN = 2000000L
      Seq((s"$work/skew1x", skewN), (s"$work/skewbig", skewN * mult))
        .foreach { case (d, n) =>
          skewFact(spark, n).write.mode("overwrite").parquet(s"$d/fact.parquet")
          skewDim(spark, n).write.mode("overwrite").parquet(s"$d/dim.parquet")
        }
      val a = skewJoin(spark, s"$work/skew1x", salted = false).collect().toSeq
      val b = skewJoin(spark, s"$work/skew1x", salted = true).collect().toSeq
      require(a == b, s"skew probe variants disagree: plain=$a salted=$b")
    }

    // one untimed warmup at the SMALL scale only (JIT/codegen —
    // Bench's device); the big scale then pays data, not compiler
    probed.foreach { n =>
      probeFn(n)(spark, dirsFor(n, work, baseDir, big)._1).foreach(_ => ())
    }

    // token ratio between the two document corpora — the denominator
    // for the token-normalized exponents (computed once, one narrow
    // aggregate per side)
    val tokRatio =
      if (probed.exists(TokenNormalized.contains))
        corpusTokens(spark, big).toDouble / corpusTokens(spark, baseDir)
      else mult.toDouble

    val rows = probed.map { n =>
      val (d1, d10) = dirsFor(n, work, baseDir, big)
      val t1 = time(spark, n, d1)
      val t10 = time(spark, n, d10)
      val exp = math.log(t10 / t1) / math.log(mult.toDouble)
      val expTok = if (TokenNormalized.contains(n))
        Some(math.log(t10 / t1) / math.log(tokRatio)) else None
      (n, t1, t10, t10 / t1, exp, expTok)
    }
    println(f"${"query"}%-16s ${"t_sf0.1"}%8s ${s"t_${mult}x"}%8s ${"ratio"}%7s ${"exponent"}%9s ${"exp_tok"}%8s")
    rows.foreach { case (n, t1, t10, r, e, et) =>
      val flag = if (e >= 1.8) "  <<< FLAG: ~quadratic growth" else ""
      val etS = et.map(v => f"$v%8.2f").getOrElse("       -")
      println(f"$n%-16s $t1%8.2f $t10%8.2f $r%7.2f $e%9.2f$etS$flag")
    }
    val json = rows.map { case (n, t1, t10, _, e, et) =>
      f"""\"$n\":{\"t1\":$t1%.3f,\"t10\":$t10%.3f,\"exp\":$e%.3f""" +
        et.map(v => f""",\"exp_tok\":$v%.3f""").getOrElse("") + "}"
    }.mkString(
      f"""{\"mult\":$mult,\"token_ratio\":$tokRatio%.3f,""", ",", "}")
    println(json)
    spark.stop()
  }
}
