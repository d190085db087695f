package graft

import org.scalatest.funsuite.AnyFunSuite

/** SparkEntry.trainedStageQueries — the bench's memoized-training
  * disclosure must describe reality: every declared query exists,
  * and each declared stage builds ONCE however many of its declared
  * consumers run (ClusterSpec and BpeSpec pin the near-dup and BPE
  * stages; this covers the remaining two and the map itself).
  */
class TrainedStageSpec extends AnyFunSuite {
  import TestSpark._

  test("every declared trained-stage query is a real catalog query") {
    val declared = SparkEntry.trainedStageQueries.values.flatten.toSet
    val unknown = declared -- SparkEntry.queries.keySet
    assert(unknown.isEmpty,
      s"trainedStageQueries names unknown queries: $unknown")
  }

  test("probe weights train once for its four consumers (q98, q113, q132, q174)") {
    graft.queries.ProbeStage.reset()
    SparkEntry.queries("q98_linear_probe")(spark, sf).foreach(_ => ())
    SparkEntry.queries("q113_probe_calibration")(spark, sf).foreach(_ => ())
    SparkEntry.queries("q132_threshold_sweep")(spark, sf).foreach(_ => ())
    SparkEntry.queries("q174_label_noise")(spark, sf).foreach(_ => ())
    assert(graft.queries.ProbeStage.buildCount == 1,
      s"probe trained ${graft.queries.ProbeStage.buildCount} times")
    spark.catalog.clearCache()
  }

  test("the verified pair set builds once for q147, q157, and the label stage") {
    graft.queries.NearDupStage.reset()
    SparkEntry.queries("q147_editdist_verify")(spark, sf).foreach(_ => ())
    SparkEntry.queries("q157_containment")(spark, sf).foreach(_ => ())
    SparkEntry.queries("q63_dedup_clusters")(spark, sf).foreach(_ => ())
    assert(graft.queries.NearDupStage.pairBuildCount == 1,
      s"pair chain ran ${graft.queries.NearDupStage.pairBuildCount} times")
    spark.catalog.clearCache()
  }

  test("ParquetStage materializes at a deterministic scratch path and reset deletes it") {
    // The round-16 advisor note: the pair memo used to write one
    // leaked driver-local temp dir per build. Pin the replacement's
    // contract — deterministic path per (stage, data dir), dir exists
    // while cached, dir GONE after reset.
    graft.queries.NearDupStage.reset()
    val path = graft.ops.ParquetStage.stagePath(spark, "neardup-pairs", sf)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.queries.NearDupStage.pairs(spark, sf).foreach(_ => ())
    assert(fs.exists(path), s"pair memo should materialize at $path")
    graft.queries.NearDupStage.reset()
    assert(!fs.exists(path),
      s"reset must delete the memo dir, $path still exists")
    spark.catalog.clearCache()
  }

  test("stage scratch paths are isolated per session (no cross-session overwrite)") {
    // The round-17 advisor note: the path was deterministic per
    // (name, dir) only, while the memo cache is keyed per (session,
    // dir) — two live sessions (or two driver processes sharing the
    // default tmpdir) resolved to ONE directory and overwrote /
    // deleted each other's parquet mid-scan. Pin the fix: a sibling
    // session of the SAME context gets a different path, and the
    // path carries the applicationId so separate processes cannot
    // collide on a shared scratch root either.
    val sibling = spark.newSession()
    val a = graft.ops.ParquetStage.stagePath(spark, "neardup-pairs", sf)
    val b = graft.ops.ParquetStage.stagePath(sibling, "neardup-pairs", sf)
    assert(a != b, s"sibling sessions must not share a stage dir: $a")
    assert(a.toString.contains(spark.sparkContext.applicationId),
      s"stage path must carry the applicationId: $a")
    // still deterministic for ONE session: rebuilds overwrite in place
    assert(a == graft.ops.ParquetStage.stagePath(spark, "neardup-pairs", sf))
  }

  test("the PC fit builds once for its two consumers (q129, q130)") {
    graft.queries.Learn.pcStageReset()
    SparkEntry.queries("q129_top_pc")(spark, sf).foreach(_ => ())
    SparkEntry.queries("q130_whiten")(spark, sf).foreach(_ => ())
    assert(graft.queries.Learn.pcStageBuilds == 1,
      s"PC fit ran ${graft.queries.Learn.pcStageBuilds} times")
    spark.catalog.clearCache()
  }

  test("the source-term count table builds once for q177 and q179") {
    // r19 (r18 verdict #2): the per-call cache scoping that fixed the
    // audit-export memory leak doubled both queries; the recovery is
    // this parquet memo — one tokenize+combine pass however many of
    // the two consumers run, disclosed in trained_stages.
    graft.queries.SourceTermStage.reset()
    SparkEntry.queries("q177_loo_novelty")(spark, sf).foreach(_ => ())
    SparkEntry.queries("q179_stylometry")(spark, sf).foreach(_ => ())
    assert(graft.queries.SourceTermStage.buildCount == 1,
      s"count pass ran ${graft.queries.SourceTermStage.buildCount} times")
    // and the memoed path still serves the oracle-gated rows: both
    // queries stay non-empty and source-sorted off the parquet scan
    val rows = SparkEntry.queries("q177_loo_novelty")(spark, sf)
      .select("source").collect().map(_.getString(0)).toSeq
    assert(rows.nonEmpty && rows == rows.sorted,
      "memo-served q177 lost its total order")
    spark.catalog.clearCache()
  }

  test("stage builds record wall seconds under their trainedStageQueries key") {
    // r19 verdict #3: the memoized builds run in Bench's UNTIMED
    // warmup, so their cost appeared in no timed number. SessionStage
    // now records cumulative build seconds per metric name and Bench
    // emits them as trained_stage_build_secs — pin that (a) a build
    // records a positive time under the SAME key the disclosure map
    // uses, (b) a memo HIT records nothing new, (c) reset clears.
    graft.ops.SessionStage.resetBuildSecs()
    graft.queries.Learn.pcStageReset()
    SparkEntry.queries("q129_top_pc")(spark, sf).foreach(_ => ())
    val t1 = graft.ops.SessionStage.buildSecs
    assert(t1.contains("pc_fit") && t1("pc_fit") > 0.0,
      s"pc_fit build time not recorded: $t1")
    assert(SparkEntry.trainedStageQueries.contains("pc_fit"),
      "build-time key must match the disclosure map's stage key")
    SparkEntry.queries("q130_whiten")(spark, sf).foreach(_ => ())
    assert(graft.ops.SessionStage.buildSecs("pc_fit") == t1("pc_fit"),
      "a memo hit must not add build time")
    graft.ops.SessionStage.resetBuildSecs()
    assert(graft.ops.SessionStage.buildSecs.isEmpty)
    spark.catalog.clearCache()
  }

  test("the shared quantizer trains once for its three consumers (q104, q108, q115)") {
    graft.queries.TextVector.centsStageReset()
    SparkEntry.queries("q104_semdedup")(spark, sf).foreach(_ => ())
    SparkEntry.queries("q108_embed_outliers")(spark, sf).foreach(_ => ())
    SparkEntry.queries("q115_corpus_map")(spark, sf).foreach(_ => ())
    assert(graft.queries.TextVector.centsStageBuildCount == 1,
      s"quantizer trained ${graft.queries.TextVector.centsStageBuildCount} times")
    spark.catalog.clearCache()
  }
}
