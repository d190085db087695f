package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query and total
  * seconds over SPARK_GRAFT_SF_DIR.
  *
  * Methodology (round-3 fix for the flapping 2× gate — the old
  * harness single-passed with `.count()`, so q01 absorbed all JIT/
  * codegen warmup and projections were never materialized):
  *   - one untimed warmup pass over every query (JIT, codegen cache,
  *     parquet footer cache);
  *   - then 3 timed passes per query, report the MEDIAN;
  *   - action = `foreach(_ => ())`: materializes every output row
  *     (unlike count(), which lets Spark skip project/sort work).
  */
object Bench {

  /** 1-minute load average, or -1 where /proc is unavailable. */
  private def loadAvg(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Contamination guard (round-6 lesson: a bench run concurrently
    // with other sbt/Spark JVMs reads 1.5–5.9× slow and the inflated
    // numbers got committed as the round's measurement). Record the
    // pre-run load average in the output so a reader can judge the
    // number, and warn loudly when the machine is already busy. The
    // threshold is deliberately low — this process has done no work
    // yet, so ANY load belongs to someone else.
    val loadBefore = loadAvg()
    if (loadBefore > 2.0)
      System.err.println(
        f"[bench] WARNING: loadavg $loadBefore%.2f before start — another " +
          "workload is active; timings will be inflated. Re-run on an idle " +
          "machine before trusting this output.")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // same session conventions as Verify: q27's date_format must
      // not depend on machine timezone; events.ts needs nanosAsLong
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).foreach(_ => ())

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup (untimed)
    names.foreach(n => try run(n) catch { case _: Throwable => () })
    // timed: median of 3; a failing query reports -1, never a
    // fast-looking time-to-failure
    val results = names.map { name =>
      var failed = false
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try run(name) catch { case _: Throwable => failed = true }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // bound cache retention: a query's persisted stage (q29/q34)
      // serves its own warmup+timed passes, then releases before the
      // next query measures
      spark.catalog.clearCache()
      name -> (if (failed) -1.0 else times(1))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures are EXCLUDED from the total (a -1 sentinel would make
    // a partially-failing run look faster) and reported explicitly
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // load_before < ~2 means the run started on an idle machine;
    // load_after reflects this process's own 32-thread work and is
    // informational only
    val loadJson = s""""load_before":$loadBefore,"load_after":${loadAvg()}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,$loadJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
