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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
