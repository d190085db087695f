package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine determinism conventions shared by every
  * oracle-compared query (the driver replays `SparkEntry.oracleSql`
  * in DuckDB and hash-compares results — SURVEY.md §5).
  *
  * Rules:
  *  - Per-row arithmetic stays in DOUBLE with a fixed, left-assoc
  *    operation order: IEEE-754 ops on identical operands are
  *    bit-identical in any engine.
  *  - Aggregation of doubles is order-dependent (Spark partial aggs
  *    merge in shuffle-arrival order), so SUMs quantize each row to
  *    int64 micro-units with pure double arithmetic —
  *    floor(x*1e6+0.5) — then sum exactly in int64. NOT a decimal
  *    cast: Spark casts double→decimal via the value's shortest
  *    string form while DuckDB converts the exact binary value, so
  *    decimal routes diverge ~1e-12/row (measured).
  *  - Explicit rounding uses floor(x*1e6+0.5)/1e6 rather than
  *    round() for the same string-vs-binary reason.
  *  - Every query ends in a total ORDER BY on a unique key.
  */
object Determinism {

  /** Order-independent sum of a double expression, exact to 1e-6
    * per row: quantize to int64 micro-units, sum in int64 (ANSI mode
    * would fault an overflow rather than wrap; headroom is ~9.2e12
    * unit-value rows), convert back once.
    * DuckDB twin: Oracles.fsum. */
  def sumExact(e: Column): Column =
    sum(floor(e * lit(1e6) + lit(0.5))).cast("double") / lit(1e6)

  /** Exact-sum mean. DuckDB twin: Oracles.favg. */
  def avgExact(e: Column): Column =
    sumExact(e) / count(lit(1))

  /** Deterministic fixed-point rounding: floor(x*10^d + 0.5)/10^d. */
  def roundFix(e: Column, d: Int): Column = {
    val p = math.pow(10, d)
    floor(e * lit(p) + lit(0.5)) / lit(p)
  }

  /** DuckDB-side twins (string builders for oracle SQL). */
  object Oracles {
    /** Micro-unit exact sum over a double SQL expression. */
    def fsum(e: String): String =
      s"cast(sum(cast(floor(($e)*1000000.0+0.5) AS BIGINT)) AS DOUBLE)/1000000.0"
    def favg(e: String): String =
      s"${fsum(e)}/count(*)"
    def fround(e: String, d: Int): String = {
      val p = "1" + ("0" * d) + ".0"
      s"floor(($e)*$p+0.5)/$p"
    }

    /** Rewrite every CTE to `AS MATERIALIZED`: DuckDB inlines plain
      * CTEs per REFERENCE, so an iterative oracle chain whose round
      * t references round t−1 from two places re-evaluates the
      * whole prefix 2^rounds times (k-means/BPE/GD/PageRank
      * replays). Purely an evaluation hint — results unchanged.
      * ONE definition (the q90/q92/q98/q101 oracles all lean on
      * it); the regex assumes `<word> AS (` only introduces CTEs,
      * which holds across every oracle in the catalog. */
    def materializeCtes(sql: String): String =
      sql.replaceAll("""(\w+) AS \(""", "$1 AS MATERIALIZED (")
  }
}
