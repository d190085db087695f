package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph-analytics queries over the corpus: link-authority ranking
  * for crawl/keep prioritization ([[graft.ops.PageRank]] for the op
  * and its 100-TB shape; [[graft.ops.ConnectedComponents]] — the
  * other iterative graph op — lives with the dedup family it
  * serves).
  *
  * q101 ranks a derived CITATION GRAPH over the documents table:
  * the testdata corpus carries no link column (TESTDATA.md), so the
  * graph is derived in-query from doc ids with engine-portable
  * integer arithmetic — each document cites up to three EARLIER
  * documents `((doc_id · A_i + B_i) mod P) mod doc_id` (the mod-P
  * scramble rationale is on the constants below; self-citations
  * dropped; doc 0 cites nothing
  * and is the one dangling node), the same derivation the DuckDB
  * oracle replays (the q73/q74 derive-dirty-input-in-query
  * convention). Citing-backward gives the harmonic in-degree skew
  * of real citation/link graphs — early pages accumulate
  * ~3·ln(n/j) in-links — exactly the shape PageRank exists for (a
  * mod-n affine map would be a permutation: 3-regular, uniform
  * rank, nothing to measure; GraphSpec pins the realized spread). The oracle replays every power
  * iteration through micro-quantized int64 rank state, so the hash
  * gate certifies the ITERATION dynamics cross-engine (the
  * q92/q98 unrolled-loop device).
  */
object Graph {

  // citation derivation: dst_i = ((d·A_i + B_i) mod P) mod d — the
  // mod-P scramble is load-bearing: any POLYNOMIAL in d is ≡ its
  // constant term mod d (so "(d·a + b) mod d" degenerates to every
  // doc citing the same three ids), but d·A_i wraps P thousands of
  // times, making the residue pseudo-random per d and the final
  // mod-d draw ~uniform over earlier docs. A_i sized so d·A_i stays
  // < 2^63 (ANSI overflow) for corpora up to ~9k docs per the
  // testdata scales, while far exceeding P for every d ≥ 2.
  private val P = 1000000007L
  private val A = Seq(981274928374911L, 777321098765443L, 543210987654323L)
  private val B = Seq(17L, 23L, 31L)

  /** The derived (src, dst) edge frame (spec hook shares it with
    * the oracle's UNION ALL replay). Narrow map over the pruned
    * doc_id scan — no join, no shuffle. */
  private[graft] def citationEdges(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id")
      .select($"doc_id".as("src"), explode(array(
        A.zip(B).map { case (a, b) =>
          (($"doc_id" * a + b) % P) % greatest($"doc_id", lit(1L))
        }: _*)).as("dst"))
      .filter($"dst" =!= $"src")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_pagerank" -> { (s, d) =>
      import s.implicits._
      // ranking executes eagerly during construction (the q63/q92/
      // q98 precedent for driver-looped stages); the returned plan
      // is the final rank projection
      graft.ops.PageRank.run(citationEdges(Tables.documents(s, d)))
        .select($"node", ($"rm".cast("double") / lit(1e6)).as("rank"))
        .orderBy($"node")
    }
  )

  /** q101's oracle: the same edge derivation as a UNION ALL, then
    * [[graft.ops.PageRank.Rounds]] unrolled power iterations with
    * identical micro-quantized arithmetic (class doc). */
  private def pagerankOracle: String = {
    val d = graft.ops.PageRank.Damping
    // (1 − d) PRECOMPUTED in Scala and interpolated: DuckDB parses
    // "1 - 0.85" in exact DECIMAL (= the double nearest 0.15) while
    // the Spark driver computes 1 - 0.85 in binary double
    // (0.15000000000000002) — Learn.TauM1's trap; a 1-micro flip at
    // boundary corpus sizes would fail the gate
    val oneMinusD = 1 - d
    val edges = A.zip(B).map { case (a, b) =>
      s"""SELECT doc_id AS src,
         |  ((doc_id * $a + $b) % $P) % greatest(doc_id, 1) AS dst
         |  FROM documents
         |  WHERE ((doc_id * $a + $b) % $P) % greatest(doc_id, 1) <> doc_id"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    val rounds = (1 to graft.ops.PageRank.Rounds).map { t =>
      s"""c$t AS (
         |  SELECT e.dst,
         |    CAST(floor(CAST(r.rm AS DOUBLE) / 1000000.0 /
         |        CAST(od.outdeg AS DOUBLE) * 1000000.0 + 0.5)
         |      AS BIGINT) AS c
         |  FROM e JOIN r${t - 1} r ON r.node = e.src
         |  JOIN od ON od.src = e.src),
         |i$t AS (SELECT dst, CAST(sum(c) AS BIGINT) AS infl
         |        FROM c$t GROUP BY 1),
         |r$t AS (
         |  SELECT nd.node,
         |    CAST(floor($oneMinusD / CAST(n.n AS DOUBLE) * 1000000.0 + 0.5)
         |      AS BIGINT)
         |    + CAST(floor($d * CAST(coalesce(i.infl, 0) AS DOUBLE) + 0.5)
         |      AS BIGINT) AS rm
         |  FROM nd LEFT JOIN i$t i ON i.dst = nd.node, n)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |$edges),
       |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |nd AS (SELECT DISTINCT node FROM
       |       (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nd),
       |r0 AS (SELECT node,
       |         CAST(floor(1000000.0 / CAST(n.n AS DOUBLE) + 0.5) AS BIGINT)
       |           AS rm
       |       FROM nd, n),
       |$rounds
       |SELECT node, CAST(rm AS DOUBLE) / 1000000.0 AS rank
       |FROM r${graft.ops.PageRank.Rounds} ORDER BY node""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q101_pagerank" -> graft.ops.Determinism.Oracles.materializeCtes(pagerankOracle)
  )
}
