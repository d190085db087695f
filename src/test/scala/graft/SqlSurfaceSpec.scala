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

  test("non-literal kernel parameters fail fast with a clear message") {
    Tables.documents(spark, sf).createOrReplaceTempView("docs_sql2")
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(text, doc_id) FROM docs_sql2").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
