package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted hybrid retrieval — the SERVED form of q111: build the
  * two ranker indexes once, then answer (query_id, qtext) batches by
  * RRF-fusing ranks read from the stores, never rescanning the
  * corpus. q111 is the from-scratch query twin (brute-force semantic
  * scan, in-plan BM25); this is what a retrieval consumer of the
  * engine actually deploys, with `AnnIndex` supplying the semantic
  * ranker exactly where q111's class doc declares the plug point.
  *
  * Layout (parquet under `dir`):
  *   - `postings/` (th, doc_id, tf, dl, df), hive-partitioned on
  *     `tb` = th mod TermBuckets — a query batch touches only its
  *     terms' buckets (static partition pruning, the inverted-list
  *     discipline `AnnIndex` applies to cells);
  *   - `stats/` — one row (n, sumdl): the BM25 corpus statistics;
  *   - `ann/` — an [[AnnIndex]] over the per-doc bag-of-words
  *     embeddings; `raw/` — the raw embedding side store its refine
  *     joins ([[graft.streaming.AnnScreenStream]]'s discipline).
  *
  * Embeddings are L2-NORMALIZED at build and query time, so the
  * ANN's L2 ranking coincides with q111's cosine ranking (for unit
  * vectors, ‖a−b‖² = 2−2·cos — monotone), instead of approximating
  * it. Postings df/stats and the ANN codebooks freeze at build (the
  * documented [[AnnIndex]] trade — drift telemetry and the periodic
  * re-build cadence apply to both stores alike).
  *
  * Scale shape: build is one corpus pass (tokens + embedding) +
  * the q70-style skew-free df join-back; serving moves O(query-term
  * postings) + O(nprobe cells) rows, ranks both sides on the
  * bounded-heap TopKPerKey/refine machinery, and fuses two
  * O(queries·depth) id-width rank tables with
  * [[graft.queries.Search.rrfFuse]] — the ONE fusion definition
  * shared with q111. */
object HybridRetrieval {

  private val TermBuckets = 64

  private def tokenHashes(c: org.apache.spark.sql.Column) =
    array_distinct(graft.ops.expressions.TokenHashes(c))

  /** Unit-normalized bag-of-words embedding of a text column
    * (sorted-distinct-hash FeatureEmbed, q111's encoder, scaled to
    * ‖v‖=1 so stored-L2 rank ≡ cosine rank). NULL for a zero-norm
    * embedding (astronomically rare for non-empty hash sets, but
    * under ANSI mode an unguarded 0.0/0.0 THROWS rather than
    * yielding NaN — the VectorOps.cosine lesson); callers filter
    * nulls out of the vector stores. */
  private def unitEmbed(c: org.apache.spark.sql.Column) = {
    val v = graft.ops.expressions.FeatureEmbed(
      sort_array(tokenHashes(c)), graft.queries.Search.SemDim)
    val norm = sqrt(aggregate(transform(v, x => x * x),
      lit(0.0), (a, b) => a + b))
    when(norm > lit(0.0), transform(v, x => x / norm))
      .otherwise(lit(null))
  }

  /** One corpus pass builds all four stores. Token-less docs are out
    * of retrieval scope (q111's contract); zero-norm embeddings
    * (astronomically rare for non-empty hash sets) are excluded from
    * the vector stores the same way. */
  def build(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    val prepared = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("text"),
        graft.ops.TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        size(col("toks")).cast("double").as("dl"),
        unitEmbed(col("text")).as("vec"),
        graft.ops.expressions.TokenHashes(col("text")).as("ths"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // postings with df via groupBy + join-back (q70's skew-free
    // device — a stop-term's posting list map-side-combines and the
    // equi-join is AQE-splittable, no content-key window)
    val postings = prepared
      .select(col("doc_id"), col("dl"), explode(col("ths")).as("th"))
      .groupBy(col("th"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfs = postings.groupBy(col("th")).agg(count(lit(1)).as("df"))
    postings.join(dfs, "th")
      .withColumn("tb", pmod(col("th"), lit(TermBuckets.toLong)))
      .write.partitionBy("tb").mode("overwrite").parquet(s"$dir/postings")
    prepared
      .agg(count(lit(1)).cast("double").as("n"), sum(col("dl")).as("sumdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    val vecs = prepared
      .filter(col("vec").isNotNull)
      .select(col("doc_id").as("vec_id"), col("vec"))
    vecs.write.mode("overwrite").parquet(s"$dir/raw")
    AnnIndex.build(spark, vecs, s"$dir/ann")
    postings.unpersist()
    prepared.unpersist()
  }

  /** Serve a query batch: (query_id LONG, qtext STRING) →
    * (query_id, doc_id, rrf_nano, rn), top-`k` fused per query.
    *
    * Lexical: the batch's term hashes collect to the driver (bounded
    * — a query batch is human-sized) and prune the postings scan to
    * their `tb` buckets; matched postings score the shared
    * bm25Contrib formula, micro-rounded PER TERM so the per-doc
    * BIGINT sum is shuffle-order-free, and rank on TopKPerKey.
    * Semantic: unit query embeddings through
    * [[AnnIndex.searchRefined]] against the stored codes + raw side
    * store — for unit vectors the exact-L2 refine rank IS the cosine
    * rank. Fusion: [[graft.queries.Search.rrfFuse]]. A query whose
    * terms none of the corpus contains simply has no lexical pool —
    * the semantic ranker still serves it (q111's paraphrase law,
    * held by the served path too). */
  def search(spark: SparkSession, queries: DataFrame, dir: String,
             k: Int = 10): DataFrame = {
    import spark.implicits._
    val depth = graft.queries.Search.RrfDepth
    val qt = queries
      .select(col("query_id"), explode(tokenHashes(col("qtext"))).as("th"))
    val terms = qt.select(col("th")).distinct().as[Long].collect()
    val buckets = terms.map(_ % TermBuckets).distinct
    val st = spark.read.parquet(s"$dir/stats").head()
    val (n, sumdl) = (st.getDouble(0), st.getDouble(1))
    val matched = spark.read.parquet(s"$dir/postings")
      .filter(col("tb").isin(buckets: _*) && col("th").isin(terms: _*))
      .join(broadcast(qt), "th")
    val contrib = graft.queries.Search.bm25Contrib(
      col("tf").cast("double"), col("df").cast("double"),
      lit(n), lit(sumdl), col("dl"))
    val lexAll = matched
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(floor(contrib * lit(1e6) + lit(0.5)).cast("bigint")).as("score_u"))
      .filter(col("score_u") > 0)
    val lex = graft.plans.TopK.perKey(lexAll, Seq("query_id"),
      Seq("score_u" -> false, "doc_id" -> true), depth, rankCol = "lrank")
    val qv = queries.select(col("query_id"), unitEmbed(col("qtext")).as("qvec"))
      .filter(col("qvec").isNotNull)
    val raw = spark.read.parquet(s"$dir/raw")
    val sem = AnnIndex.searchRefined(spark, qv, s"$dir/ann", raw, k = depth)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rn").cast("int").as("srank"))
    graft.queries.Search.rrfFuse(lex, sem, topN = k)
  }

  /** The lexical-ranker plan over the stores (spec hook: partition
    * pruning — the postings scan must read only the query terms'
    * `tb` buckets). */
  private[graft] def lexPlan(spark: SparkSession, queries: DataFrame,
                             dir: String): DataFrame = {
    import spark.implicits._
    val qt = queries
      .select(col("query_id"), explode(tokenHashes(col("qtext"))).as("th"))
    val terms = qt.select(col("th")).distinct().as[Long].collect()
    val buckets = terms.map(_ % TermBuckets).distinct
    spark.read.parquet(s"$dir/postings")
      .filter(col("tb").isin(buckets: _*) && col("th").isin(terms: _*))
  }
}
