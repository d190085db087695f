package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{TextOps, VectorOps, WeightedAvgVec}

/** The reference's three pipeline entry points re-expressed as
  * composable Spark batch jobs (SURVEY.md §3, §7.2 M3):
  *
  *  - EP1 `run.py:126-156`  → [[embedJob]]: scan → project → embed →
  *    sharded parquet sink. The reference's tail-drop bug (L2,
  *    `run.py:138-148` — partial batches silently discarded, 54,198
  *    rows lost) is structurally impossible here: there is no
  *    row-buffering; every scanned row reaches the sink, which
  *    [[PipelineSpec]] regression-tests.
  *  - EP2 `run_extra.py:50-87` → [[chunkEmbedJob]]: sentence/token
  *    chunking → per-chunk embed → length-weighted pooling.
  *  - EP3 `process.py:69-186` → [[missingIds]] (anti-join backfill
  *    feed) + [[mergeJob]] (title⨝abstract weighted concat).
  *
  * Shard handling replaces pickle files (`join.py`):
  * `maxRecordsPerFile` bounds rows per part-file on write (K3), and
  * [[readSharded]] recovers an ordered shard id from the part-file
  * name on read (S4 + T6 `join.py:12`).
  *
  * Checkpoint/resume (K2/L3): each job is a deterministic,
  * idempotent write to its own output dir — re-running after a crash
  * overwrites cleanly (mode=overwrite), which replaces the
  * reference's broken manual `(batch_id, line_num)` bookkeeping
  * (L4, `run.py:121-134` — saved but never applied). The streaming
  * analog with a real checkpoint dir lives in graft.streaming.
  */
object EmbedPipeline {

  /** EP1: embed a text column and write a sharded parquet dataset.
    * Narrow pipeline — zero shuffles; parallelism = input splits.
    * Returns rows written (== rows scanned; no tail-drop). */
  def embedJob(spark: SparkSession, inPath: String, outPath: String,
               idCol: String, contentCol: String, dim: Int,
               shardRows: Int): Long = {
    val df = spark.read.parquet(inPath)
      .select(col(idCol).as("id"), col(contentCol).as("content"))
      // codegen kernel ≡ VectorOps.embed (unit-enforced); the HOF
      // form re-hashes the text once per dimension
      .withColumn("embedding", graft.ops.expressions.HashEmbed(col("content"), dim))
    // A3: rows counted in-flight by observe-metrics — no post-write
    // recount scan (at 100 TB that second scan is real money).
    withMaxRecordsPerFile(spark, shardRows) {
      graft.ops.Metrics.observedParquetWrite(df, outPath).rows
    }
  }

  /** EP1 with a PLUGGABLE model — the reference's actual job shape
    * (`run.py:42` `model.encode(batch)` over InstructorXL): rows
    * stream through [[graft.ops.Inference.mapBatched]] with one
    * encoder instance per partition and fixed-size batches whose
    * tail always flushes. [[embedJob]] keeps the codegen `HashEmbed`
    * kernel (the oracle-gated stand-in); THIS entry point is the
    * seam a real model plugs into — same sink, same shard bound,
    * same no-tail-drop guarantee, only the encoder swapped. The
    * wrapper hands the user's text encoder exactly the batch
    * mapBatched formed (ids zip back positionally, and mapBatched's
    * length check rejects an encoder that drops or pads rows), so
    * "batch boundaries hold" is a property of the seam, not of any
    * particular model. PipelineSpec drives a non-hash model
    * (bag-of-chars) through embed → merge → AnnIndex build → search
    * end-to-end. */
  def embedJobWith(spark: SparkSession, inPath: String, outPath: String,
                   idCol: String, contentCol: String, batchSize: Int,
                   shardRows: Int,
                   enc: graft.ops.BatchEncoder[String, Seq[Double]]): Long = {
    import spark.implicits._
    val rows = spark.read.parquet(inPath)
      .select(col(idCol).cast("long").as("id"),
        col(contentCol).cast("string").as("content"))
      .as[(Long, String)]
    val embedded = graft.ops.Inference.mapBatched(rows, batchSize,
      new graft.ops.BatchEncoder[(Long, String), Embedded] {
        def encodeBatch(xs: Seq[(Long, String)]): Seq[Embedded] = {
          val vecs = enc.encodeBatch(xs.map(_._2))
          // checked HERE, not left to mapBatched's length guard: a
          // zip would silently TRUNCATE an over-producing encoder
          // back to batch length and the guard would never see it
          require(vecs.length == xs.length,
            s"encoder returned ${vecs.length} vectors for a ${xs.length}-row batch")
          xs.lazyZip(vecs).map { case ((id, c), v) => Embedded(id, c, v) }
        }
      })
    withMaxRecordsPerFile(spark, shardRows) {
      graft.ops.Metrics.observedParquetWrite(embedded.toDF(), outPath).rows
    }
  }

  /** The K3 rows-per-file bound is the session conf, not a writer
    * option (the option form is silently ignored). */
  private def withMaxRecordsPerFile[A](spark: SparkSession, shardRows: Int)(f: => A): A = {
    val key = "spark.sql.files.maxRecordsPerFile"
    val prev = spark.conf.get(key, "0")
    spark.conf.set(key, shardRows.toLong)
    try f finally spark.conf.set(key, prev)
  }

  /** Compaction stats from [[compactJob]]. */
  final case class CompactStats(rowsIn: Long, rowsOut: Long,
                                filesIn: Int, filesOut: Int)

  /** The `join.py` compaction job (S4→K3, `join.py:25-41`): many
    * small shard files in → few bounded files out, plus the count
    * reconciliation `process.py:131-173` runs by hand. The
    * round-robin `repartition` sizes output files near the K3 bound
    * (ceil(rows/shardRows) partitions) and `maxRecordsPerFile`
    * enforces the bound exactly. This is the small-files repair a
    * 100-TB pipeline runs continuously — a checkpoint cadence of
    * ~3,200 rows/shard (`run.py:150-153`) makes thousands of tiny
    * files per billion rows; scan cost recovers only after
    * compaction. Throws on any row loss (there is none to lose —
    * no tail-drop exists in this engine; the assert preserves the
    * reference's reconciliation semantics). */
  def compactJob(spark: SparkSession, inPath: String, outPath: String,
                 shardRows: Int): CompactStats = {
    val in = spark.read.parquet(inPath)
    val filesIn = in.inputFiles.length
    val rowsIn = in.count()
    val parts = math.max(1L, (rowsIn + shardRows - 1) / shardRows).toInt
    val rowsOut = withMaxRecordsPerFile(spark, shardRows) {
      graft.ops.Metrics.observedParquetWrite(in.repartition(parts), outPath).rows
    }
    val filesOut = spark.read.parquet(outPath).inputFiles.length
    require(rowsOut == rowsIn,
      s"compaction lost rows: $rowsIn in, $rowsOut out")
    CompactStats(rowsIn, rowsOut, filesIn, filesOut)
  }

  /** S4+T6: read a sharded parquet dir with a dense 0..n-1 shard id
    * from the lexicographic part-file order — the `join.py:12`
    * numeric-suffix sort, minus the pickle. (A single task writing
    * multiple bounded files shares one task id, so the filename as a
    * whole, not its task-id field, is the shard key.) Ranking runs
    * over the distinct FILE list (small), broadcast back — no
    * global sort of the data. */
  /** Incremental refresh (upsert-by-partition): rewrite ONLY the
    * hive partitions present in `updates`, leaving every other
    * partition's files untouched — dynamic partition overwrite, the
    * idempotent repair/backfill primitive a 100-TB store needs (the
    * reference instead rewrites whole datasets and hand-reconciles,
    * `process.py:131-173`). Static `overwrite` would truncate the
    * whole root; `append` would duplicate repaired rows — dynamic
    * mode is the only shape that makes re-running a backfill a
    * no-op. Conf is scoped-and-restored like maxRecordsPerFile:
    * session-level flags must not leak out of a job. */
  def upsertPartitions(spark: SparkSession, updates: DataFrame,
                       outPath: String, partitionCol: String): Unit = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try updates.write.mode("overwrite").partitionBy(partitionCol).parquet(outPath)
    finally spark.conf.set(key, prev)
  }

  def readSharded(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path).withColumn("fname", input_file_name())
    val files = df.select(col("fname")).distinct()
      .withColumn("shard_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("fname"))) - 1)
    df.join(broadcast(files), Seq("fname")).drop("fname")
  }

  /** J2 (`process.py:69-117`): ids present in `raw` but not in
    * `processed` — one anti-join instead of 49 lines of positional
    * diffing. Input to the EP2 backfill. */
  def missingIds(raw: DataFrame, processed: DataFrame, idCol: String): DataFrame =
    raw.join(processed, Seq(idCol), "left_anti")

  /** EP2 (`run_extra.py:50-87`): chunk long documents to ≤maxTokens
    * windows, embed each chunk, pool per document weighted by chunk
    * char length (`run_extra.py:47`). One shuffle (the groupBy);
    * map-side partial aggregation keeps it O(docs). */
  def chunkEmbedJob(spark: SparkSession, docs: DataFrame, outPath: String,
                    idCol: String, contentCol: String,
                    maxTokens: Int, dim: Int): Long = {
    val pooled = docs
      .select(col(idCol).as("id"), TextOps.tokens(col(contentCol)).as("toks"))
      // posexplode_OUTER: a zero-token doc must still reach the sink
      // (with an empty pooled vector) — plain posexplode would drop
      // it, the exact row-loss class this module exists to prevent
      .select(col("id"),
        posexplode_outer(TextOps.chunksOf(col("toks"), maxTokens)).as(Seq("pos", "chunk")))
      .withColumn("emb", graft.ops.expressions.HashEmbed(col("chunk"), dim))
      // null chunk (outer-exploded empty doc): weight 0, not null —
      // VecW.w is a primitive Double and must never see null
      .withColumn("w", coalesce(length(col("chunk")), lit(0)).cast("double"))
      .groupBy(col("id"))
      .agg(WeightedAvgVec.asUdaf(col("emb"), col("w")).as("embedding"))
    pooled.write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath).count()
  }

  /** EP3 merge (`process.py:119-129`): equi-join two embedding sets
    * on id and emit concat(title*w, abstract*(1-w)). The reference's
    * alignment asserts become an in-plan raise_error on any id
    * missing from either side (1:1 expected here, unlike q22's
    * backfill-tolerant direction). */
  def mergeJob(spark: SparkSession, titlesPath: String, abstractsPath: String,
               outPath: String, titleWeight: Double): Long = {
    val t = spark.read.parquet(titlesPath)
      .select(col("id").as("t_id"), col("embedding").as("t_emb"))
    val a = spark.read.parquet(abstractsPath)
      .select(col("id").as("a_id"), col("embedding").as("a_emb"))
    val merged = t.join(a, col("t_id") === col("a_id"), "full_outer")
      .select(
        when(col("t_id").isNull || col("a_id").isNull,
          raise_error(concat(lit("merge misalignment at id="),
            coalesce(col("t_id"), col("a_id")).cast("string"))))
          .otherwise(col("t_id")).as("id"),
        VectorOps.scaleConcat(col("t_emb"), col("a_emb"), titleWeight)
          .as("embedding"))
    merged.write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath).count()
  }

  /** EP3 as ONE typed pass: merge + both-direction missing-id
    * detection + cardinality check in a single `cogroup` over the
    * [[Embedded]] record triple (the reference runs three separate
    * positional scans for this — merge `process.py:119-129`, missing
    * ids `process.py:69-117`, count reconciliation
    * `process.py:131-173`). Spark co-partitions both sides on id —
    * one shuffle each — where the join + two anti-joins formulation
    * shuffles the same data three times. Per-key state is that id's
    * own rows (bounded), so this scales with corpus size, not key
    * cardinality. Weighted-concat arithmetic is element-for-element
    * the same double ops as [[mergeJob]]'s `scaleConcat`
    * (PipelineSpec asserts bit-equality between the two paths).
    *
    * Statuses: `both` (merged embedding), `title_only` /
    * `abstract_only` (the backfill feeds), `conflict` (duplicate id
    * within a side — the condition the reference's zip silently
    * corrupts on). */
  def cogroupReconcile(titles: org.apache.spark.sql.Dataset[Embedded],
                       abstracts: org.apache.spark.sql.Dataset[Embedded],
                       titleWeight: Double): org.apache.spark.sql.Dataset[Reconciled] = {
    import titles.sparkSession.implicits._
    val aw = 1.0 - titleWeight
    titles.groupByKey(_.id).cogroup(abstracts.groupByKey(_.id)) { (id, ts, as0) =>
      val t = ts.toSeq
      val a = as0.toSeq
      if (t.size > 1 || a.size > 1)
        Iterator.single(Reconciled(id, "conflict", Seq.empty))
      else (t.headOption, a.headOption) match {
        case (Some(x), Some(y)) =>
          Iterator.single(Reconciled(id, "both",
            x.embedding.map(_ * titleWeight) ++ y.embedding.map(_ * aw)))
        case (Some(_), None) => Iterator.single(Reconciled(id, "title_only", Seq.empty))
        case (None, Some(_)) => Iterator.single(Reconciled(id, "abstract_only", Seq.empty))
        case _ => Iterator.empty
      }
    }
  }
}

/** The reference's universal intermediate row `(content, embedding,
  * id)` (`run.py:142-144`, SURVEY §1.1) as a typed record — the
  * schema [[EmbedPipeline.embedJob]] writes. */
case class Embedded(id: Long, content: String, embedding: Seq[Double])

/** One reconciled id from [[EmbedPipeline.cogroupReconcile]]. */
case class Reconciled(id: Long, status: String, embedding: Seq[Double])
