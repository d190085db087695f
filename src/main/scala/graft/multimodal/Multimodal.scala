package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{BatchEncoder, Inference}

/** Multimodal columns (builder brief): image/audio/video handled as
  * opaque `binary` payloads + typed metadata, with decode / feature
  * extraction as per-partition batched inference
  * (graft.ops.Inference — the Scala analog of a Pandas-UDF
  * `mapInPandas` stage).
  *
  * The DECODE STEP IS A STUB: no image/audio codecs exist in this
  * environment, so [[StubFeatureEncoder]] produces a deterministic
  * fake feature vector from the payload bytes (seeded rolling hash
  * per dimension). Everything around it — the schema, the binary
  * column, batch shape, partitioning, the Dataset plumbing — is
  * real; swapping in a true decoder is implementing one
  * [[BatchEncoder]].
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata (what a manifest of
    * 100 TB of media objects looks like: bytes inline or, at real
    * scale, an object-store pointer in `uri` with payload null). */
  case class Media(media_id: Long, kind: String, payload: Array[Byte],
                   width: Int, height: Int, duration_ms: Long)

  case class MediaFeature(media_id: Long, kind: String, n_bytes: Long,
                          feature: Array[Float])

  /** STUB decode+featurize: deterministic bytes→vector. A real
    * implementation would decode pixels/samples here (one codec
    * handle per partition, reused across batches). */
  class StubFeatureEncoder(dim: Int) extends BatchEncoder[Media, MediaFeature] {
    override def encodeBatch(xs: Seq[Media]): Seq[MediaFeature] = xs.map { m =>
      val feat = new Array[Float](dim)
      var acc = 1469598103934665603L // FNV offset basis, public constant
      var i = 0
      while (i < m.payload.length) {
        acc = (acc ^ (m.payload(i) & 0xffL)) * 1099511628211L
        i += 1
      }
      var d = 0
      while (d < dim) {
        val h = (acc + (d + 1) * 2654435761L) % 1000000007L
        feat(d) = (math.abs(h).toDouble / 1000000007.0 * 2.0 - 1.0).toFloat
        d += 1
      }
      MediaFeature(m.media_id, m.kind, m.payload.length.toLong, feat)
    }
  }

  /** Build a media manifest from the `documents` table (the testdata
    * has no binary table — payload := utf8 bytes of the text, kind
    * assigned round-robin; deterministic). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id"), lit(4)) * 256 + 256).cast("int").as("width"),
        (pmod(col("doc_id"), lit(3)) * 240 + 240).cast("int").as("height"),
        (col("n_chars") * 100).as("duration_ms"))
      .as[Media]
  }

  /** Decode/featurize pipeline: batched stub inference, then a
    * DataFrame for downstream relational ops. Batch size mirrors the
    * reference's 32 (`run.py:74`). */
  def extractFeatures(spark: SparkSession, media: Dataset[Media],
                      dim: Int, batchSize: Int = 32): DataFrame = {
    import spark.implicits._
    Inference.mapBatched(media, batchSize, new StubFeatureEncoder(dim)).toDF()
  }

  /** Exact dedup over opaque payload BYTES (q118; spec hook:
    * planted duplicate payloads) — content-addressable-storage
    * accounting for a media lake: group by (kind, sha256(payload)),
    * report per kind how many objects exist, how many are distinct,
    * how many groups have duplicates, and how many bytes a
    * dedup-by-content store would reclaim (every copy past the
    * first). The cryptographic hash is the right tool here — unlike
    * the text family's polyhash fingerprints, media dedup keys get
    * persisted as object-store addresses, so collision resistance is
    * part of the contract.
    *
    * Scale shape: the ONLY pass over payload bytes is the map-side
    * hash projection — the shuffle moves (kind, 64-hex-char hash,
    * byte count) rows, never payloads, and the groupBy map-side-
    * combines identical objects within each input partition first. A
    * degenerate corpus (one viral image re-uploaded 10⁹ times)
    * concentrates one GROUP key but its rows are id-width and the
    * per-kind rollup is 3 rows — nothing holds an occurrence SET
    * anywhere. Takes (kind, payload) so planted frames and derived
    * manifests share the chain. */
  def dedupReport(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val groups = media
      .select(col("kind"), sha2(col("payload"), 256).as("h"),
        length(col("payload")).cast("long").as("nb"))
      .groupBy(col("kind"), col("h"))
      .agg(count(lit(1)).as("cnt"), max(col("nb")).as("nb"))
    groups.groupBy(col("kind"))
      .agg(sum(col("cnt")).as("n_objects"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("dup_groups"),
        sum((col("cnt") - 1) * col("nb")).as("reclaim_bytes"))
      .orderBy(col("kind"))
  }

  /** Resize plumbing for `image` payloads: recompute the metadata to
    * the target box (aspect-preserving fit, integer arithmetic —
    * exactly what a real resize records) and re-sample the payload to
    * a deterministic stub raster of ceil(bytes · scale²) bytes taken
    * at a fixed stride. A real implementation replaces ONLY the
    * byte-level `resample` with a pixel scaler; schema and plumbing
    * stay as they are. */
  def resizeImages(media: Dataset[Media], maxW: Int, maxH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("width"), col("height"), col("payload"))
      .withColumn("scale",
        least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0)))
      .select(col("media_id"),
        floor(col("width") * col("scale")).cast("int").as("out_w"),
        floor(col("height") * col("scale")).cast("int").as("out_h"),
        // stub resample: the scaled byte budget off the front (codegen
        // substring — a real scaler swaps this one expression)
        expr("substring(payload, 1, greatest(int(length(payload) * scale * scale), 1))")
          .as("payload"))
  }

  /** Frame-sampling plumbing for `video` payloads: every k-th
    * 256-byte block as a "frame" (stub for a real frame decoder;
    * demonstrates the explode shape: 1 media row → N frame rows). */
  def sampleFrames(media: Dataset[Media], everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("payload"),
        posexplode(sequence(lit(0),
          greatest((length(col("payload")) / lit(256 * everyK)).cast("int") - 1, lit(0))))
          .as(Seq("frame_idx", "block")))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(payload, block * ${256 * everyK} + 1, 256)")
          .as("frame_bytes"))
  }
}
