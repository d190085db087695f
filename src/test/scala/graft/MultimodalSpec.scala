package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.ops.{BatchEncoder, Inference}

/** Multimodal plumbing tests: the decode is a stub, the Spark-side
  * contract (schema, batch shape, determinism, no row loss) is real.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("media manifest: typed schema, binary payloads, no row loss") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    assert(media.count() == 500)
    val kinds = media.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
  }

  test("batched feature extraction: every row featurized, deterministic, fixed dim") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val f1 = Multimodal.extractFeatures(spark, media, dim = 16)
    assert(f1.count() == 500)
    assert(f1.select(size($"feature")).distinct().collect().map(_.getInt(0)).toSeq == Seq(16))
    // deterministic across runs (the oracle/test contract for stubs)
    val f2 = Multimodal.extractFeatures(spark, media, dim = 16)
    assert(f1.exceptAll(f2).isEmpty && f2.exceptAll(f1).isEmpty)
    // n_bytes matches the payload length recorded in documents
    val bad = f1.join(Tables.documents(spark, sf),
        $"media_id" === $"doc_id")
      .filter($"n_bytes" =!= $"n_chars").count()
    assert(bad == 0, "payload byte count drifted from n_chars (ascii text)")
  }

  test("payload dedup report: byte-identical copies group, one-byte edits and cross-kind twins do not") {
    // q118's chain on a planted manifest: object A uploaded 3× as
    // image, once more as audio (same bytes, different kind — a
    // content-addressable store scoped per kind keeps both); object
    // B once; object C = B with ONE byte flipped (must not group)
    val a = "payload-A-0123456789".getBytes("UTF-8")
    val b = "payload-B-0123456789".getBytes("UTF-8")
    val c = b.clone(); c(c.length - 1) = '8'
    val manifest = Seq(
      ("image", a), ("image", a), ("image", a), ("audio", a),
      ("image", b), ("image", c)
    ).toDF("kind", "payload")
    val rep = Multimodal.dedupReport(manifest).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // image: 5 objects, 3 distinct (a, b, c), 1 dup group, 2 extra
    // copies of the 20-byte a reclaimable
    assert(rep("image") == ((5L, 3L, 1L, 2L * a.length)), s"image row: $rep")
    // audio: the cross-kind twin stays its own singleton group
    assert(rep("audio") == ((1L, 1L, 0L, 0L)), s"audio row: $rep")
  }

  test("encoder sees bounded batches and the tail batch is flushed (L2 regression)") {
    // 10 rows, batch 4 → batches of 4,4,2 — the 2-row tail must
    // arrive (run.py dropped it; we must not)
    val seen = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val enc = new BatchEncoder[Multimodal.Media, Long] {
      override def encodeBatch(xs: Seq[Multimodal.Media]): Seq[Long] = {
        seen.add(xs.length); xs.map(_.media_id)
      }
    }
    val ten = Multimodal.mediaFromDocuments(spark, sf)
      .filter($"media_id" < 10).coalesce(1)
    val out = Inference.mapBatched(ten, 4, enc).collect()
    assert(out.sorted.toSeq == (0L until 10L))
    val sizes = seen.value
    assert(sizes.size() == 3 && !(0 until sizes.size()).exists(i => sizes.get(i) > 4),
      s"batch sizes $sizes, want [4,4,2]")
  }

  test("image resize: aspect-preserving fit, never upscales, payload budget tracks scale") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val resized = Multimodal.resizeImages(media, maxW = 300, maxH = 300)
    val nImages = media.filter($"kind" === "image").count()
    assert(resized.count() == nImages, "resize must be 1:1 over images")
    val bad = resized.filter($"out_w" > 300 || $"out_h" > 300).count()
    assert(bad == 0, "resize exceeded the target box")
    // joining back: out dims are the aspect-preserving integer fit,
    // and no image got LARGER
    val checked = resized.as("r")
      .join(media.filter($"kind" === "image").as("m"), "media_id")
      .select($"media_id", $"out_w", $"out_h", $"m.width", $"m.height",
        length($"r.payload").as("out_bytes"), length($"m.payload").as("in_bytes"))
    assert(checked.filter($"out_w" > $"width" || $"out_h" > $"height").count() == 0,
      "resize upscaled an image")
    assert(checked.filter($"out_bytes" > $"in_bytes").count() == 0,
      "resized payload grew")
  }

  test("video frame sampling explodes 1 media row into N bounded frames") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val frames = Multimodal.sampleFrames(media, everyK = 1)
    val nVideos = media.filter($"kind" === "video").count()
    assert(frames.count() >= nVideos, "every video yields at least one frame")
    val maxLen = frames.select(max(length($"frame_bytes"))).collect()(0).getInt(0)
    assert(maxLen <= 256, s"frame block of $maxLen bytes > 256")
  }
}
