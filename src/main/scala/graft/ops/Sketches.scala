package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Approximate sketches for corpus-scale curation (capability
  * extension; the reference reconciles counts by full recount,
  * `process.py:131-173` — at 100 TB you estimate first and recount
  * only what the estimate flags):
  *
  *  - cardinality: `approx_count_distinct` (HyperLogLog++, fixed
  *    relative error, constant memory — contrast the exact
  *    count_distinct shuffle of q08);
  *  - membership: Bloom filter built on one pass of a (small) key
  *    set, broadcast to pre-filter a huge scan BEFORE its shuffle —
  *    the cross-JOB form of the runtime bloom pruning AQE injects
  *    within one query (ScaleSpec); the reference's missing-id
  *    backfill (`process.py:69-117`) is exactly this shape;
  *  - frequency: Count-Min sketch, one-sided error (never
  *    undercounts), for heavy-hitter detection without a groupBy.
  *
  * Estimates are NOT oracle-comparable across engines by design
  * (sketch internals differ); the gates are error-bound specs
  * (SketchSpec), like the streaming modules.
  */
object Sketches {

  /** HLL++ distinct estimate with the given target relative standard
    * deviation. */
  def approxDistinct(df: DataFrame, col: String, rsd: Double): Long =
    df.select(approx_count_distinct(new Column(col), rsd).as("n"))
      .head().getLong(0)

  /** One-pass Bloom filter over a key column (driver-held, tiny,
    * broadcastable — e.g. 1M keys at 1% fpp ≈ 1.2 MB). */
  def bloomOf(keys: DataFrame, col: String, expected: Long,
              fpp: Double): BloomFilter =
    keys.stat.bloomFilter(col, expected, fpp)

  /** Pre-filter `big` to rows whose `col` is probably in `keys`:
    * false positives pass (pay only the downstream exact join),
    * members NEVER drop — so `bloomPrefilter(...).join(keys, col)`
    * equals `big.join(keys, col)` with the scan-side volume cut to
    * |matches| + fpp·|big| before the shuffle. The filter evaluates
    * as a deserialized driver sketch inside a UDF: a pre-shuffle
    * stage that is bandwidth-, not CPU-bound — the one place a UDF
    * predicate is the right trade. */
  def bloomPrefilter(big: DataFrame, col: String, bloom: BloomFilter): DataFrame = {
    val ser = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val spark = big.sparkSession
    val bcast = spark.sparkContext.broadcast(ser)
    val mightContain = udf { (k: Long) =>
      // one lazy deserialize per executor thread, reused across rows
      BloomHolder.get(bcast.value).mightContainLong(k)
    }
    big.filter(mightContain(new Column(col)))
  }

  /** Count-Min frequency sketch over a column (one pass, mergeable,
    * never undercounts). eps: relative overcount bound vs total row
    * count; confidence: probability the bound holds per query. */
  def countMinOf(df: DataFrame, col: String, eps: Double,
                 confidence: Double, seed: Int = 42): CountMinSketch =
    df.stat.countMinSketch(col, eps, confidence, seed)
}

/** Per-JVM cache so the Bloom UDF deserializes once per executor,
  * not once per row. Keyed on the broadcast array identity. */
object BloomHolder {
  @transient private var cached: (AnyRef, BloomFilter) = null
  def get(bytes: Array[Byte]): BloomFilter = synchronized {
    if (cached == null || !(cached._1 eq bytes)) {
      cached = (bytes, BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
    }
    cached._2
  }
}
