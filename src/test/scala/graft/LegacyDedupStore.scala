package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Simulated PRE-WIDENING dedup index fixture (the layout r18
  * replaced: a single ~2³⁰-range `fp` column instead of the 128-bit
  * (fp_hi, fp_lo) pair) — the store an operator who built their
  * index before the widening still has on disk. Shared by
  * DedupIndexSpec's migration scenario and OperationsDaySpec's
  * rebuild-after-refusal story (r18 verdict #3/#6).
  */
object LegacyDedupStore {

  /** Write `docs` (doc_id, text) as an old-layout index under `dir`:
    * fingerprints carry (doc_id, fp, fp_len) with fp = the classic
    * TextPolyHash (base 31 mod 1e9+7 — exactly the key the widening
    * replaced, which is what lets the fp_hi-hook agreement check
    * compare old vs new); shingles match the current kernel (the
    * shingle chain never changed across the widening); bands are
    * schema-only — every operator path refuses off the fingerprint
    * layout before any band is read. */
  def write(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    val d = docs.select(col("doc_id"),
      graft.ops.TextOps.fingerprint(col("text")).as("fp"),
      octet_length(col("text")).as("fp_len"),
      graft.ops.expressions.ShingleHashes(col("text"), 3).as("hs"))
    d.select("doc_id", "fp", "fp_len")
      .write.mode("overwrite").parquet(s"$dir/fingerprints/run=base")
    d.select("doc_id", "hs")
      .write.mode("overwrite").parquet(s"$dir/shingles/run=base")
    d.select(lit(0L).as("band_idx"), lit(0L).as("band_hash"),
        col("doc_id")).limit(0)
      .write.mode("overwrite").parquet(s"$dir/bands/run=base")
  }
}
