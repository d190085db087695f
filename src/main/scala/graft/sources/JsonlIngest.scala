package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines crawl ingest with corrupt-line QUARANTINE — the
  * production posture for EXTERNAL drops, complementing the two
  * existing stances: [[graft.pipeline.CurationExport.readBack]] is
  * FAILFAST because the engine's own artifacts must be pristine
  * (silent widening there would hide a writer bug), and q84
  * quarantines malformed JSON VALUES inside a column. A 100 TB
  * crawl delivery is neither: a handful of torn lines must not kill
  * the job (FAILFAST) or silently vanish (DROPMALFORMED) — they
  * land in a quarantine store, raw bytes preserved verbatim for
  * repair and re-ingest, while the good rows flow on typed.
  *
  * Scale shape: one PERMISSIVE pass; the corrupt-record column is
  * populated per-line by the parser itself (no second scan to find
  * bad lines); quarantined lines write keyed `run=<runId>` so
  * at-least-once re-delivery replaces its own quarantine partition
  * (the store family's delivery discipline). The source frame is
  * cached for its two consumers (good filter + quarantine filter —
  * Spark additionally disallows a lazy scan whose projection is
  * ONLY the internal corrupt column, so the cache is load-bearing,
  * not just a CSE fix); lifecycle is the caller's clearCache
  * contract, as with every multi-consumer stage in the engine.
  */
object JsonlIngest {

  private val CorruptCol = "_corrupt_record"

  /** Read `path` as JSON-lines against `schema`; malformed lines
    * land verbatim under `quarantineDir/run=<runId>` (column
    * `raw_line`, written EAGERLY so the quarantine exists even if
    * the caller never consumes the good side); returns the typed
    * good rows with the corrupt column dropped. */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType, quarantineDir: String,
                         runId: String): DataFrame =
    quarantined(spark, path, schema, quarantineDir, runId,
      r => r.json(path))

  /** The CSV twin — same parser channel
    * (`columnNameOfCorruptRecord`), same store discipline. CSV
    * drops additionally tear by losing quoting, so the quarantine
    * preserves the unparsed line the same way. */
  def readCsvWithQuarantine(spark: SparkSession, path: String,
                            schema: StructType, quarantineDir: String,
                            runId: String, header: Boolean = true): DataFrame =
    quarantined(spark, path, schema, quarantineDir, runId,
      r => r.option("header", header.toString).csv(path))

  private def quarantined(spark: SparkSession, path: String,
                          schema: StructType, quarantineDir: String,
                          runId: String,
                          load: org.apache.spark.sql.DataFrameReader => DataFrame)
      : DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — it is the parser's channel")
    val raw = load(spark.read
        .schema(schema.add(CorruptCol, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol))
      .cache()
    raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
      .write.mode("overwrite").parquet(s"$quarantineDir/run=$runId")
    raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
  }

  /** The quarantined raw lines across every absorbed run — the
    * repair queue. */
  def quarantined(spark: SparkSession, quarantineDir: String): DataFrame =
    spark.read.parquet(quarantineDir).select(col("raw_line"))
}
