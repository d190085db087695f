package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines / CSV crawl ingest with corrupt-line QUARANTINE — the
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
  * Scale shape: TWO scans, NO corpus cache. The good side is one
  * PERMISSIVE typed read filtered on the parser's own
  * corrupt-record channel; the quarantine side is a raw text scan
  * probed by the same parser (`from_json`/`from_csv` with the same
  * PERMISSIVE options — one parser definition, two plans). The
  * obvious one-scan alternative caches the ENTIRE typed delivery
  * just to legalize the corrupt-only projection (Spark disallows a
  * lazy scan projecting only the internal corrupt column) — at
  * crawl scale that pulls the full corpus through the block manager
  * before the first good row is consumed; a second file scan is the
  * cheaper trade and leaves no cache-lifecycle obligation.
  * Quarantined lines write keyed `run=<runId>` so at-least-once
  * re-delivery replaces its own quarantine partition (the store
  * family's delivery discipline).
  */
object JsonlIngest {

  private val CorruptCol = "_corrupt_record"

  private val ParseOpts =
    Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)

  /** Read `path` as JSON-lines against `schema`; malformed lines
    * land verbatim under `quarantineDir/run=<runId>` (column
    * `raw_line`, written EAGERLY so the quarantine exists even if
    * the caller never consumes the good side); returns the typed
    * good rows. */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType, quarantineDir: String,
                         runId: String): DataFrame = {
    val wc = withCorrupt(schema)
    writeQuarantine(
      spark.read.text(path)
        .filter(from_json(col("value"), wc, ParseOpts)
          .getField(CorruptCol).isNotNull),
      quarantineDir, runId)
    spark.read.schema(wc).options(ParseOpts).json(path)
      .filter(col(CorruptCol).isNull).drop(CorruptCol)
  }

  /** The CSV twin — same parser channel, same store discipline. CSV
    * drops additionally tear by losing quoting or type-mangling a
    * field; the quarantine preserves the unparsed line the same
    * way. With `header = true` the text-side probe skips lines
    * equal to the schema's plain header rendering
    * (`f1,f2,...` — the form this engine's own CSV writes emit). */
  def readCsvWithQuarantine(spark: SparkSession, path: String,
                            schema: StructType, quarantineDir: String,
                            runId: String, header: Boolean = true): DataFrame = {
    val wc = withCorrupt(schema)
    val headerLine = schema.fieldNames.mkString(",")
    val raw = spark.read.text(path)
    val probed = (if (header) raw.filter(col("value") =!= headerLine) else raw)
      .filter(from_csv(col("value"), wc, ParseOpts)
        .getField(CorruptCol).isNotNull)
    writeQuarantine(probed, quarantineDir, runId)
    spark.read.schema(wc).options(ParseOpts)
      .option("header", header.toString).csv(path)
      .filter(col(CorruptCol).isNull).drop(CorruptCol)
  }

  /** The quarantined raw lines across every absorbed run, with the
    * delivery they came from (run, raw_line) — the repair queue;
    * empty or in-flight store reads empty, not a crash
    * (StoreCompaction.hasParquetData, the delta stores' probe). */
  def quarantined(spark: SparkSession, quarantineDir: String): DataFrame =
    if (!graft.ops.StoreCompaction.hasParquetData(spark, quarantineDir))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL("run STRING, raw_line STRING"))
    else spark.read.parquet(quarantineDir)
      .select(col("run").cast("string").as("run"), col("raw_line"))

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — it is the parser's channel")
    schema.add(CorruptCol, StringType)
  }

  private def writeQuarantine(badLines: DataFrame, quarantineDir: String,
                              runId: String): Unit =
    badLines.select(col("value").as("raw_line"))
      .write.mode("overwrite").parquet(s"$quarantineDir/run=$runId")
}
