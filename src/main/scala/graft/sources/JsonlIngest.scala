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
  * ONE parser-channel definition ([[jsonChannel]]/[[csvChannel]]):
  * a raw-lines frame in, (typed good rows, quarantine lines) out.
  * The batch readers here and the streaming twin
  * ([[graft.streaming.JsonlIngestStream]]) both run it, so batch
  * and streamed ingest of the same delivery are the same parse by
  * construction, not by convention. Records are line-scoped (no
  * multiline JSON or quoted-newline CSV) — the line IS the unit of
  * quarantine.
  *
  * Scale shape: TWO scans, NO corpus cache. The quarantine side is
  * written eagerly; the good side is a second lazy pass over the
  * same lines. The obvious one-scan alternative caches the ENTIRE
  * typed delivery just to legalize the corrupt-only projection — at
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

  /** The JSONL parser channel over a raw-lines frame (column
    * `value`): (typed good rows, quarantine lines). Blank lines are
    * layout, not data — neither typed nor quarantined (the file
    * readers' own ignore-empty posture). */
  private[graft] def jsonChannel(lines: DataFrame,
                                 schema: StructType): (DataFrame, DataFrame) = {
    val wc = withCorrupt(schema)
    val parsed = lines.filter(length(col("value")) > 0)
      .select(col("value"), from_json(col("value"), wc, ParseOpts).as("r"))
    split2(parsed, schema)
  }

  /** The CSV twin of [[jsonChannel]] — same channel contract. CSV
    * drops additionally tear by losing quoting or type-mangling a
    * field; the quarantine preserves the unparsed line the same way.
    *
    * Header contract (`header = true`): a line is a header iff its
    * COMMA-SPLIT TOKENS — trimmed, unquoted, lower-cased — equal the
    * declared field names in order. The predicate applies to EVERY
    * line (there is no per-file "first line" in a line channel),
    * which fixes the two failure modes of byte-equality + the csv
    * reader's skip-first-line: a header that varies in spacing/
    * quoting/case no longer quarantines a spurious 'corrupt' row,
    * and a file that LACKS a header no longer silently loses its
    * first data line to the reader's positional skip. Out-of-contract
    * deliveries stay VISIBLE, not silent: a reordered or renamed
    * header line fails the predicate and lands in quarantine for the
    * operator to inspect (column order is positional against
    * `schema` — no reader can detect reordered DATA).
    *
    * Collision corner (all-string schemas): a legitimate DATA row
    * whose tokens equal the field names also satisfies the
    * predicate. A line channel has no line numbers to tell it from
    * the real header, so the channel consumes exactly ONE
    * header-matching line per file as the header (deterministically:
    * the raw-min, with ties identical) — which may be a colliding
    * DATA row rather than the real header. In a COLLIDED file (≥2
    * matches) the channel therefore quarantines a copy of EVERY
    * header-equivalent line, including the consumed one, so no
    * collided row's bytes vanish whichever line was really the
    * header (round-14 advisor: previously the consumed line's bytes
    * were lost when it was a data row). A well-formed delivery has
    * exactly one match per file and quarantines nothing. */
  private[graft] def csvChannel(lines: DataFrame, schema: StructType,
                                header: Boolean): (DataFrame, DataFrame) = {
    val wc = withCorrupt(schema)
    val isHeader =
      transform(split(col("value"), ","),
        t => lower(regexp_replace(trim(t), "^\"|\"$", ""))) ===
        array(schema.fieldNames.map(f => lit(f.toLowerCase)): _*)
    val body = lines.filter(length(col("value")) > 0)
    val parsed = (if (header) body.filter(!isHeader) else body)
      .select(col("value"), from_csv(col("value"), wc, ParseOpts).as("r"))
    val (good, bad) = split2(parsed, schema)
    if (!header) (good, bad)
    else {
      // header-matching lines in COLLIDED files (≥2 matches): all of
      // them — including a copy of the consumed raw-min — go to the
      // repair queue. O(headers) rows reach the window (the filter
      // precedes it), so the per-file count is bounded by the
      // collision count, not the file
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__f"))
      val collided = body.filter(isHeader)
        .withColumn("__f", input_file_name())
        .withColumn("__n", count(lit(1)).over(w))
        .filter(col("__n") > 1).select(col("value"))
      (good, bad.union(collided))
    }
  }

  private def split2(parsed: DataFrame,
                     schema: StructType): (DataFrame, DataFrame) =
    (parsed.filter(col("r").getField(CorruptCol).isNull)
       .select(schema.fieldNames.toSeq
         .map(f => col("r").getField(f).as(f)): _*),
     parsed.filter(col("r").getField(CorruptCol).isNotNull)
       .select(col("value")))

  /** Read `path` as JSON-lines against `schema`; malformed lines
    * land verbatim under `quarantineDir/run=<runId>` (column
    * `raw_line`, written EAGERLY so the quarantine exists even if
    * the caller never consumes the good side); returns the typed
    * good rows. */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType, quarantineDir: String,
                         runId: String): DataFrame = {
    val (good, bad) = jsonChannel(spark.read.text(path), schema)
    writeQuarantine(bad, quarantineDir, runId)
    good
  }

  /** The CSV twin — same parser channel, same store discipline (see
    * [[csvChannel]] for the header contract). */
  def readCsvWithQuarantine(spark: SparkSession, path: String,
                            schema: StructType, quarantineDir: String,
                            runId: String, header: Boolean = true): DataFrame = {
    val (good, bad) = csvChannel(spark.read.text(path), schema, header)
    writeQuarantine(bad, quarantineDir, runId)
    good
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

  private[graft] def writeQuarantine(badLines: DataFrame, quarantineDir: String,
                                     runId: String): Unit =
    badLines.select(col("value").as("raw_line"))
      .write.mode("overwrite").parquet(s"$quarantineDir/run=$runId")
}
