package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-checked loaders for the driver testdata tables
  * (see FIXTURES.md §B). Every query receives `sfDir` and loads
  * through here so column pruning / predicate pushdown reach the
  * parquet scan (lazy `spark.read.parquet`, never a full
  * materialize — contrast reference `run.py:20-21` which loads the
  * whole file into memory).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts arrives in two physical layouts across driver data
    * generations, so dispatch on the ACTUAL scanned type:
    *  - TIMESTAMP(NANOS): Spark 4 rejects it ([PARQUET_TYPE_ILLEGAL])
    *    unless `spark.sql.legacy.parquet.nanosAsLong=true` (Verify /
    *    Bench / TestSpark all set it; a table accessor must not
    *    mutate session conf as a side effect). Read nanos as long
    *    and convert with INTEGER division — ns epoch values (~1.7e18)
    *    exceed double's 2^53 integer precision, so a float path
    *    would corrupt timestamps.
    *  - TIMESTAMP(MICROS) without UTC adjustment: scans as
    *    TIMESTAMP_NTZ; cast to session-TZ TIMESTAMP (sessions pin
    *    UTC) so downstream queries see the same LTZ column either
    *    way and written output stays TIMESTAMP_MICROS-comparable
    *    with the DuckDB oracle's naive read. */
  def events(s: SparkSession, d: String): DataFrame = {
    // Blanket layout-portability precondition: only the NANOS layout
    // needs the flag, but it is demanded always so a session that
    // works on one data generation works on both.
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must set spark.sql.legacy.parquet.nanosAsLong=true to read events " +
        "(needed only by the TIMESTAMP(NANOS) layout, required blanket for portability)")
    // The NTZ->LTZ cast below is only identity-preserving when the
    // session zone is UTC; any other zone silently shifts MICROS
    // timestamps while the NANOS path stays correct.
    require(s.conf.get("spark.sql.session.timeZone") == "UTC",
      "session must pin spark.sql.session.timeZone=UTC to read events " +
        "(the TIMESTAMP_NTZ->TIMESTAMP cast shifts values under any other zone)")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      // already session-TZ-adjusted MICROS — nothing to normalize
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts scanned as unexpected type $other — expected TIMESTAMP(NANOS) " +
          "(long via nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
