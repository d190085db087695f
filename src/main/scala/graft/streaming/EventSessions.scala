package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType
import java.sql.Timestamp

/** M4 stretch (SURVEY §7.2): gap-based session windows with CUSTOM
  * state via `flatMapGroupsWithState` — the Spark construct for
  * per-key state the built-in windowed aggregates can't express
  * (the reference has no analog; its only "state" is the checkpoint
  * counter, `run.py:56`).
  *
  * A session = consecutive events of one user with < `gap` between
  * neighbors. Sessions are emitted when CLOSED: either a new event
  * arrives past the gap, or the watermark passes last_ts + gap
  * (event-time timeout). Exactly-once across restarts via the
  * checkpoint dir.
  *
  * Ordering note: events are sorted by ts within each micro-batch;
  * cross-batch order is event-time order as long as source files
  * arrive in time order (the test harness's contract — true of the
  * reference's append-only shard layout too).
  */
object EventSessions {

  case class EventIn(user_id: Long, ts: Timestamp)
  case class SessionState(startMs: Long, lastMs: Long, n: Int)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

  def updateKey(gapMs: Long)(
      userId: Long, events: Iterator[EventIn],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.startMs, s.lastMs, s.n))
    }
    // flatMapGroupsWithState does NOT filter rows older than the
    // watermark — a straggler would regress lastMs (corrupting the
    // session end) and then setTimeoutTimestamp below the watermark
    // throws and kills the query. Drop them explicitly, the same
    // fate windowed aggregation gives late rows.
    val wm = state.getCurrentWatermarkMs()
    val sorted = events.toSeq.filter(_.ts.getTime >= wm).sortBy(_.ts.getTime)
    var cur = state.getOption.orNull
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      if (cur == null) cur = SessionState(t, t, 1)
      else if (t - cur.lastMs < gapMs)
        cur = cur.copy(lastMs = math.max(cur.lastMs, t), n = cur.n + 1)
      else { closed += Session(userId, cur.startMs, cur.lastMs, cur.n); cur = SessionState(t, t, 1) }
    }
    if (cur != null) {
      state.update(cur)
      // timeout must not be below the watermark even after drops
      state.setTimeoutTimestamp(math.max(cur.lastMs + gapMs, wm + 1))
    }
    closed.result().iterator
  }

  /** One checkpointed micro-batch run (Trigger.AvailableNow), same
    * resume semantics as [[EventWindows.runOnce]]. */
  def runOnce(spark: SparkSession, inDir: String, outDir: String,
              checkpointDir: String, schema: StructType,
              gapMs: Long = 3600000L, delay: String = "1 hour"): Unit = {
    import spark.implicits._
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .withWatermark("ts", delay)
      .select($"user_id", $"ts").as[EventIn]
    val sessions = stream
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateKey(gapMs))
    val q = sessions.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      // idempotent per-batchId sink — see EventWindows.runOnce
      .foreachBatch { (batch: Dataset[Session], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()
    q.awaitTermination()
  }

  /** Batch twin for differential testing: same session semantics
    * computed with sort + window (lag) + cumulative session ids —
    * pure DataFrame ops, usable as a DuckDB-oracle-style reference. */
  def sessionsBatch(events: Dataset[_], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ms")
    // unix_millis, NOT cast(double)*1000 — the float round-trip is
    // off by 1 ms for some fractional-second timestamps, which the
    // exact differential against the streaming path would catch.
    events.toDF()
      .select($"user_id", unix_millis(col("ts")).as("ms"))
      .withColumn("prev", lag($"ms", 1).over(w))
      .withColumn("newSess",
        when($"prev".isNull || $"ms" - $"prev" >= gapMs, 1).otherwise(0))
      .withColumn("sess_id", sum($"newSess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess_id")
      .agg(min($"ms").as("start_ms"), max($"ms").as("end_ms"),
        count(lit(1)).cast("int").as("n_events"))
      .select($"user_id", $"start_ms", $"end_ms", $"n_events")
      .as[Session]
  }
}
