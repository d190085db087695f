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
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var cur = state.getOption.orNull
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      if (cur == null) cur = SessionState(t, t, 1)
      else if (t - cur.lastMs < gapMs) cur = cur.copy(lastMs = t, n = cur.n + 1)
      else { closed += Session(userId, cur.startMs, cur.lastMs, cur.n); cur = SessionState(t, t, 1) }
    }
    if (cur != null) {
      state.update(cur)
      state.setTimeoutTimestamp(cur.lastMs + gapMs)
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
      .foreachBatch { (batch: Dataset[Session], _: Long) =>
        batch.write.mode("append").parquet(outDir)
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
    events.toDF()
      .select($"user_id", (col("ts").cast("double") * 1000).cast("long").as("ms"))
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
