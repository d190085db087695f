package graft.ops

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession

/** A stage materialized ONCE per (session, corpus dir) and shared by
  * every consumer — the memo device behind
  * [[graft.queries.NearDupStage]] (near-dup labels),
  * [[graft.queries.BpeStage]] (trained merge table),
  * [[graft.queries.ProbeStage]] (trained probe weights) and q104/
  * q108's shared quantizer: a production pipeline builds its index/
  * model state once and every reader consumes it, so query builders
  * must not re-run training per invocation.
  *
  * Contract (shared by all instances, stated once here):
  *   - staleness: data under `dir` is IMMUTABLE for the session's
  *     lifetime — corpus snapshots are addressed by path, a new
  *     snapshot is a new dir (which is also what makes the key sound
  *     at 100 TB);
  *   - eviction: entries whose session has been stopped are dropped
  *     on the next access, releasing the session reference;
  *   - `buildCount`/`reset` are spec hooks (N consumers, one build;
  *     test isolation).
  */
final class SessionStage[T](build: (SparkSession, String) => T) {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), T]
  private val builds = new AtomicInteger(0)

  def get(s: SparkSession, d: String): T = {
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    cache.getOrElseUpdate((s, d), {
      builds.incrementAndGet()
      build(s, d)
    })
  }

  /** How many times the stage actually built (spec hook). */
  def buildCount: Int = builds.get()

  /** Drop cached entries (test isolation). */
  def reset(): Unit = { cache.clear(); builds.set(0) }
}
