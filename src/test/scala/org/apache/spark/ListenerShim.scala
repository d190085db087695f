package org.apache.spark

/** Test-only shim: SparkListener events are delivered async; specs
  * that assert on task metrics must drain the bus before reading
  * (listenerBus is private[spark], same access pattern as the main
  * sources' sql graftshim). */
object ListenerShim {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
