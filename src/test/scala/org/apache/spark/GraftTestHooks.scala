package org.apache.spark

/** Test-only accessor for `private[spark]` listener internals: a spec
  * that reads task metrics from a SparkListener must drain the async
  * listener bus before asserting (the standard technique Spark's own
  * test suites use via this same call). */
object GraftTestHooks {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
