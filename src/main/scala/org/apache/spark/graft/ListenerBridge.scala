package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener bus — lets measurement code
  * drain pending listener events before reading task-metric
  * accumulations (same pattern as sql.graft.PlanBridge: access only,
  * no logic). */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
