package org.apache.spark.graftx

import org.apache.spark.SparkContext

/** `listenerBus.waitUntilEmpty()` is private[spark]; measurement tools
  * (NearDupProbe bytes mode) need it to read QueryExecutionListener
  * accumulations deterministically instead of sleeping and hoping the
  * async bus drained. Hosted in an org.apache.spark subpackage like
  * Bridge.scala's Column↔Expression shim. */
object Listeners {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
