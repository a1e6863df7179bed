package graft

import graft.tools.MetricsCollector

class ObservabilitySpec extends SparkSpec {

  test("metrics collector records duration and scan rows per action") {
    val c = MetricsCollector.attach(spark)
    try {
      Tables.lineitem(spark, sf).count()
      // listener delivery is async; poll until the event arrives
      val deadline = System.nanoTime() + 30e9.toLong
      while (c.all.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val m = c.all
      assert(m.nonEmpty)
      val last = m.last
      assert(!last.failed && last.durationNs > 0)
      assert(last.rowsRead == 6005 || last.rowsRead > 0) // leaf scan rows
    } finally spark.listenerManager.unregister(c)
  }
}
