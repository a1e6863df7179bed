package graft.tools

/** In-process phase-timing collector for composite operators (k-means
  * fit/assign, IVF train/search). Operators record named phase durations;
  * Bench drains the accumulator after each query so regressions localize
  * to a phase instead of a whole composite query (VERDICT r2 item 8).
  * TrieMap because phases are recorded from the driver thread but Bench
  * may drain concurrently with streaming-query teardown threads. */
object PhaseTiming {
  private val acc = scala.collection.concurrent.TrieMap[String, Double]()

  def record(name: String, sec: Double): Unit = acc.put(name, sec)

  /** Returns all recorded phases and clears the accumulator. */
  def drain(): Map[String, Double] = {
    val m = acc.toMap
    m.keys.foreach(acc.remove)
    m
  }
}
