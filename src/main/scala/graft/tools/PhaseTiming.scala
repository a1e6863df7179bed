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

  /** Returns all recorded phases and clears them. Conditional remove(k, v)
    * only deletes the exact snapshot value — a phase recorded concurrently
    * between the snapshot and the sweep survives to the next drain instead
    * of vanishing unreported. */
  def drain(): Map[String, Double] = {
    val m = acc.toMap
    m.foreach { case (k, v) => acc.remove(k, v) }
    m
  }
}
