package graft.tools

/** In-process counters for silent routing decisions (VERDICT r7 "next
  * round" #4): the n-gram-Jaccard block guard reroutes oversized blocks to
  * the minhash escape path and caps degenerate band buckets WITHOUT
  * changing the query's shape — the one place the engine can return fewer
  * rows than a naive oracle. These counters make that observable: the
  * operator records how many blocks were rerouted, how many documents they
  * held, and how many band buckets the skew cap dropped; Bench drains the
  * accumulator per query into `bench_full.json`'s `routing` map, so a
  * corpus that trips the guard shows up in the bench artifact, not only in
  * a Scaladoc caveat. Counters ADD (a query may build several guarded
  * frames), unlike PhaseTiming's last-write-wins timings. */
object RoutingMetrics {
  private val acc = scala.collection.concurrent.TrieMap[String, Long]()

  def add(name: String, n: Long): Unit =
    acc.updateWith(name) { prev => Some(prev.getOrElse(0L) + n) }

  /** Max-semantics counter for gauges where two calls between drains
    * must report the WORST value seen, not a meaningless sum. */
  def recordMax(name: String, n: Long): Unit =
    acc.updateWith(name) { prev => Some(math.max(prev.getOrElse(n), n)) }

  private val pairLock = new Object

  /** Records a COHERENT gauge group: if `gauge` beats its stored value,
    * the companion gauges are overwritten together with it — so a
    * derived ratio (sem_cluster_max vs sem_clusters) always comes from
    * ONE call, never a max-of-call-A paired with a count-of-call-B. */
  def recordWorstGroup(gauge: String, value: Long,
                       companions: (String, Long)*): Unit =
    pairLock.synchronized {
      if (value > acc.getOrElse(gauge, Long.MinValue)) {
        acc(gauge) = value
        companions.foreach { case (k, v) => acc(k) = v }
      }
    }

  /** Returns all recorded counters and clears them. Conditional remove
    * keeps a counter bumped concurrently between snapshot and sweep for
    * the next drain instead of dropping it (same contract as
    * PhaseTiming.drain). Takes `pairLock` so a drain cannot interleave
    * with a recordWorstGroup update and tear the gauge/companion group
    * apart (gauge from one call, companions from another, or split
    * across two drains). */
  def drain(): Map[String, Long] = pairLock.synchronized {
    val m = acc.toMap
    m.foreach { case (k, v) => acc.remove(k, v) }
    m
  }
}
