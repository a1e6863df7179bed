package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): a
  * d×w counter matrix; each key increments one counter per row (chosen by
  * that row's hash), and a point estimate reads the MINIMUM of its d
  * counters — always an overestimate, within εN (ε ≈ e/w) with
  * probability 1−δ (δ ≈ e^−d).
  *
  * Why it belongs in a 100 TB engine next to HLL: merge is elementwise
  * ADDITION, so partial sketches combine exactly across partitions, days,
  * or clusters — frequency state for heavy-hitter queries in O(d·w)
  * memory regardless of key cardinality (HLL answers "how many distinct",
  * CMS answers "how often each"). Hashes are deterministic (seeded
  * murmur), so sketches are reproducible run to run. */
object CountMin {
  def index(s: String, row: Int, w: Int): Int =
    math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c + row * 0x61c88647), w)

  def estimate(sketch: Array[Long], d: Int, w: Int, s: String): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = sketch(i * w + index(s, i, w))
      if (c < best) best = c
      i += 1
    }
    best
  }
}

/** Typed Aggregator building the sketch distributedly: map-side partial
  * sketches merge by vector addition — the same partial/final shape as any
  * algebraic aggregate, shuffle volume O(d·w) per task, not O(rows). */
class CountMinAggregator(d: Int, w: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(b: Array[Long], s: String): Array[Long] = {
    var i = 0
    while (i < d) { b(i * w + CountMin.index(s, i, w)) += 1; i += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
