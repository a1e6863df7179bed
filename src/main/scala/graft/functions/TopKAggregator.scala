package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored item flowing into the top-k aggregation. */
case class Scored(n_id: Long, cos: Double)

/** Typed top-k-by-score Aggregator (SURVEY §7.2): keeps a bounded,
  * sorted buffer of the k best (cos desc, n_id asc) items.
  *
  * Why this beats rank-over-window for per-group top-k at scale: the
  * window plan shuffles and sorts EVERY scored row on the group key; the
  * Aggregator partial-aggregates map-side, so each map task ships at most
  * k rows per group — shuffle volume O(groups·k), independent of corpus
  * size. The buffer is a plain Seq (encoder-friendly); k is small, so
  * insertion keeps it sorted at negligible cost. */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.n_id < b.n_id)

  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
    val (front, back) = buf.span(better(_, x))
    val merged = (front :+ x) ++ back
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.length == k && better(buf.last, x)) buf else insert(buf, x)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Untyped-DataFrame adapter: `topkUdaf(5)(col("n_id"), col("cos"))`. */
  def topkUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k), Encoders.product[Scored])
}
