package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Whole-operator custom Catalyst extension (SURVEY §7.2 tier (c)): a
  * native as-of join — LogicalPlan node, SparkStrategy, and a physical
  * BinaryExecNode whose per-partition streaming merge implements the
  * operator directly.
  *
  * Contract (fixed by the `AsOf.join` API below): left child emits
  * `(key: long, t: timestamp, left_id: long)` event rows, right child
  * emits `(key: long, t: timestamp, right_id: long)` reference rows; the
  * output is `(left_id, key, asof_right_id)` where asof_right_id is the
  * right_id with the greatest `t` ≤ the event's `t` for the same key
  * (ties on t broken by max right_id), or null.
  *
  * Why a custom operator here and composition elsewhere: the composed
  * form (q34, tagged-union + running last window) materializes the union
  * and windows over it; the native physical plan declares
  * `requiredChildDistribution`/`requiredChildOrdering`, so Catalyst
  * inserts exactly one hash exchange + sort per side, and the merge runs
  * in a single streaming pass per partition holding O(1) state — the plan
  * a purpose-built engine would produce. Both forms are checked against
  * the same DuckDB oracle.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    override val output: Seq[Attribute] = AsOfJoin.freshOutput())
    extends BinaryNode {
  require(left.output.length == 3 && right.output.length == 3,
    "AsOfJoin children must emit exactly (key, t, id)")

  /** The operator reads every child column positionally — without this,
    * ColumnPruning sees no expression references and prunes the children
    * to empty projects. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Output attrs live in the constructor so `copy()` during tree
    * transforms keeps the expression IDs the parent plan references. */
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("left_id", LongType, nullable = false)(),
    AttributeReference("key", LongType, nullable = false)(),
    AttributeReference("asof_right_id", LongType, nullable = true)())
}

/** Plans the logical AsOfJoin to its physical operator. Installed via
  * `spark.experimental.extraStrategies` (public API, per-session). */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right), j.output) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        output: Seq[Attribute]) extends BinaryExecNode {

  /** Both sides cluster on the key → Catalyst inserts co-partitioned
    * hash exchanges; within partitions both sort by (key, t, id) so the
    * merge below sees "latest row ≤ t" as simply the last advanced row. */
  override def requiredChildDistribution: Seq[Distribution] = {
    // pin the partition count so AQE cannot coalesce the two sides
    // differently (zipPartitions needs equal, co-partitioned sides)
    val n = Some(conf.numShufflePartitions)
    Seq(ClusteredDistribution(Seq(left.output.head), requiredNumPartitions = n),
      ClusteredDistribution(Seq(right.output.head), requiredNumPartitions = n))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    left.output.map(a => SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending)),
    right.output.map(a => SortOrder(a, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    left.execute().zipPartitions(right.execute()) { (events, refs) =>
      new Iterator[InternalRow] {
        // downstream operators expect UnsafeRow
        private val toUnsafe = org.apache.spark.sql.catalyst.expressions
          .UnsafeProjection.create(output.map(_.dataType).toArray)
        private val refIter = refs.buffered
        private var curKey = 0L
        private var haveMatch = false
        private var lastId = 0L

        override def hasNext: Boolean = events.hasNext

        override def next(): InternalRow = {
          val e = events.next()
          val key = e.getLong(0)
          val t = e.getLong(1) // timestamp = internal micros
          val leftId = e.getLong(2)
          // new key group on the left: drop matches from previous keys
          if (key != curKey) { haveMatch = false; curKey = key }
          // advance the reference side through all rows with
          // (rKey < key) or (rKey == key && rT <= t); the last one at the
          // current key is the as-of match (max t, then max id — the sort
          // order guarantees it)
          var continue = true
          while (continue && refIter.hasNext) {
            val r = refIter.head
            val rKey = r.getLong(0)
            if (rKey < key || (rKey == key && r.getLong(1) <= t)) {
              if (rKey == key) { haveMatch = true; lastId = r.getLong(2) }
              refIter.next()
            } else continue = false
          }
          val out = new GenericInternalRow(3)
          out.setLong(0, leftId)
          out.setLong(1, key)
          if (haveMatch) out.setLong(2, lastId) else out.setNullAt(2)
          toUnsafe(out)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-facing API. */
object AsOf {
  /** As-of join `events` (key, eventTime, eventId) against `refs`
    * (key, refTime, refId); returns (left_id, key, asof_right_id). */
  def join(spark: SparkSession, events: DataFrame, refs: DataFrame): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    org.apache.spark.sql.graft.GraftShim.ofRows(spark,
      AsOfJoin(
        org.apache.spark.sql.graft.GraftShim.logicalPlan(events),
        org.apache.spark.sql.graft.GraftShim.logicalPlan(refs)))
  }
}
