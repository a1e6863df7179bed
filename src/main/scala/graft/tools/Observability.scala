package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability surface (SURVEY §2.12): the reference logs wall-clock
  * timings and progress per stage (`flows/etl.py:137,175-176,269,285-286`);
  * the Spark-native equivalent is a QueryExecutionListener that records,
  * per completed action, the wall time and the physical plan's aggregated
  * SQL metrics (rows read, shuffle bytes, spill) — without touching any
  * query code. */
class MetricsCollector extends QueryExecutionListener {

  case class QueryMetrics(action: String, durationNs: Long,
                          rowsRead: Long, shuffleBytesWritten: Long,
                          sinkBytesWritten: Long,
                          diskSpillBytes: Long, failed: Boolean)

  private val buf = mutable.ArrayBuffer.empty[QueryMetrics]

  def all: Seq[QueryMetrics] = buf.synchronized(buf.toSeq)
  def clear(): Unit = buf.synchronized(buf.clear())

  /** Tree walk that sees through the adaptive-execution wrappers:
    * AdaptiveSparkPlanExec and QueryStageExec expose their actual subtree
    * via fields, not `children`, so a plain `plan.foreach` stops at them. */
  private def walk(p: org.apache.spark.sql.execution.SparkPlan)
                  (f: org.apache.spark.sql.execution.SparkPlan => Unit): Unit = {
    f(p)
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case o => o.children
    }
    kids.foreach(walk(_)(f))
  }

  private def collect(qe: QueryExecution, action: String, ns: Long,
                      failed: Boolean): Unit = {
    var rows = 0L; var shuffle = 0L; var sink = 0L; var spill = 0L
    walk(qe.executedPlan) { node =>
      node.metrics.foreach { case (name, m) =>
        name match {
          case "numOutputRows" if node.children.isEmpty &&
            node.nodeName.contains("Scan") => rows += m.value
          // shuffle and sink output are DIFFERENT claims: folding file/
          // JDBC writes into "shuffle" would inflate the slim-shuffle
          // evidence for write-heavy queries, so they are tracked apart
          case "shuffleBytesWritten"            => shuffle += m.value
          case "bytesWritten"                   => sink += m.value
          case "spillSize" | "diskBytesSpilled" => spill += m.value
          case _ =>
        }
      }
    }
    buf.synchronized(
      buf += QueryMetrics(action, ns, rows, shuffle, sink, spill, failed))
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit =
    collect(qe, funcName, durationNs, failed = false)

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit =
    collect(qe, funcName, 0L, failed = true)
}

object MetricsCollector {
  /** Attach a collector to the session; returns it for inspection. */
  def attach(spark: SparkSession): MetricsCollector = {
    val c = new MetricsCollector
    spark.listenerManager.register(c)
    c
  }
}
