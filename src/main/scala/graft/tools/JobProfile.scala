package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB breakdown of a registered query: one line per Spark job with
  * wall duration, task count, and the first line of its call site — the
  * evidence that tells a dispatch-floored query (many tiny jobs) from a
  * compute-bound one (few big jobs), which per-query wall timing cannot.
  * Usage: `runMain graft.tools.JobProfile <query> [iters]`
  * (env SPARK_GRAFT_SF_DIR overrides the data dir; the LAST iteration's
  * jobs are printed, so artifact/state builds on iter 1 drop out). */
object JobProfile {
  private case class Job(id: Int, var started: Long = 0L, var ended: Long = 0L,
                         var tasks: Int = 0, var stages: Int = 0,
                         var site: String = "")

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Tables.withEventsConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        TempDirs.createFastForJvm("graft-warehouse")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (record) {
        val j = Job(e.jobId, started = e.time)
        j.site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          .orElse(e.stageInfos.lastOption.map(_.name.take(80)))
          .getOrElse("")
        // planned task count from the job's own stage infos — correct
        // even when several jobs run concurrently (q97's arms)
        j.tasks = e.stageInfos.map(_.numTasks).sum
        j.stages = e.stageInfos.size
        jobs.put(e.jobId, j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.ended = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to iters) {
      if (i == iters) { jobs.clear(); record = true }
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).count()
      println(f"[jobprof] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
    }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    val all = jobs.values().toArray(Array.empty[Job]).sortBy(_.id)
    println(f"[jobprof] ${all.length} jobs in final iteration:")
    var total = 0L
    all.foreach { j =>
      val ms = if (j.ended > 0) j.ended - j.started else -1L
      if (ms > 0) total += ms
      println(f"[jobprof] job ${j.id}%4d ${ms}%6d ms ${j.stages}%2d stages ${j.tasks}%4d tasks  ${j.site}")
    }
    println(f"[jobprof] sum of job walls: $total ms")
    spark.stop()
  }
}
