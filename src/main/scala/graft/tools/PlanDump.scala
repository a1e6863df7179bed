package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.{SparkEntry, Tables}

/** Dumps `.explain("formatted")` for named registered queries — the
  * optimization-round evidence trail (`plans/r<N>/<query>_{before,after}.txt`).
  * Usage: `runMain graft.tools.PlanDump <outDir> <suffix> <query...>`
  * (env SPARK_GRAFT_SF_DIR overrides the data dir; sf0.001 default keeps
  * the dump cheap — plan SHAPE is what the files witness, and it is
  * identical across data dirs for the same query).
  *
  * Session conf mirrors Bench (local[32], 32 shuffle partitions, AQE on)
  * so the dumped initial plan is the one the bench executes. Queries
  * whose result requires driver-side work before the final frame exists
  * (state ingest, artifact builds) pay that once here; the dump is the
  * FINAL returned frame's plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query...>")
    val outDir = args(0); val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Tables.withEventsConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        TempDirs.createFastForJvm("graft-warehouse")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    args.drop(2).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
