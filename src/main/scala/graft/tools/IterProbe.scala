package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Per-iteration timing probe for individual registered queries — the
  * cold-vs-warm A/B behind Bench's warm-up policy: run each named query
  * three times in one fresh JVM with NO tiny-SF warm-up and print every
  * iteration. r18 quiet-window measurement (sf0.1, local[32]):
  * `q96_partitioned_upsert` 26.5 / 12.9 / 11.5 s,
  * `text_url_dedup_stream` 6.8 / 4.5 / 4.3 s — the state-replay family's
  * first iteration pays one-time Janino compilation of the per-epoch
  * foreachBatch plan shapes (2.3–2.9× the warm min), which is exactly
  * what Bench's sf0.001 warm-up absorbs. Usage:
  * `runMain graft.tools.IterProbe <queryName> [more names]`
  * (env SPARK_GRAFT_SF_DIR overrides the data dir). */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[iterprobe] $name iter$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
