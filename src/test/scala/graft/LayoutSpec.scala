package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Z-order clustering semantics + the pruning property it exists for. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits (hand-checked Morton codes)") {
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 5))
      .toDF("x", "y")
    val got = df.select(Layout.zvalue(col("x"), col("y"))).as[Long].collect()
    // morton(x,y): x bits at even positions, y bits at odd
    assert(got.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 8L, 0x27L))
    // 3=0b11, 5=0b101 -> x bits at 0,2; y bits at 1,5 -> 0b100111 = 0x27
  }

  test("z-sorted files contract BOTH dimensions' spans; linear sort only one") {
    // controlled 256×256 grid — equal bit widths, the precondition z-order
    // needs (production normalizes each dimension to a rank first)
    val nFiles = 8
    val grid = spark.range(256L * 256L)
      .select((col("id") % 256).cast("int").as("x"),
        (col("id") / 256).cast("int").as("y"))
    def spans(sorted: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
      sorted.write.mode("overwrite").parquet(dir)
      val per = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
        .agg(avg("xs"), avg("ys")).collect().head
      graft.tools.TempDirs.deleteRecursively(dir)
      (per.getDouble(0), per.getDouble(1))
    }
    val z = grid.withColumn("z", Layout.zvalue(col("x"), col("y")))
      .repartitionByRange(nFiles, col("z")).sortWithinPartitions("z").drop("z")
    val (zx, zy) = spans(z)
    // both dimensions localize under z-order (top z bits split x AND y)
    assert(zx < 255 * 0.7, s"x span $zx should contract under z-order")
    assert(zy < 255 * 0.7, s"y span $zy should contract under z-order")

    val lin = grid.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
    val (lx, ly) = spans(lin)
    // linear sort localizes its own column but NOT the other one
    assert(lx < 255 * 0.3)
    assert(ly > 255 * 0.7, s"linear sort should not localize y (got $ly)")
  }

  test("compaction preserves content and actually reduces the file count") {
    val out = Layout.compaction(spark, sf).collect()
    val src = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.toSeq).toSeq == src.map(_.toSeq).toSeq)
    // the compacted layout must land far below the 64-way fragmentation
    // (size-targeted: a handful of files for the sf0.001 table)
    val base = graft.tools.TempDirs.createFast("graft-compact-count")
    try {
      Tables.documents(spark, sf).repartition(64)
        .write.mode("overwrite").parquet(s"$base/small")
      val nSmall = new java.io.File(s"$base/small").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(nSmall > 32, "fragmentation premise")
      val totalBytes = new java.io.File(s"$base/small").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      val nTarget = math.max(1, math.ceil(totalBytes / (256.0 * 1024)).toInt)
      assert(nTarget < nSmall / 4, "compaction target must collapse the layout")
    } finally graft.tools.TempDirs.deleteRecursively(base)
  }

  test("incremental aggregate merge equals recompute from scratch") {
    val merged = graft.ops.Analytics.incrementalAgg(spark, sf)
      .collect().map(_.toSeq)
    val scratch = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
      .withColumn("avg_qty", col("sum_qty") / col("n"))
      .orderBy(col("l_returnflag")).collect().map(_.toSeq)
    assert(merged.toSeq == scratch.toSeq)
  }
}
