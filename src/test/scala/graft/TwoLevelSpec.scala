package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Corpus, TwoLevel}

/** The two-level bucketed prefix-sum form must be BIT-IDENTICAL to the
  * naive `Window.partitionBy(stratum)` form it replaces — same oracle,
  * same hashes; only the plan changes. Each corpus operator is compared
  * against its naive-window re-statement on a corpus with a DOMINANT
  * stratum (the skew the two-level form exists for — the uniform driver
  * fixture alone would not exercise bucket-offset merging under
  * dominance), and the helper is exercised directly. */
class TwoLevelSpec extends SparkSpec {
  import spark.implicits._

  /** 400 docs, 82% in one language / one source (the dominant-stratum
    * shape); ids deliberately sparse + shuffled mod ordering so id-range
    * buckets are non-trivial. */
  private lazy val skewDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-twolevel").toString
    val rows = (0 until 400).map { i =>
      val lang = if (i % 100 < 82) "en" else Seq("de", "fr", "zh")(i % 3)
      val src = if (i % 100 < 82) "crawl" else s"s${i % 3}"
      val n = 3 + (i * 7) % 40
      val text = Seq.tabulate(n)(j => s"w${(i * 31 + j * 13) % 97}").mkString(" ")
      ((i * 37L) % 1009L + 1000L * (i % 3), text, lang, src, text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) ===
      b.schema.map(f => (f.name, f.dataType)))
    val (ra, rb) = (a.collect(), b.collect())
    assert(ra.length === rb.length)
    ra.zip(rb).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x === y, s"row $i differs")
    }
  }

  test("cumBefore == naive per-stratum window on a dominant-stratum frame") {
    val d = spark.read.parquet(s"$skewDir/documents.parquet")
      .select(col("lang"), col("doc_id"),
        (col("n_chars") % 17).cast("long").as("v"))
    val naive = d.withColumn("cum", coalesce(
      sum(col("v")).over(Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy(col("lang"), col("doc_id"))
      .select(col("lang"), col("doc_id"), col("v"), col("cum"))
    val two = TwoLevel.cumBefore(
        TwoLevel.withMd5Bucket(d, col("doc_id").cast("string"), "__o", "__b"),
        Seq("lang"), "__b", Seq(col("__o"), col("doc_id")), "v", "cum")
      .orderBy(col("lang"), col("doc_id"))
      .select(col("lang"), col("doc_id"), col("v"), col("cum"))
    sameRows(two, naive)
  }

  test("rank + stratum total == row_number + count-over-partition") {
    val d = spark.read.parquet(s"$skewDir/documents.parquet")
      .select(col("lang"), col("doc_id"))
    val naive = d
      .withColumn("rk", row_number().over(Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .orderBy(col("lang"), col("doc_id"))
      .select(col("lang"), col("doc_id"), col("rk"), col("n"))
    val two = TwoLevel.rank(
        TwoLevel.withMd5Bucket(d, col("doc_id").cast("string"), "__o", "__b"),
        Seq("lang"), "__b", Seq(col("__o"), col("doc_id")), "rk",
        stratumTotalOut = Some("n"))
      .orderBy(col("lang"), col("doc_id"))
      .select(col("lang"), col("doc_id"), col("rk"), col("n"))
    sameRows(two, naive)
  }

  test("withIdRangeBucket: order-aligned, bounded, covers all rows") {
    val d = spark.read.parquet(s"$skewDir/documents.parquet")
      .select(col("source"), col("doc_id"))
    val b = TwoLevel.withIdRangeBucket(d, "source", "doc_id", "__b")
    assert(b.count() === d.count())
    // bounded cardinality per stratum
    val perStratum = b.groupBy("source").agg(countDistinct(col("__b")).as("nb"))
      .collect().map(_.getLong(1))
    assert(perStratum.forall(_ <= TwoLevel.IdBuckets))
    // order-aligned: within a stratum, id order implies bucket order
    val rows = b.orderBy(col("source"), col("doc_id"))
      .select(col("source"), col("doc_id"), col("__b")).collect()
    rows.sliding(2).foreach {
      case Array(p, q) if p.getString(0) == q.getString(0) =>
        assert(p.getLong(2) <= q.getLong(2),
          s"bucket order violates id order at ${q.get(1)}")
      case _ =>
    }
  }

  // --- operator-level equivalence on the dominant-stratum corpus ------

  test("packSequences == naive window form") {
    val d = Tables.documents(spark, skewDir)
      .select(col("source"), col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = d
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_first", expr("cum_before div 64"))
      .withColumn("seq_offset", expr("cum_before % 64"))
      .withColumn("n_seqs",
        expr("(cum_before + n_tokens - 1) div 64") - col("seq_first") + lit(1L))
      .orderBy(col("source"), col("doc_id"))
    sameRows(Corpus.packSequences(spark, skewDir), naive)
  }

  test("budgetSelect == naive window form") {
    val d = Tables.documents(spark, skewDir)
      .select(col("source"), col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = d
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") < 300L)
      .orderBy(col("source"), col("doc_id"))
    sameRows(Corpus.budgetSelect(spark, skewDir), naive)
  }

  test("balanceByLang == naive window form") {
    val naive = Tables.documents(spark, skewDir)
      .select(col("lang"), col("doc_id"))
      .withColumn("rk", row_number().over(Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("rk") <= 40)
      .orderBy(col("lang"), col("rk"))
    sameRows(Corpus.balanceByLang(spark, skewDir), naive)
  }

  test("splitTrainValTest == naive window form") {
    val naive = Tables.documents(spark, skewDir)
      .select(col("lang"), col("doc_id"))
      .withColumn("rk", row_number().over(Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("split",
        when(col("rk") * 100 <= col("n") * 80, lit("train"))
          .when(col("rk") * 100 <= col("n") * 90, lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy(col("doc_id"))
    sameRows(Corpus.splitTrainValTest(spark, skewDir), naive)
  }

  test("mixWeights cum_before == naive window form") {
    // Compare just the prefix-sum column (the weights join above it is
    // untouched by the rewrite); the skew corpus lacks 'es', which the
    // weight table would drop — compare on the window input frame.
    val d = Tables.documents(spark, skewDir)
      .select(col("lang"), col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long").as("n_tokens"))
    val naive = d.withColumn("cum_before", coalesce(
      sum(col("n_tokens")).over(Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy(col("lang"), col("doc_id"))
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_before"))
    val two = TwoLevel.cumBefore(
        TwoLevel.withMd5Bucket(d, col("doc_id").cast("string"), "__o", "__b"),
        Seq("lang"), "__b", Seq(col("__o"), col("doc_id")),
        "n_tokens", "cum_before")
      .orderBy(col("lang"), col("doc_id"))
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("cum_before"))
    sameRows(two, naive)
  }

  test("plan: data window partitions by (stratum, bucket), never stratum alone") {
    val d = Tables.documents(spark, skewDir).select(col("lang"), col("doc_id"))
    val two = TwoLevel.rank(
      TwoLevel.withMd5Bucket(d, col("doc_id").cast("string"), "__o", "__b"),
      Seq("lang"), "__b", Seq(col("__o"), col("doc_id")), "rk")
    val windows = two.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    // Every window over the DATA carries the bucket in its partition
    // spec; the only single-expression partition specs allowed are the
    // tiny offsets/total windows over the bucket-totals aggregate.
    val dataWindows = windows.filter(_.partitionSpec.size >= 2)
    val tinyWindows = windows.filter(_.partitionSpec.size < 2)
    assert(dataWindows.nonEmpty, "bucketed data window missing from plan")
    tinyWindows.foreach { w =>
      val overAggregate = w.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(overAggregate.nonEmpty,
        s"single-stratum window over raw data found: $w")
    }
  }
}
