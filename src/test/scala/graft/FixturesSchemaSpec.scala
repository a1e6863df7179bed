package graft

import org.apache.spark.sql.types._

/** Pins the fixture schemas the engine assumes (TESTDATA.md tables at all
  * three SFs) so a driver-side regeneration that changes an encoding trips
  * ONE red test with a remedy message, instead of round 8's failure mode:
  * the events `ts` column drifted from TIMESTAMP(NANOS)-as-long to
  * TIMESTAMP_NTZ between commit and evaluation, and 37 queries died one
  * analysis error at a time with nothing in the repo naming the cause.
  *
  * Timestamp-ish columns carry an ALLOWED SET rather than a single dtype:
  * the driver has already produced two encodings, and the engine is robust
  * to the members of the set (Tables.events normalizes; date arithmetic is
  * agnostic for orders/lineitem). A dtype outside the set is exactly the
  * class of drift that needs a new normalization branch — the assertion
  * message says so.
  */
class FixturesSchemaSpec extends SparkSpec {
  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")

  // Encodings the engine tolerates for a fixture timestamp column:
  // TimestampType (tz-annotated parquet), TimestampNTZType (plain
  // timestamp[us], the post-r8 driver output), LongType (legacy
  // TIMESTAMP(NANOS) scanned under nanosAsLong).
  private val tsLike: Set[DataType] = Set(TimestampType, TimestampNTZType, LongType)
  private def one(dt: DataType): Set[DataType] = Set(dt)

  // Normalize nullability artifacts that pyarrow versions flip-flop on.
  private def canon(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => ArrayType(canon(et), containsNull = true)
    case other            => other
  }

  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> tsLike, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> tsLike),
    "events" -> Seq(
      "event_id" -> one(LongType), "ts" -> tsLike,
      "user_id" -> one(LongType), "event_type" -> one(StringType),
      "value" -> one(DoubleType), "props" -> one(StringType)),
    "documents" -> Seq(
      "doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> one(LongType),
      "embedding" -> one(ArrayType(FloatType, containsNull = true)),
      "label" -> one(IntegerType)))

  for (dir <- sfDirs; (table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$dir/$table scans with the assumed schema") {
      // Raw scan (plus the nanos conf Tables.events would set) — this pins
      // what the DRIVER wrote, before any engine-side normalization.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val actual = Tables.load(spark, dir, table).schema
        .map(f => f.name -> canon(f.dataType))
      assert(actual.map(_._1) == cols.map(_._1),
        s"$table column names/order drifted: got ${actual.map(_._1).mkString(",")} " +
          s"expected ${cols.map(_._1).mkString(",")} — audit every query reading $table")
      actual.zip(cols).foreach { case ((name, got), (_, allowed)) =>
        assert(allowed.contains(got),
          s"$table.$name scanned as $got, outside the engine's tolerated set " +
            s"${allowed.mkString("{", ", ", "}")} — the fixtures were regenerated " +
            s"with a new encoding; add a normalization branch (see Tables.events " +
            s"for the pattern) and extend this pin")
      }
    }
  }

  test("normalizeTs handles all three tolerated encodings (incl. the retired nanos form)") {
    // The fixtures no longer carry the nanos-as-long encoding, so without
    // this test that branch would be dead-untested — and the next driver
    // regeneration could flip BACK. One instant through each branch must
    // yield the identical TimestampType value. 2024-05-01 12:34:56.789012
    // UTC = 1714566896789012 µs.
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val us = 1714566896789012L
    def onlyTs(df: org.apache.spark.sql.DataFrame): Long = {
      val out = Tables.normalizeTs(df)
      assert(out.schema("ts").dataType == TimestampType)
      out.selectExpr("unix_micros(ts) AS us").head.getLong(0)
    }
    val asLong = spark.createDataFrame(
      java.util.List.of(Row(us * 1000L)),
      StructType(Seq(StructField("ts", LongType))))
    val asTs = spark.sql(s"SELECT timestamp_micros(${us}L) AS ts")
    val asNtz = asTs.select(col("ts").cast(TimestampNTZType).as("ts"))
    assert(onlyTs(asLong) == us, "nanos-as-long branch drifted")
    assert(onlyTs(asNtz) == us, "TIMESTAMP_NTZ branch drifted (UTC session)")
    assert(onlyTs(asTs) == us, "TimestampType passthrough drifted")
    val bad = asTs.select(lit("2024").as("ts"))
    val e = intercept[IllegalStateException](Tables.normalizeTs(bad))
    assert(e.getMessage.contains("normalizeTs"), "unknown dtype must fail naming the remedy")
  }

  test("events.ts normalizes to TimestampType at every SF") {
    for (dir <- sfDirs) {
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt == TimestampType,
        s"Tables.events($dir) produced ts: $dt, expected TimestampType — " +
          "the normalization branch for the current fixture encoding is " +
          "missing or wrong (Tables.scala events loader)")
    }
  }
}
