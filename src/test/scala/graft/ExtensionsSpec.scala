package graft

import org.apache.spark.sql.catalyst.expressions.{If, Literal}
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosine_sim
import graft.functions.{Scored, TopKAggregator}

/** Native expression, SQL registration, optimizer rule, and the typed
  * top-k Aggregator. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim native expression computes exact cosine (codegen path)") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(2.0f, 0.0f)),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).as[Double].collect()
    assert(got(0) == 0.0 && got(1) == 1.0)
    assert(math.abs(got(2) - 1.0) < 1e-15)
  }

  test("lsh_sig native expression matches the Array[Float] kernel (codegen path)") {
    import graft.functions.{LshSignature, VectorKernels}
    val vecs = Seq(
      Array(1.0f, 0.0f, -0.5f, 2.0f),
      Array(-1.0f, 3.0f, 0.25f, -0.75f),
      Array(0.1f, 0.1f, 0.1f, 0.1f))
    val df = vecs.toDF("v")
    for (t <- 0 until 3; bits <- Seq(6, 14)) {
      val got = df.select(LshSignature.lsh_sig(col("v"), t, bits))
        .as[Long].collect().toSeq
      val want = vecs.map(VectorKernels.lshSignature(_, t, bits))
      assert(got == want, s"table=$t bits=$bits")
    }
    // double arrays dispatch through the other getter
    val dd = Seq(Array(1.0, -2.0, 0.5)).toDF("v")
      .select(LshSignature.lsh_sig(col("v"), 0, 8)).as[Long].collect().head
    assert(dd == VectorKernels.lshSignature(Array(1.0f, -2.0f, 0.5f), 0, 8))
  }

  test("HLL sketch estimate stays within 5% of exact distinct (q62)") {
    val rows = graft.ops.Relational2.q62HllSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1)
      val exact = r.getLong(2)
      assert(exact > 0)
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("HLL sketches are mergeable: union of per-group partials == direct global") {
    import org.apache.spark.sql.functions._
    // the property that makes sketches the at-scale distinct-counter:
    // partial sketches built independently (per group / per partition /
    // per day) union into exactly the sketch a single global pass builds
    val e = graft.Tables.events(spark, sf)
    val direct = e.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().head.getLong(0)
    val merged = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getLong(0)
    assert(merged == direct,
      s"merged partial sketches ($merged) != direct global sketch ($direct)")
  }

  test("streaming HLL: folded union answers the bound gate; replaying " +
      "the last epoch leaves the folded estimate unchanged (r16)") {
    import org.apache.spark.sql.functions._
    // gate decision matches batch bitwise on the fixture
    val stream = graft.ops.Relational2.q62HllBoundStream(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val batch = graft.ops.Relational2.q62HllBound(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(stream.toSeq == batch.toSeq,
      s"stream=${stream.toSeq} batch=${batch.toSeq}")
    assert(stream.forall(_._3), "a group fell outside the 5% bound")
    // replay idempotence of the sketch log (HLL union absorbs the
    // double-published epoch — the estimate cannot move)
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-hllstream-spec").toString + "/state"
    try {
      val ev = graft.Tables.events(spark, sf)
        .select(col("event_id"), col("event_type"), col("user_id"))
      val b0 = ev.filter(col("event_id") % 2 === 0)
      val b1 = ev.filter(col("event_id") % 2 === 1)
      graft.ops.Relational2.q62HllStreamApplyBatch(b0, 0L, statePath,
        compactEvery = 2)
      graft.ops.Relational2.q62HllStreamApplyBatch(b1, 1L, statePath,
        compactEvery = 2)
      def est() = spark.read.parquet(graft.tools.LogState.pathsAsOf(
          s"$statePath/sk", 1L): _*)
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val first = est()
      graft.ops.Relational2.q62HllStreamApplyBatch(b1, 1L, statePath,
        compactEvery = 2)
      assert(est() == first, "replay moved the folded HLL estimate")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("cosine_sim null propagation") {
    val df = Seq((Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(cosine_sim(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("GraftExtensions.register exposes cosine_sim to SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .as[Double].collect().head
    assert(r == 1.0)
  }

  test("SelfCosineRule rewrites cosine_sim(x, x) to SelfCosine") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("e")
    val plan = df.select(cosine_sim(col("e"), col("e")).as("c"))
      .queryExecution.analyzed
    val rewritten = SelfCosineRule(plan)
    val exprs = rewritten.expressions.flatMap(_.collect {
      case s: graft.functions.SelfCosine => s
    })
    assert(exprs.nonEmpty, s"rule did not fire: $rewritten")
  }

  test("SelfCosine is bit-identical to the unoptimized expression, incl. zero/empty vectors") {
    // zero vector and empty array → 0/0 = NaN in the unoptimized form; a
    // normal vector → s/(sqrt(s)·sqrt(s)), often 1 ulp away from 1.0.
    // The rule must preserve all of it bitwise.
    val rows = Seq(
      Array(1.0f, 2.0f, 3.0f),
      Array(0.0f, 0.0f, 0.0f),
      Array[Float](),
      Array(2.0f, 0.0f, 0.0f))
    val df = rows.map(Tuple1(_)).toDF("e")
    val unopt = df.select(cosine_sim(col("e"), col("e"))).as[Double].collect()
    val viaRule = {
      val plan = df.select(cosine_sim(col("e"), col("e")).as("c")).queryExecution.analyzed
      val rewritten = SelfCosineRule(plan)
      org.apache.spark.sql.graft.GraftShim.ofRows(spark, rewritten).as[Double].collect()
    }
    assert(unopt.length == viaRule.length)
    unopt.zip(viaRule).foreach { case (a, b) =>
      assert(java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b),
        s"$a vs $b not bitwise-equal")
    }
    assert(unopt(1).isNaN && unopt(2).isNaN) // documents the 0/0 semantics
  }

  test("cosine_sim handles int/short/byte element arrays width-correctly") {
    val df = Seq((Array(1, 2), Array(2, 3))).toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).as[Double].collect().head
    val expect = (1.0 * 2 + 2.0 * 3) / (math.sqrt(1.0 + 4.0) * math.sqrt(4.0 + 9.0))
    assert(math.abs(got - expect) < 1e-15)
    // short + byte arrays through the SQL surface (interpreted + codegen)
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT cosine_sim(array(CAST(3 AS SMALLINT), CAST(4 AS SMALLINT)), array(CAST(3 AS TINYINT), CAST(4 AS TINYINT))) AS c")
      .as[Double].collect().head
    assert(math.abs(viaSql - 1.0) < 1e-15)
  }

  test("TopKAggregator keeps k best with deterministic tie-break") {
    val agg = new TopKAggregator(3)
    val items = Seq(Scored(1, 0.5), Scored(2, 0.9), Scored(3, 0.9),
      Scored(4, 0.1), Scored(5, 0.7))
    val out = items.foldLeft(agg.zero)(agg.reduce)
    assert(out == Seq(Scored(2, 0.9), Scored(3, 0.9), Scored(5, 0.7)))
    // merge of partial buffers gives the same answer as one pass
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == out)
  }

  test("aggregator top-k query matches the window-based brute force") {
    val brute = graft.ops.Similarity.bruteForceTopK(spark, sf).collect().toSeq
    val viaAgg = graft.ops.Similarity.aggTopK(spark, sf).collect().toSeq
    assert(viaAgg.map(_.toSeq) == brute.map(_.toSeq))
  }

  test("bounded_lev equals min(levenshtein, k+1) on random pairs (codegen path)") {
    import graft.functions.BoundedLevenshtein.bounded_lev
    val rnd = new scala.util.Random(42)
    def word() = (1 to (3 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = (1 to 200).map(_ => (word(), word()))
    val df = pairs.toDF("a", "b")
    for (k <- Seq(0, 1, 2, 5)) {
      val got = df.select(levenshtein(col("a"), col("b")).as("full"),
        bounded_lev(col("a"), col("b"), k).as("bounded")).collect()
      got.foreach { r =>
        assert(r.getInt(1) == math.min(r.getInt(0), k + 1),
          s"k=$k full=${r.getInt(0)} bounded=${r.getInt(1)}")
      }
    }
    // empty and identical strings
    val edge = Seq(("", ""), ("", "abc"), ("same", "same")).toDF("a", "b")
    val e = edge.select(bounded_lev(col("a"), col("b"), 2)).as[Int].collect()
    assert(e.toSeq == Seq(0, 3, 0))
  }

  test("q71 EWMA: hand-checked warmup terms, power-of-two weights exact") {
    val rows = graft.ops.Relational2.q71Ewma(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    // per user, the first row's ewma is value/2 exactly (no history);
    // the second is v2/2 + v1/4 exactly (both scalings exact in IEEE754)
    byUser.values.foreach { rs =>
      val first = rs.head
      assert(first.getDouble(4) == first.getDouble(3) * 0.5)
      if (rs.length > 1) {
        val second = rs(1)
        assert(second.getDouble(4) ==
          second.getDouble(3) * 0.5 + first.getDouble(3) * 0.25)
      }
    }
  }

  test("q72 SCD2: intervals chain per key, exactly one open version") {
    val rows = graft.ops.Relational2.q72Scd2(spark, sf).collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      // the closing edge of version k is the opening edge of version k+1
      rs.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) == b.getLong(1))
        case _           => ()
      }
      assert(rs.count(_.getInt(3) == 1) == 1, "one current version per key")
      assert(rs.last.getLong(2) == -1L, "open interval carries the sentinel")
    }
  }

  test("q73 histogram: buckets partition the value range, counts total") {
    val rows = graft.ops.Relational2.q73Histogram(spark, sf).collect()
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 15))
    // bucket-local min/max must not overlap the neighbor's range
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2))
      case _           => ()
    }
  }
}
