package graft

import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Corpus where neighbor ranking is known by construction: vectors along
    * a few fixed directions with decreasing alignment to e0. */
  private def embDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sim").toString
    def unit(theta: Double): Array[Float] = {
      val v = new Array[Float](64)
      v(0) = math.cos(theta).toFloat
      v(1) = math.sin(theta).toFloat
      v
    }
    // vec 0 = query (angle 0); others at increasing angles → known ranking
    val rows = (0 to 9).map { i => (i.toLong, unit(i * 0.15), i % 2) }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("int8 quantization: hand-checked scale and elements, zero-vector safe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quant").toString
    Seq(
      (0L, Array(0.5f, -1.0f, 0.0f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f), 0),     // all-zero: scale 0, no NaN/Inf
      (2L, Array(-2.0f, 1.0f, 0.25f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // qvec is emitted comma-joined (the gate's comparator sorts cells and
    // raw arrays aren't sortable keys) — split it back for the assertions
    def q(r: org.apache.spark.sql.Row): Seq[Long] =
      r.getString(2).split(',').toSeq.map(_.toLong)
    val rows = Similarity.quantizeInt8(spark, dir).collect()
    val r0 = rows(0)
    assert(r0.getDouble(1) == 127.0)          // 127 / max|x| = 127/1
    assert(q(r0) == Seq(63L, -127L, 0L))      // floor(63.5), floor(-127)
    val r1 = rows(1)
    assert(r1.getDouble(1) == 0.0 && q(r1) == Seq(0L, 0L, 0L))
    val r2 = rows(2)
    assert(r2.getDouble(1) == 63.5)           // 127 / 2
    assert(q(r2) == Seq(-127L, 63L, 15L))     // floor(15.875)
  }

  test("int8 quantization stays in [-128, 127] on the real fixture") {
    // floor maps [-max|x|, max|x|] onto [-128, 127]: a negative extreme
    // element lands on floor(-127.000…1) = -128 — the full int8 range.
    val qs = Similarity.quantizeInt8(spark, "/root/testdata/sf0.001")
      .selectExpr("transform(split(qvec, ','), x -> CAST(x AS LONG)) AS v")
      .selectExpr("array_max(v) AS mx", "array_min(v) AS mn").collect()
    assert(qs.forall(r => r.getLong(0) <= 127L && r.getLong(1) >= -128L))
  }

  test("brute-force top-k ranks by true cosine (known geometry)") {
    val dir = embDir()
    val got = Similarity.bruteForceTopK(spark, dir)
      .filter("q_id = 0").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L)) // increasing angle = decreasing cosine
  }

  test("IVF top-k returns exact ranking when probing all trained cells") {
    val dir = embDir()
    val got = Similarity.ivfTopK(spark, dir, nprobe = 2, cells = 2)
      .filter("q_id = 0").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L)) // 2 probes cover both cells
  }

  /** 10 tight direction-clusters of 20 vectors each — the structured
    * regime where ANN recall at low scan fraction is meaningful. The
    * geometry lives in Similarity.writeClusteredCorpus so the spec floors
    * and the driver-visible sim_recall_clustered query measure the SAME
    * corpus. */
  private def clusteredDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfc").toString
    Similarity.writeClusteredCorpus(spark, dir)
    dir
  }

  test("LSH top-k recall >= 0.9 on a CLUSTERED corpus at adaptive bits") {
    // On isotropic random data recall ≈ scan fraction for every ANN
    // method (information-theoretic; NOTES.md) — the old fixed-6-bit
    // config bought fixture recall by scanning 34% of signature space,
    // which is slower than brute force. Recall is therefore asserted
    // where it is achievable: a clustered corpus, at the same adaptive
    // bit width the production path derives from corpus size.
    val dir = clusteredDir()
    val brute = Similarity.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    info(f"clustered-corpus LSH recall vs brute = $recall%.3f (multi-probe d=${Similarity.LshProbes})")
    assert(recall >= 0.9, f"LSH recall $recall%.3f below floor 0.9")
  }

  test("LSH candidate set stays <= 5% of corpus x queries at adaptive bits (sf0.1)") {
    import org.apache.spark.sql.functions.col
    // Sub-linearity asserted on the worst case (isotropic corpus, no
    // structure): candidates per query bounded by the target fraction.
    // Signatures are hash-deterministic, so the count is exact, not flaky.
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n = e.count()
    val bits = Similarity.adaptiveLshBits(n)
    val corpus = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val qs = e.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cands = Similarity
      .lshCandidates(corpus, qs, Similarity.LshTables, bits, Similarity.LshProbes)
      .count()
    val ceiling = 0.05 * n * Similarity.NumQueries
    info(f"adaptive bits=$bits, candidates=$cands, ceiling=$ceiling%.0f (${cands / (n.toDouble * Similarity.NumQueries)}%.4f of scans)")
    assert(cands <= ceiling,
      s"candidate count $cands exceeds 5% of ${n * Similarity.NumQueries} — LSH not sub-linear-shaped")
  }

  test("annTopK picks brute force below the crossover and LSH above it") {
    // fixture corpora (500-2000 rows) sit below the crossover: the exact
    // plan is both faster and exact, so the planner must choose it
    assert(!Similarity.lshWinsAt(2000))
    assert(Similarity.lshWinsAt(1000000))
    val brute = Similarity.bruteForceTopK(spark, sf).collect().map(_.toSeq).toSeq
    val ann = Similarity.annTopK(spark, sf).collect().map(_.toSeq).toSeq
    assert(ann == brute, "below the crossover annTopK must return the exact plan's result")
  }

  test("annTopK: LSH branch equals brute-force branch where LSH recall is 1.0") {
    // Both planner branches, same corpus: the clustered corpus is the
    // regime where LSH recall is exactly 1.0, so the LSH branch must
    // reproduce the exact result bit-for-bit (same cosine expression,
    // ties broken by n_id in both plans). This closes the r5 caveat that
    // the planner's above-crossover branch was only spec-checked in
    // isolation, never against the exact answer.
    val dir = clusteredDir()
    val brute = Similarity.annTopK(spark, dir, _ => false).collect().map(_.toSeq).toSeq
    val lsh = Similarity.annTopK(spark, dir, _ => true).collect().map(_.toSeq).toSeq
    assert(lsh == brute,
      "annTopK LSH branch diverged from the exact plan on a recall-1.0 corpus")
  }

  test("IVF recall >= 0.9 at 20% scan fraction on a CLUSTERED corpus") {
    // The sf fixture is isotropic random data, where any ANN method's
    // recall ≈ scan fraction (no structure to exploit). Real embedding
    // corpora cluster; this corpus plants 10 tight direction-clusters and
    // shows IVF recovers the true top-k while probing 2 of 10 cells.
    val dir = clusteredDir()
    val brute = Similarity.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(spark, dir, nprobe = 2, cells = 10, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    info(f"clustered-corpus IVF recall at 2/10 probes = $recall%.3f")
    assert(recall >= 0.9, f"IVF recall $recall%.3f below floor 0.9")
  }

  test("recallMetrics: clustered-corpus recall floors and sane fractions") {
    // The driver-visible artifact values (VERDICT r8 #6): on a corpus
    // with structure both approximate tiers must clear the documented
    // 0.9 recall floor, and the fractions must be genuine fractions.
    // Hash-deterministic end to end, so exact reruns are stable.
    val dir = clusteredDir()
    val m = Similarity.recallMetrics(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    info(f"ivf recall=${m("ivf")._1}%.3f frac=${m("ivf")._2}%.3f; " +
      f"lsh recall=${m("lsh")._1}%.3f frac=${m("lsh")._2}%.3f")
    assert(m("lsh")._1 >= 0.9, f"LSH recall ${m("lsh")._1}%.3f below floor 0.9")
    assert(m("ivf")._1 >= 0.9, f"IVF recall ${m("ivf")._1}%.3f below floor 0.9")
    assert(m.values.forall { case (r, f) => r >= 0 && r <= 1 && f > 0 && f <= 1 })
  }

  test("sim_recall_clustered: gate query hits recall 1.0 exactly and exports counters") {
    // The driver-visible clustered arm, hash-gated since r16 (VERDICT
    // r15 #2): the query synthesizes its own corpus (dir-independent)
    // and ships exact integers (tier, recall_num, recall_den); on the
    // structured corpus every tier's candidate set covers the true
    // top-k, so num == den — the same claim the SQL oracle encodes.
    graft.tools.RoutingMetrics.drain() // isolate this test's counters
    val m = Similarity.recallClustered(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m.keySet == Set("hnsw", "ivf", "lsh", "pq"))
    m.foreach { case (tier, (num, den)) =>
      assert(den > 0 && num == den,
        s"$tier recall not 1.0 on the clustered corpus: $num/$den")
    }
    val c = graft.tools.RoutingMetrics.drain()
    assert(c("ivf_recall_clustered_bp") >= 9000L, s"counters: $c")
    assert(c("lsh_recall_clustered_bp") >= 9000L, s"counters: $c")
    assert(c("pq_recall_clustered_bp") >= 9000L, s"counters: $c")
    assert(c("hnsw_recall_clustered_bp") >= 9000L, s"counters: $c")
    assert(c("hnsw_cand_fraction_clustered_bp") > 0L &&
      c("hnsw_cand_fraction_clustered_bp") <= 10000L)
    assert(c("ivf_cand_fraction_clustered_bp") > 0L &&
      c("ivf_cand_fraction_clustered_bp") <= 10000L)
    assert(c("lsh_cand_fraction_clustered_bp") > 0L &&
      c("lsh_cand_fraction_clustered_bp") <= 10000L)
  }

  test("HNSW graph: base-layer out-degree bounded by M, edges stay " +
      "in-partition, top layer covers every direction") {
    val dir = Similarity.clusteredCorpusDir(spark)
    val edges = Similarity.hnswIndex(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).map(_._2.length)
    assert(deg.max <= Similarity.HnswM, s"degree ${deg.max} > M")
    assert(edges.forall { case (s, d) =>
      s / Similarity.HnswPartWidth == d / Similarity.HnswPartWidth },
      "base-layer edges must stay inside their partition subgraph")
    // entry period 3 coprime to direction period 10 → all 10 directions
    val entryDirs = (0L until 200L)
      .filter(_ % Similarity.hnswEntryPeriod(200) == 0).map(_ % 10).toSet
    assert(entryDirs == (0L until 10L).toSet)
  }

  test("HNSW incremental: merged edge set is bitwise the rebuild's, and " +
      "untouched partitions come from the history artifact") {
    val dir = Similarity.clusteredCorpusDir(spark)
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = edgeSet(Similarity.hnswIndex(spark, dir))
    val incr = edgeSet(Similarity.hnswIndexIncremental(spark, dir, 150L))
    assert(incr == full, "incremental edge artifact must equal a rebuild")
    // the id-tail delta (150..199) touches only partition 3 of width 50:
    // partitions 0..2 must be pure history edges
    val hist = edgeSet(Similarity.hnswIndexIncremental(spark, dir, 150L)
      .filter(org.apache.spark.sql.functions.col("src") < 150))
    assert(hist == full.filter(_._1 < 150))
  }

  test("annTopK: graph branch equals brute force on the clustered " +
      "corpus, and the dispatch floor keeps it off every fixture") {
    val dir = Similarity.clusteredCorpusDir(spark)
    val brute = Similarity.bruteForceTopK(spark, dir).collect().map(_.toString)
    val graph = Similarity.annTopK(spark, dir, graphWins = _ => true)
      .collect().map(_.toString)
    assert(graph.toSeq == brute.toSeq)
    assert(!Similarity.hnswWinsAt(200L) && !Similarity.hnswWinsAt(100000L))
    assert(Similarity.hnswWinsAt(Similarity.HnswDispatchFloor))
  }

  test("PQ top-k: exact-rerank subset of true ranking, bounded candidates") {
    // PQ candidates are approximation-selected, but everything it RETURNS
    // must carry the true cosine and true rank order (the exact rerank),
    // and the exact-scan share must stay at the documented R·q bound.
    val dir = clusteredDir()
    val brute = Similarity.bruteForceTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val pq = Similarity.pqTopK(spark, dir).collect()
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      brute.get(key).foreach(c => assert(c == r.getDouble(3),
        s"PQ returned a cosine differing from the exact value at $key"))
    }
    val cands = Similarity.pqCandidates(spark, dir).count()
    assert(cands <= Similarity.PqRerank.toLong * Similarity.NumQueries,
      s"PQ exact-rerank candidates $cands exceed R*q")
  }

  test("recallMetrics: fixture LSH candidate fraction stays sub-linear-shaped") {
    // On the isotropic fixture recall ≈ scan fraction for every ANN
    // method (information-theoretic; NOTES.md) — the artifact value to
    // GUARD here is the fraction: LSH must stay within the adaptive-bits
    // target envelope (≤5%, the SimilaritySpec ceiling). IVF's fixture
    // fraction is ~nprobe/cells by construction (small-corpus regime
    // with 6 trained cells) — sanity-bounded, not floor-asserted.
    val m = Similarity.recallMetrics(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    info(f"fixture ivf recall=${m("ivf")._1}%.3f frac=${m("ivf")._2}%.3f; " +
      f"lsh recall=${m("lsh")._1}%.3f frac=${m("lsh")._2}%.3f")
    assert(m("lsh")._2 <= 0.05,
      f"LSH scanned ${m("lsh")._2}%.3f of corpus×queries — not sub-linear-shaped")
    assert(m("ivf")._2 <= 0.8)
  }

  test("LSH top-k returns a correctly-ordered subset of the true ranking") {
    val dir = embDir()
    val brute = Similarity.bruteForceTopK(spark, dir)
      .filter("q_id = 0").collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val got = Similarity.lshTopK(spark, dir)
      .filter("q_id = 0").collect().map(r => (r.getLong(2), r.getDouble(3)))
    // every returned cosine matches the exact cosine for that neighbor
    got.foreach { case (id, cos) =>
      if (brute.contains(id)) assert(math.abs(brute(id) - cos) < 1e-12)
    }
    // ranks are ordered by cosine desc
    assert(got.map(_._2).toSeq == got.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }

  test("embStats stream: monoid fold equals the batch report; replay " +
      "idempotent; derived mean/variance are consistent") {
    val dir = embDir()
    val batch = Similarity.embStats(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val stream = Similarity.embStatsStream(spark, dir, epochs = 3)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(stream == batch, s"stream=$stream batch=$batch")
    // every vector contributes to every dim; min <= mean <= max; the
    // variance derivation n*sumsq - sum^2 is non-negative (Cauchy-Schwarz)
    batch.foreach { case (_, n, s, ss, mn, mx) =>
      assert(n == 10L)
      assert(mn * n <= s && s <= mx * n)
      assert(n * ss - s * s >= 0L)
    }
    // replay: re-applying the last epoch rewrites identical state
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-embstats-spec").toString + "/state"
    try {
      val vecs = Tables.embeddings(spark, dir)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
      Similarity.embStatsStreamApplyBatch(
        vecs.filter("vec_id < 5"), 0L, statePath, compactEvery = 2)
      Similarity.embStatsStreamApplyBatch(
        vecs.filter("vec_id >= 5"), 1L, statePath, compactEvery = 2)
      def rep() = Similarity.embStatsStreamReport(spark, statePath, 1L)
        .get.collect().map(r => r.getInt(0) -> r.getDecimal(2)).toMap
      val r1 = rep()
      Similarity.embStatsStreamApplyBatch(
        vecs.filter("vec_id >= 5"), 1L, statePath, compactEvery = 2)
      assert(rep() == r1, "replay changed the folded stats")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("embStats accumulates in DECIMAL(38,0): per-dim sumsq past the " +
      "int64 envelope is exact, in the batch op AND through the stream " +
      "fold (r15 verdict #1)") {
    import spark.implicits._
    // q = floor(4000·10⁶) = 4×10⁹ ⇒ q² = 1.6×10¹⁹ > Long.MaxValue
    // (9.22×10¹⁸): even ONE row wraps an int64 sumsq, three rows make
    // the wrap unmissable. The planted value stands in for the real
    // envelope break (~10⁷ vectors/dim at |q| ≈ 10⁶) at unit cost.
    val vecs = Seq((0L, Seq(4000.0f)), (1L, Seq(4000.0f)),
        (2L, Seq(4000.0f)))
      .toDF("vec_id", "embedding")
    val stats = Similarity.embStatsOf(vecs)
    val sumsqField = stats.schema("sumsq_q")
    assert(sumsqField.dataType ==
      org.apache.spark.sql.types.DecimalType(38, 0),
      s"sumsq_q must accumulate in DECIMAL(38,0), got ${sumsqField.dataType}")
    val row = stats.collect().head
    assert(row.getDecimal(2).toBigInteger ==
      new java.math.BigInteger("12000000000"))      // 3 × 4×10⁹
    assert(row.getDecimal(3).toBigInteger ==
      new java.math.BigInteger("48000000000000000000")) // 3 × 1.6×10¹⁹
    // the streaming fold merges two such deltas without wrapping
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-embstats-ovf").toString + "/state"
    try {
      Similarity.embStatsStreamApplyBatch(vecs, 0L, statePath,
        compactEvery = 2)
      Similarity.embStatsStreamApplyBatch(vecs, 1L, statePath,
        compactEvery = 2)
      val folded = Similarity.embStatsStreamReport(spark, statePath, 1L)
        .get.collect().head
      assert(folded.getDecimal(3).toBigInteger ==
        new java.math.BigInteger("96000000000000000000"),
        s"fold wrapped: ${folded.getDecimal(3)}")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("embDriftDims: strict threshold boundary (a shift of exactly T " +
      "does not trigger; a clearly larger one does), exact past the " +
      "int64 q envelope, and unequal corpus sizes cross-multiply " +
      "correctly") {
    import spark.implicits._
    def stats(rows: (Long, Seq[Float])*) = Similarity.embStatsOf(
      rows.toSeq.toDF("vec_id", "embedding"))
    // hist: 2 vectors at x=0 (dim 0) → mean 0; delta: 1 vector.
    // T = 100000µ: delta at 0.1 shifts the mean by exactly T → NOT
    // drifted (strict >); 0.100001 → drifted. Unequal n (2 vs 1)
    // exercises the cross-multiplication.
    val h = stats(0L -> Seq(0.0f), 1L -> Seq(0.0f))
    assert(Similarity.embDriftDims(h, stats(2L -> Seq(0.1f)),
      100000L).collect().isEmpty, "shift == T must not trigger")
    assert(Similarity.embDriftDims(h, stats(2L -> Seq(0.11f)),
      100000L).collect().map(_.getInt(0)).toSeq == Seq(0),
      "shift > T must trigger on exactly the shifted dim")
    // a second, unshifted dim stays quiet while dim 0 drifts
    val h2 = stats(0L -> Seq(0.0f, 0.5f), 1L -> Seq(0.0f, 0.5f))
    val d2 = stats(2L -> Seq(1.0f, 0.5f))
    assert(Similarity.embDriftDims(h2, d2, 100000L)
      .collect().map(_.getInt(0)).toSeq == Seq(0))
    // int64 envelope: |q| = 4×10⁹ (the embStats overflow plant) with
    // the cross term s_d·n_h = 4×10⁹·n_h stays exact in DECIMAL
    val hBig = stats((0L until 3L).map(i => i -> Seq(4000.0f)): _*)
    val dBig = stats(3L -> Seq(-4000.0f))
    assert(Similarity.embDriftDims(hBig, dBig, 100000L)
      .collect().map(_.getInt(0)).toSeq == Seq(0))
  }

  test("ivfTopKRefresh: the drifted arm takes the retrain branch, the " +
      "quiet arm stays frozen and matches the full-corpus-trained tier") {
    val drift = Similarity.ivfRefreshClustered(spark, "").collect()
    assert(drift.nonEmpty && drift.forall(_.getString(4) == "refresh"))
    val quiet = Similarity.ivfRefreshNoDriftClustered(spark, "").collect()
    assert(quiet.nonEmpty && quiet.forall(_.getString(4) == "frozen"))
    // both quantizers are exact on this corpus → identical top-k
    val tier = Similarity.ivfTopK(spark,
      Similarity.clusteredCorpusDir(spark)).collect()
      .map(_.toSeq).toSeq
    assert(quiet.map(_.toSeq.take(4)).toSeq == tier,
      "frozen-branch search diverged from the clustered IVF tier")
  }

  test("pqTopKRefresh: the drifted arm retrains the codebooks, the quiet " +
      "arm stays frozen and matches the full-corpus-trained PQ tier") {
    val drift = Similarity.pqRefreshClustered(spark, "").collect()
    assert(drift.nonEmpty && drift.forall(_.getString(4) == "refresh"))
    val quiet = Similarity.pqRefreshNoDriftClustered(spark, "").collect()
    assert(quiet.nonEmpty && quiet.forall(_.getString(4) == "frozen"))
    // history-trained codebooks are exact on this corpus too (every
    // planted direction is represented below the split) → identical
    // top-k to the full-corpus-trained tier
    val tier = Similarity.pqTopK(spark,
      Similarity.clusteredCorpusDir(spark)).collect()
      .map(_.toSeq).toSeq
    assert(quiet.map(_.toSeq.take(4)).toSeq == tier,
      "frozen-branch PQ search diverged from the clustered PQ tier")
    // BOUNDARY: a threshold just above the drifted corpus's measured
    // shift keeps the monitor quiet there — the branch choice is the
    // threshold comparison, not corpus identity
    val atBoundary = Similarity.pqTopKRefresh(spark,
      Similarity.driftedCorpusDir(spark), splitId = 200,
      thresholdMicro = 1000000000L).collect()
    assert(atBoundary.forall(_.getString(4) == "frozen"),
      "an impossibly-high threshold must silence the monitor")
  }

  test("HNSW streaming: the maintained edge artifact equals the batch " +
      "rebuild bitwise under misaligned epochs that re-touch partitions") {
    val cdir = Similarity.clusteredCorpusDir(spark)
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val stream = edgeSet(Similarity.hnswStreamEdges(spark, cdir))
    val rebuild = edgeSet(Similarity.hnswIndex(spark, cdir))
    assert(stream == rebuild, s"maintained graph diverged: " +
      s"extra=${(stream diff rebuild).take(5)} missing=${(rebuild diff stream).take(5)}")
    // 5 epochs of width 40 over 50-wide partitions: epochs 1-3 must
    // each re-touch an already-built partition (the replacement path)
    assert(stream.nonEmpty)
  }

  test("filteredTopK: measured selectivity routes the branches, and the " +
      "post branch's k-guarantee recovers the exact answer when the " +
      "predicate starves every probed cell") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    graft.tools.RoutingMetrics.drain()
    // label = 3 is ~10 % of the fixture → the planner must PRE-filter
    val pre = Similarity.filteredTopK(spark, sf,
      col("label") === Similarity.FilteredLabel).collect()
    val rm1 = graft.tools.RoutingMetrics.drain()
    assert(rm1.getOrElse("filtered_pre", 0L) == 1L &&
      rm1.getOrElse("filtered_post", 0L) == 0L,
      s"selective predicate must take the pre branch: $rm1")
    assert(pre.nonEmpty && pre.forall(_.getInt(1) <= Similarity.K))
    // the clustered gate's predicate keeps 50 % → POST branch
    val cdir = Similarity.clusteredCorpusDir(spark)
    Similarity.filteredTopK(spark, cdir,
      col("vec_id") % Similarity.FilteredMod < Similarity.FilteredKeep)
      .collect()
    val rm2 = graft.tools.RoutingMetrics.drain()
    assert(rm2.getOrElse("filtered_post", 0L) == 1L &&
      rm2.getOrElse("filtered_topup_queries", -1L) == 0L,
      s"50% predicate must post-filter with no top-up on this corpus: $rm2")
    // starvation: only vec_ids {7, 107} pass — every query under-fills,
    // so the k-guarantee must recompute ALL of them and the result must
    // equal the forced-exact plan (min(K, |filtered|) rows per query)
    val sparse = col("vec_id") % 100 === 7
    val post = Similarity.filteredTopK(spark, cdir, sparse,
      preWins = _ => false).collect().map(_.toSeq).toSeq
    val exact = Similarity.filteredTopK(spark, cdir, sparse,
      preWins = _ => true).collect().map(_.toSeq).toSeq
    assert(post == exact, s"k-guarantee output diverged from exact")
    val rm3 = graft.tools.RoutingMetrics.drain()
    assert(rm3.getOrElse("filtered_topup_queries", 0L) == 8L,
      s"all 8 starved queries must top up: $rm3")
    val perQ = post.groupBy(_.head).view.mapValues(_.size).toMap
    assert(perQ(7L) == 1 && perQ.filter(_._1 != 7L).values.forall(_ == 2),
      s"row counts must be min(K, |filtered|) per query: $perQ")
  }

  test("sampledSelectivity: one-pass hash-sample estimate tracks the exact " +
      "fraction and routes the same branch; tiny corpora fall back exact") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // Above the SelectivityMinSample floor the probe really samples:
    // 32k ids, label = id % 10 (independent of the xxhash64 sample key).
    val big = spark.range(32000)
      .select(col("id").as("vec_id"), pmod(col("id"), lit(10)).as("label"))
    for ((pred, want) <- Seq(
        (col("label") === 3, 0.1),   // selective → pre regime
        (col("label") < 5, 0.5))) {  // unselective → post regime
      val est = Similarity.sampledSelectivity(big, pred)
      val ex = Similarity.exactSelectivity(big, pred)
      assert(math.abs(ex - want) < 1e-9)
      assert(math.abs(est - ex) < 0.05,
        s"sampled estimate $est drifted from exact $ex")
      assert((est <= Similarity.FilteredPreFraction) ==
        (ex <= Similarity.FilteredPreFraction),
        s"sampled probe must route the same branch: est=$est exact=$ex")
    }
    // Below the floor (every fixture corpus: 500–2000 vectors) the probe
    // IS the exact count — bitwise, not approximately.
    val emb = Tables.embeddings(spark, sf)
    val pred = col("label") === Similarity.FilteredLabel
    assert(Similarity.sampledSelectivity(emb, pred) ==
      Similarity.exactSelectivity(emb, pred))
  }
}
