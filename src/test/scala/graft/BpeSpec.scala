package graft

import graft.ops.Corpus

/** BPE merge-rule training invariants: the hash gate replays the full
  * fixture training in DuckDB; these pin the primitive (greedy fold) on
  * hand-checked cases and the loop on a corpus whose merge sequence is
  * known by hand. */
class BpeSpec extends SparkSpec {

  test("greedyMerge: leftmost-first, run parity, merged symbol inertness") {
    assert(Corpus.greedyMerge(Seq("a", "b", "c"), "a", "b") == Seq("ab", "c"))
    // l == r runs merge at positions 0-1, 2-3, ... (scan parity)
    assert(Corpus.greedyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Corpus.greedyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // a merged symbol never re-matches l within the same pass
    assert(Corpus.greedyMerge(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
    // adjacent disjoint merges both fire
    assert(Corpus.greedyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    // no match → unchanged
    assert(Corpus.greedyMerge(Seq("x", "y"), "a", "b") == Seq("x", "y"))
  }

  test("training on a hand-checked corpus learns the expected merges in order") {
    // corpus: "low" x3, "lower" x1 → word types low:3, lower:1
    // w0: low -> [l,o,w,</w>] (cnt 3), lower -> [l,o,w,e,r,</w>] (cnt 1)
    // round 1 pairs: (l,o)=4, (o,w)=4, (w,</w>)=3, (w,e)=1, (e,r)=1, (r,</w>)=1
    //   argmax (count DESC, l, r): (l,o) beats (o,w) lexicographically → "lo"
    // round 2: (lo,w)=4 wins → "low"
    // round 3: (low,</w>)=3 wins → "low</w>"
    import spark.implicits._
    val docs = Seq((1L, "low low lower low")).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "length(text) AS n_chars")
    val tmp = graft.tools.TempDirs.createFast("graft-bpe-spec")
    try {
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val merges = Corpus.bpeMerges(spark, tmp).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4)))
      assert(merges.take(3).toSeq == Seq(
        (1, "l", "o", "lo", 4L),
        (2, "lo", "w", "low", 4L),
        (3, "low", "</w>", "low</w>", 3L)))
      // after the "low" merges exhaust, training proceeds into "lower"'s
      // remaining symbols rather than stopping
      assert(merges.length > 3)
    } finally graft.tools.TempDirs.deleteRecursively(tmp)
  }

  test("selectCommutingBatch: disjointness, threat bound, vocab-collision " +
      "stop, and the head-row fallback") {
    def sel(rows: Seq[(String, String, Long)], cap: Int = 64,
            whole: Boolean = true, ex: Set[String] = Set("</w>")) =
      Corpus.selectCommutingBatch(rows, cap, whole, ex)
    // fully disjoint table → whole table batches
    assert(sel(Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 5L)))
      == Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 5L)))
    // row 3 shares 'b' with row 1 → threat = 6; row 2 (c=7 > 6) survives,
    // and nothing at or below the threat count is kept
    assert(sel(Seq(("a", "b", 9L), ("c", "d", 7L), ("b", "x", 6L),
      ("y", "z", 6L))) == Seq(("a", "b", 9L), ("c", "d", 7L)))
    // threat TIES the second row's count → second row dropped (a new pair
    // could tie it and win the (l, r) tie-break)
    assert(sel(Seq(("a", "b", 9L), ("c", "d", 6L), ("b", "x", 6L)))
      == Seq(("a", "b", 9L)))
    // threat ties the TOP count → fallback to the plain sequential argmax
    assert(sel(Seq(("a", "b", 9L), ("b", "x", 9L), ("c", "d", 7L)))
      == Seq(("a", "b", 9L)))
    // merged-string reuse: row 2 would recreate symbol "ab" → stop there
    assert(sel(Seq(("x", "y", 9L), ("a", "b", 7L), ("c", "d", 5L)),
      ex = Set("</w>", "ab")) == Seq(("x", "y", 9L)))
    // within-batch merged-string collision: ("a","bc") then ("ab","c")
    // both make "abc" → second stops the scan
    assert(sel(Seq(("a", "bc", 9L), ("ab", "c", 7L), ("x", "y", 5L)))
      == Seq(("a", "bc", 9L)))
    // truncated window (sawWholeTable=false): last row's count bounds the
    // unseen tail → members must be strictly above it
    assert(sel(Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 7L)),
      whole = false) == Seq(("a", "b", 9L)))
    // cap stops selection but the threat scan keeps going: row 3 shares
    // with row 1 → threat 6 → both capped members survive (counts > 6)
    assert(sel(Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 7L),
      ("b", "x", 6L)), cap = 2) == Seq(("a", "b", 9L), ("c", "d", 7L)))
  }

  test("batched training equals one-rule-per-round training rule for rule " +
      "(VERDICT r12 #1: the batch is a provably-sequential prefix)") {
    // 48 merges over the fixture corpus exercises plenty of interactions
    // (shared 'e'/'t'/'</w>' symbols dominate the top pairs);
    // localTypeBudget = 0 forces the DISTRIBUTED loop in both arms
    def mt(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    graft.tools.RoutingMetrics.drain() // leftovers from earlier suites
    val seqT = mt(Corpus.bpeTrainUncached(spark, sf, merges = 48,
      maxBatch = 1, localTypeBudget = 0L)._1)
    val rm0 = graft.tools.RoutingMetrics.drain()
    val batT = mt(Corpus.bpeTrainUncached(spark, sf, merges = 48,
      maxBatch = 64, localTypeBudget = 0L)._1)
    val rm1 = graft.tools.RoutingMetrics.drain()
    assert(seqT == batT, "batched merge table must be bitwise sequential")
    assert(seqT.size == 48)
    val seqRounds = rm0.getOrElse("bpe_spark_rounds", 0L)
    val batRounds = rm1.getOrElse("bpe_spark_rounds", 0L)
    assert(batRounds < seqRounds,
      s"batching must cut driver round-trips ($batRounds vs $seqRounds)")
  }

  test("in-memory training (the fits-the-driver path) equals the " +
      "distributed loop bitwise: merge table AND final word symbols") {
    import org.apache.spark.sql.functions.col
    graft.tools.RoutingMetrics.drain()
    val (dmt, dw) = Corpus.bpeTrainUncached(spark, sf, merges = 48,
      maxBatch = 1, localTypeBudget = 0L)
    val (lmt, lw) = Corpus.bpeTrainUncached(spark, sf, merges = 48)
    val rm = graft.tools.RoutingMetrics.drain()
    def mt(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(mt(dmt) == mt(lmt))
    def ws(df: org.apache.spark.sql.DataFrame) =
      df.select(col("word"), col("cnt"), col("syms")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2).toList))
        .sortBy(_._1).toSeq
    assert(ws(dw) == ws(lw),
      "final word representations must match across engines")
    // the local path's whole training is O(1) driver-blocking actions
    assert(rm.getOrElse("bpe_spark_rounds", 0L) - 48L <= 2L,
      s"local path must add ~2 actions, got ${rm.get("bpe_spark_rounds")}")
  }

  test("packSequencesBpe: per-doc BPE counts equal the sum of trained word lengths") {
    val out = Corpus.packSequencesBpe(spark, sf).localCheckpoint()
    // BPE counts are bounded by char counts + 1 marker per word and at
    // least 1 symbol per word
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long").as("n_words"))
    val joined = out.join(docs, Seq("doc_id"))
    assert(joined.filter(col("n_tokens") < col("n_words")).count() == 0,
      "every word is at least one BPE symbol")
    // prefix-sum integrity: within a source, cum_before is the running sum
    val bad = out.selectExpr("source", "doc_id", "n_tokens", "cum_before")
      .collect().groupBy(_.getString(0)).values.map { rows =>
        val sorted = rows.sortBy(_.getLong(1))
        sorted.foldLeft((0L, true)) { case ((cum, ok), r) =>
          (cum + r.getLong(2), ok && r.getLong(3) == cum)
        }._2
      }
    assert(bad.forall(identity), "cum_before must be the per-source prefix sum")
  }
}
