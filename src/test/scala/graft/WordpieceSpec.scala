package graft

import graft.ops.Corpus

/** WordPiece trainer invariants: likelihood-gain argmax (not raw pair
  * count), '##' continuation convention, incremental symbol-count
  * maintenance, and the two-engine equality the BPE trainer pins. */
class WordpieceSpec extends SparkSpec {

  test("hand-checked corpus: score argmax prefers rare-symbol pairs, " +
      "ties fall to pair count then UTF-8 order, '##' folds on merge") {
    // corpus: "low" x3 + "lower" x1.
    // w0: low -> [l,##o,##w] (3), lower -> [l,##o,##w,##e,##r] (1)
    // syms: l:4, ##o:4, ##w:4, ##e:1, ##r:1
    // r1 scores: (l,##o) 4/16, (##o,##w) 4/16, (##w,##e) 1/4,
    //            (##e,##r) 1/1 = 1.0 -> the RARE pair wins (pure BPE
    //            would have picked (l,##o) at count 4) -> "##er"
    // r2: all three remaining pairs score 1/4 exactly -> tie ->
    //     count 4 beats 1, "##o" < "l" in UTF-8 -> (##o,##w) -> "##ow"
    // r3: (l,##ow) 4/16 ties (##ow,##er) 1/4 -> count -> "low"
    // r4: (low,##er) 1/4 -> "lower"; r5: no pairs -> stop at 4 rules
    import spark.implicits._
    val docs = Seq((1L, "low low lower low")).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "length(text) AS n_chars")
    val tmp = graft.tools.TempDirs.createFast("graft-wp-spec")
    try {
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val merges = Corpus.wordpieceMerges(spark, tmp).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      assert(merges.toSeq == Seq(
        (1, "##e", "##r", "##er", 1L, 1L, 1L),
        (2, "##o", "##w", "##ow", 4L, 4L, 4L),
        (3, "l", "##ow", "low", 4L, 4L, 4L),
        (4, "low", "##er", "lower", 1L, 4L, 1L)),
        s"got ${merges.toSeq}")
      // round 4 merged lower completely, so both types are single pieces
      val toks = Corpus.tokenizeWordpiece(spark, tmp).collect()
      assert(toks.length == 1)
      assert(toks.head.getString(1) == "low low lower low")
      assert(toks.head.getLong(2) == 4L)
    } finally graft.tools.TempDirs.deleteRecursively(tmp)
  }

  test("in-memory training equals the distributed per-round loop " +
      "bitwise: merge table AND final word symbols") {
    import org.apache.spark.sql.functions.col
    val (dmt, dw) = Corpus.wordpieceTrainUncached(spark, sf,
      merges = Corpus.WordpieceMerges, localTypeBudget = 0L)
    val (lmt, lw) = Corpus.wordpieceTrainUncached(spark, sf,
      merges = Corpus.WordpieceMerges)
    def mt(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .sortBy(_._1).toSeq
    assert(mt(dmt) == mt(lmt))
    def ws(df: org.apache.spark.sql.DataFrame) =
      df.select(col("word"), col("cnt"), col("syms")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2).toList))
        .sortBy(_._1).toSeq
    assert(ws(dw) == ws(lw),
      "final word representations must match across engines")
  }

  test("greedyMergeSym folds the merged symbol, not l+r") {
    assert(Corpus.greedyMergeSym(Seq("a", "##b", "##c"), "a", "##b", "ab")
      == Seq("ab", "##c"))
    assert(Corpus.greedyMergeSym(Seq("ab", "##c"), "ab", "##c", "abc")
      == Seq("abc"))
    // no match -> unchanged
    assert(Corpus.greedyMergeSym(Seq("x", "##y"), "a", "##b", "ab")
      == Seq("x", "##y"))
  }
}
