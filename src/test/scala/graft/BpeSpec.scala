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
