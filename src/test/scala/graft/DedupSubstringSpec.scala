package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Substring-level dedup on PLANTED spans: the hash gate proves the
  * fixture corpus end to end; these pin the span semantics on hand-built
  * documents where the exact expected removal is known — cross-doc span
  * sharing, within-doc repetition, whole-doc duplication, and the
  * short-doc / clean-doc negatives. n = 4 keeps the examples readable;
  * the operator is length-agnostic. */
class DedupSubstringSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)], n: Int = 4): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Dedup.substringDedupDocs(docs.toDF("doc_id", "text"), n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("a span shared by two docs is removed from BOTH; unique context survives") {
    // span S = s1..s5 (5 tokens): its two 4-grams each repeat across docs,
    // so exactly S's tokens are covered in both documents
    val got = run(Seq(
      1L -> "a1 a2 a3 s1 s2 s3 s4 s5 a4 a5 a6",
      2L -> "b1 b2 s1 s2 s3 s4 s5 b3 b4 b5 b6 b7"))
    assert(got(1L) == ((11L, 5L, "a1 a2 a3 a4 a5 a6")))
    assert(got(2L) == ((12L, 5L, "b1 b2 b3 b4 b5 b6 b7")))
  }

  test("a WITHIN-doc repeated span is removed at both occurrences") {
    val got = run(Seq(
      3L -> "x1 x2 x3 x4 y x1 x2 x3 x4",
      4L -> "c1 c2 c3 c4 c5 c6"))
    assert(got(3L) == ((9L, 8L, "y")))
    assert(got(4L) == ((6L, 0L, "c1 c2 c3 c4 c5 c6")))
  }

  test("exact whole-doc duplicates empty out (clean_text = '', not null)") {
    val got = run(Seq(
      5L -> "z1 z2 z3 z4",
      6L -> "z1 z2 z3 z4"))
    assert(got(5L) == ((4L, 4L, "")))
    assert(got(6L) == ((4L, 4L, "")))
  }

  test("docs shorter than the span length are never touched") {
    val got = run(Seq(
      7L -> "w1 w2",
      8L -> "w1 w2"))  // identical, but only 2 tokens < n=4: no gram exists
    assert(got(7L) == ((2L, 0L, "w1 w2")))
    assert(got(8L) == ((2L, 0L, "w1 w2")))
  }

  test("overlapping repeats merge into one covered region (maximal-repeat " +
      "equivalence: a shared region longer than n is removed in full)") {
    // docs share a 7-token run; every 4-gram inside it repeats, coverage
    // must be the union [0..6] on doc 10's offsets 2..8
    val got = run(Seq(
      9L  -> "r1 r2 r3 r4 r5 r6 r7",
      10L -> "d1 d2 r1 r2 r3 r4 r5 r6 r7 d3"))
    assert(got(9L) == ((7L, 7L, "")))
    assert(got(10L) == ((10L, 7L, "d1 d2 d3")))
  }

  test("fixture gate query: removal mass matches the oracle-computed rate " +
      "and output covers every tokenized doc") {
    val out = Dedup.substringDedup(spark, sf).localCheckpoint()
    val n = out.count()
    val docs = Tables.documents(spark, sf).count()
    assert(n == docs, s"$n result rows for $docs docs")
    val removed = out.agg(sum("n_removed")).head.getLong(0)
    assert(removed > 0, "fixture has repeated spans; removal must be non-vacuous")
    // no doc removes more than it has
    assert(out.filter(col("n_removed") > col("n_tokens")).count() == 0)
  }

  test("plan shape: no cartesian product, no all-pairs join — duplicate " +
      "detection is groupBy-based") {
    val plan = Dedup.substringDedup(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "substring dedup must not cross-join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "substring dedup must not nested-loop join")
  }
}
