package graft

import graft.functions.UrlKernels
import graft.ops.UrlCuration

/** URL canonicalization kernel + curation operators. The hash gate
  * (text_url_canon / text_url_dedup / corpus_domain_cap vs DuckDB)
  * covers the planted corpus; these specs pin the kernel's edge cases
  * the oracle corpus never exercises (no scheme, explicit default
  * ports, bare host, null) and the operator-level invariants. */
class UrlCurationSpec extends SparkSpec {

  test("canonicalizeUrl: full junk removal on a kitchen-sink URL") {
    assert(UrlKernels.canonicalizeUrl(
      "HTTPS://WWW.Site3.Example.COM:443/a/5/?utm_campaign=x&id=5&ref_src=tw#s9")
      == "https://site3.example.com/a/5?id=5")
  }

  test("canonicalizeUrl: edge cases outside the oracle corpus") {
    // no scheme → http assumed
    assert(UrlKernels.canonicalizeUrl("www.Foo.com/Bar") ==
      "http://foo.com/Bar")
    // path case preserved; only host lowercased
    assert(UrlKernels.canonicalizeUrl("http://A.com/CaseSensitive") ==
      "http://a.com/CaseSensitive")
    // default port stripped only when it matches the scheme
    assert(UrlKernels.canonicalizeUrl("http://a.com:80/x") ==
      "http://a.com/x")
    assert(UrlKernels.canonicalizeUrl("http://a.com:443/x") ==
      "http://a.com:443/x")
    assert(UrlKernels.canonicalizeUrl("https://a.com:8080/x") ==
      "https://a.com:8080/x")
    // params sorted; non-tracking 'refresh' key survives the ref_src rule
    assert(UrlKernels.canonicalizeUrl("http://a.com/x?b=2&a=1&refresh=1") ==
      "http://a.com/x?a=1&b=2&refresh=1")
    // bare 'ref' is LOAD-BEARING (GitHub ?ref=branch) — kept, not junk;
    // ref_src (share attribution) is stripped
    assert(UrlKernels.canonicalizeUrl("http://a.com/x?ref=z&a=1") ==
      "http://a.com/x?a=1&ref=z")
    assert(UrlKernels.canonicalizeUrl("http://a.com/x?ref_src=z&a=1") ==
      "http://a.com/x?a=1")
    // empty query after tracking removal → no '?'
    assert(UrlKernels.canonicalizeUrl("http://a.com/x?utm_source=a&gclid=b")
      == "http://a.com/x")
    // bare host, trailing slashes
    assert(UrlKernels.canonicalizeUrl("http://a.com///") == "http://a.com")
    assert(UrlKernels.canonicalizeUrl(null) == null)
    assert(UrlKernels.canonicalizeUrl("  ") == null)
  }

  test("urlDomain: canonical authority") {
    assert(UrlKernels.urlDomain(
      "HTTPS://WWW.Site0.Example.COM:443/a/0?id=0") == "site0.example.com")
    assert(UrlKernels.urlDomain("http://a.com") == "a.com")
    assert(UrlKernels.urlDomain(null) == null)
  }

  test("urlDedup: each planted 4-doc group collapses to its min doc_id") {
    val out = UrlCuration.urlDedup(spark, sf).collect()
    val byUrl = out.groupBy(_.getString(1))
    byUrl.foreach { case (_, rows) =>
      val keepers = rows.filter(_.getBoolean(2)).map(_.getLong(0))
      assert(keepers.length == 1)
      assert(keepers.head == rows.map(_.getLong(0)).min)
    }
    // planted construction: groups of exactly 4 consecutive ids (last
    // group may be smaller), so survivors ≈ 1/4 of the corpus
    assert(byUrl.forall(_._2.length <= 4))
    assert(out.count(_.getBoolean(2)) == byUrl.size)
  }

  test("urlDedupIncremental == full rebuild at a mid-group split; " +
      "history decisions immutable") {
    val full = UrlCuration.urlDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val incr = UrlCuration.urlDedupIncremental(spark, sf, splitId = 302)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(incr.toSeq == full.toSeq)
  }

  test("urlDedupStream: cross-epoch duplicate defers to the history " +
      "winner; within-batch min wins; replay idempotent; fold == batch") {
    import spark.implicits._
    val statePath =
      java.nio.file.Files.createTempDirectory("graft-urlstream-spec")
        .toString + "/state"
    try {
      def b(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "url")
      def res() = spark.read.parquet(graft.tools.LogState.pathsAsOf(
          s"$statePath/results", Long.MaxValue): _*)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      // epoch 0: two junk-variants of one URL + one distinct
      UrlCuration.urlDedupStreamApplyBatch(
        b(1L -> "HTTP://WWW.A.com/x?utm_source=z&q=1",
          2L -> "http://a.com/x/?q=1#frag",
          3L -> "http://b.com/y"), 0L, statePath, compactEvery = 2)
      assert(res() == Map(1L -> true, 2L -> false, 3L -> true))
      // epoch 1: another variant of the epoch-0 URL (must defer to the
      // HISTORY winner) + a fresh one
      UrlCuration.urlDedupStreamApplyBatch(
        b(4L -> "http://a.com/x?q=1&gclid=g", 5L -> "http://c.com/z"),
        1L, statePath, compactEvery = 2)
      val r1 = res()
      assert(r1 == Map(1L -> true, 2L -> false, 3L -> true,
        4L -> false, 5L -> true))
      // at-least-once replay of the last epoch: identical state
      UrlCuration.urlDedupStreamApplyBatch(
        b(4L -> "http://a.com/x?q=1&gclid=g", 5L -> "http://c.com/z"),
        1L, statePath, compactEvery = 2)
      assert(res() == r1, "replayed epoch must rewrite identical state")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("domainCapStream: fold == batch on the planted corpus; " +
      "later smaller-md5 arrival DISPLACES an earlier winner; " +
      "replay idempotent") {
    import spark.implicits._
    val batch = UrlCuration.domainCap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val stream = UrlCuration.domainCapStream(spark, sf, epochs = 4)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(stream.toSeq == batch.toSeq)
    // displacement at k=1: md5("4") < md5("1") < md5("2"), so doc 1 wins
    // epoch 0, doc 4 (arriving later) must evict it; doc 2 never wins
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-domcap-spec").toString + "/state"
    try {
      def b(ids: Long*) = ids.toSeq
        .map(i => (i, s"http://d.example.com/p$i")).toDF("doc_id", "url")
      UrlCuration.domainCapStreamApplyBatch(b(1L, 2L), 0L, statePath,
        k = 1, compactEvery = 2)
      val r0 = UrlCuration.domainCapStreamReport(spark, statePath, 0L,
        k = 1).get.collect().map(r => (r.getLong(0), r.getLong(2),
        r.getLong(3))).toSeq
      assert(r0 == Seq((1L, 1L, 2L)), s"epoch-0 report: $r0")
      UrlCuration.domainCapStreamApplyBatch(b(4L), 1L, statePath,
        k = 1, compactEvery = 2)
      val r1 = UrlCuration.domainCapStreamReport(spark, statePath, 1L,
        k = 1).get.collect().map(r => (r.getLong(0), r.getLong(2),
        r.getLong(3))).toSeq
      assert(r1 == Seq((4L, 1L, 3L)),
        s"doc 4 must displace doc 1, n_domain 3: $r1")
      // at-least-once replay of the last epoch: identical report
      UrlCuration.domainCapStreamApplyBatch(b(4L), 1L, statePath,
        k = 1, compactEvery = 2)
      val r2 = UrlCuration.domainCapStreamReport(spark, statePath, 1L,
        k = 1).get.collect().map(r => (r.getLong(0), r.getLong(2),
        r.getLong(3))).toSeq
      assert(r2 == r1, s"replay changed the report: $r2 vs $r1")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("domainCap: at most K per domain, ranks contiguous from 1, " +
      "n_domain is the stratum total") {
    val out = UrlCuration.domainCap(spark, sf).collect()
    val byDom = out.groupBy(_.getString(1))
    byDom.foreach { case (_, rows) =>
      assert(rows.length <= UrlCuration.DomainCapK)
      assert(rows.map(_.getLong(2)).sorted.toSeq ==
        (1L to rows.length).toSeq)
      assert(rows.map(_.getLong(3)).distinct.length == 1)
    }
    assert(byDom.keySet.forall(_.matches("site[0-6]\\.example\\.com")))
  }
}
