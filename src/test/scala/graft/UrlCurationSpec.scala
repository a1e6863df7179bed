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
      "HTTPS://WWW.Site3.Example.COM:443/a/5/?utm_campaign=x&id=5&ref=tw#s9")
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
    // params sorted; non-tracking 'refresh' key survives the 'ref' rule
    assert(UrlKernels.canonicalizeUrl("http://a.com/x?b=2&a=1&refresh=1") ==
      "http://a.com/x?a=1&b=2&refresh=1")
    assert(UrlKernels.canonicalizeUrl("http://a.com/x?ref=z&a=1") ==
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
