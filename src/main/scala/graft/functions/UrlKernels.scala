package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Compiled per-row URL canonicalization kernels — the curation stage a
  * web-scale pipeline runs BEFORE any text pass (URL-level exact dedup
  * and per-domain caps need a canonical form first; FineWeb/CCNet both
  * canonicalize-then-dedup at the URL level).
  *
  * Why a compiled kernel and not built-ins: the query-parameter step
  * (split on '&', drop tracking params, SORT, rejoin) needs
  * `filter`/`array_sort` higher-order lambdas, which are CodegenFallback
  * in Spark 4 — the interpreted per-element-boxing trap TextKernels
  * documents (~100× measured on the shingle kernels). The kernel is
  * pure, deterministic, per-row, and allocation-light; the distributed
  * dataflow (digest group-by, two-level rank) stays in DataFrame ops.
  *
  * Canonicalization spec (mirrored by the DuckDB oracle SQL in
  * [[graft.ops.UrlCuration]]; ASCII-only inputs by construction there):
  *   1. null/blank → null; input trimmed.
  *   2. Fragment dropped (everything from the first '#').
  *   3. Scheme lowercased; absent scheme ⇒ "http" (kernel robustness —
  *      the planted oracle corpus always carries one).
  *   4. Authority lowercased; leading "www." stripped; default port
  *      stripped (":80" under http, ":443" under https).
  *   5. Path kept case-sensitive; trailing '/'s stripped.
  *   6. Query split on '&'; empty params dropped; tracking params
  *      dropped (key "utm_*" prefix or exactly one of fbclid, gclid,
  *      ref_src, mc_cid, mc_eid); remainder SORTED (codepoint
  *      order = DuckDB list_sort on ASCII) and rejoined with '&'.
  *
  * Bare `ref` is deliberately NOT a tracking key (precision over
  * recall): unlike utm_* / gclid / fbclid it is commonly load-bearing —
  * GitHub's `?ref=branch` selects the content served — so stripping it
  * collapses distinct real pages into one canonical URL and the dedup
  * then WRONGLY drops them; a missed social-share duplicate is
  * recoverable by the content tiers (minhash/simhash run after URL
  * dedup in the funnel), an over-merge is data loss. `ref_src` stays:
  * it is Twitter's share-attribution key with no known content-routing
  * use.
  */
object UrlKernels {

  private val TrackingKeys =
    Set("fbclid", "gclid", "ref_src", "mc_cid", "mc_eid")

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val key = if (eq >= 0) param.substring(0, eq) else param
    key.startsWith("utm_") || TrackingKeys(key)
  }

  private def schemeValid(s: String): Boolean =
    s.nonEmpty && s.head.isLetter &&
      s.forall(c => c.isLetterOrDigit || c == '+' || c == '.' || c == '-')

  /** Canonical form of a URL per the object-level spec; null-in/null-out. */
  def canonicalizeUrl(raw: String): String = {
    if (raw == null) return null
    var s = raw.trim
    if (s.isEmpty) return null
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    val si = s.indexOf("://")
    var scheme = "http"
    var rest = s
    if (si > 0 && schemeValid(s.substring(0, si))) {
      scheme = s.substring(0, si).toLowerCase
      rest = s.substring(si + 3)
    }
    val qi = rest.indexOf('?')
    val (beforeQ, query) =
      if (qi >= 0) (rest.substring(0, qi), rest.substring(qi + 1))
      else (rest, "")
    val pi = beforeQ.indexOf('/')
    var auth =
      (if (pi >= 0) beforeQ.substring(0, pi) else beforeQ).toLowerCase
    var path = if (pi >= 0) beforeQ.substring(pi) else ""
    if (auth.startsWith("www.")) auth = auth.substring(4)
    if (scheme == "http" && auth.endsWith(":80"))
      auth = auth.substring(0, auth.length - 3)
    if (scheme == "https" && auth.endsWith(":443"))
      auth = auth.substring(0, auth.length - 4)
    var pEnd = path.length
    while (pEnd > 0 && path.charAt(pEnd - 1) == '/') pEnd -= 1
    path = path.substring(0, pEnd)
    val kept = query.split("&").filter(p => p.nonEmpty && !isTracking(p))
    java.util.Arrays.sort(kept.asInstanceOf[Array[AnyRef]])
    scheme + "://" + auth + path +
      (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
  }

  /** The registrable domain column: the canonical form's authority (host,
    * default port already stripped). Null-in/null-out. */
  def urlDomain(raw: String): String = {
    val c = canonicalizeUrl(raw)
    if (c == null) return null
    val si = c.indexOf("://")
    val rest = c.substring(si + 3)
    var end = 0
    while (end < rest.length && rest.charAt(end) != '/' &&
      rest.charAt(end) != '?') end += 1
    rest.substring(0, end)
  }

  val canonicalizeUrlUdf: UserDefinedFunction = udf(canonicalizeUrl _)
  val urlDomainUdf: UserDefinedFunction = udf(urlDomain _)
}
