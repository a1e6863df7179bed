package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.unsafe.Platform

/** Compiled per-row kernels for the hashing-heavy dedup operators.
  *
  * Why UDFs here and built-ins everywhere else: Spark's higher-order array
  * functions (`transform`/`aggregate` with lambdas) are CodegenFallback —
  * every lambda application is interpreted with per-element boxing, which
  * measured ~30 ms/doc for the shingle+64-hash pipeline. A compiled JVM
  * loop does the same work in microseconds. This mirrors Spark MLlib's own
  * approach (HashingTF / MinHashLSH are UDF-based for exactly this
  * reason). The kernels are pure, deterministic, and per-row — they keep
  * the distributed dataflow (explode/join/aggregate) in DataFrame ops.
  *
  * Hashing uses xxhash64 (same algorithm family as the SQL `xxhash64`
  * built-in) via Spark's unsafe XXH64, seeded per family member. */
object TextKernels {

  private val Seed = 42L

  /** xxhash64 of a UTF-8 string. */
  private def hashString(s: String, seed: Long): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)
  }

  private def hashLong(v: Long, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, seed)

  private def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.split(" ").filter(_.nonEmpty)

  /** Distinct word n-gram shingles of a text. */
  def shingles(text: String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) Array.empty
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      seen.toArray(new Array[String](seen.size))
    }
  }

  /** MinHash signature: numHashes family members over the shingle set.
    * Family trick: hash each shingle string once, then derive member s via
    * a long re-hash — identical structure to the expression version, just
    * compiled. Returns null (→ filtered) when there are no shingles. */
  def minhashSignature(text: String, n: Int, numHashes: Int): Array[Long] =
    minhashTokens(shingles(text, n), numHashes)

  /** 64-bit SimHash: every token occurrence votes ±1 per bit of its
    * xxhash64; the sign vector is the fingerprint. Null on empty docs. */
  def simhash64(text: String): java.lang.Long = {
    val toks = tokenize(text)
    if (toks.isEmpty) null
    else {
      val votes = new Array[Int](64)
      var i = 0
      while (i < toks.length) {
        val h = hashString(toks(i), Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
      java.lang.Long.valueOf(fp)
    }
  }

  /** MinHash signature over a set of strings — the single family kernel:
    * minhashSignature feeds it shingles, the ngram-Jaccard big-block
    * escape path feeds it distinct tokens. Null (→ filtered) on an empty
    * set. */
  def minhashTokens(toks: Array[String], numHashes: Int): Array[Long] = {
    if (toks == null || toks.isEmpty) null
    else {
      val sig = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < toks.length) {
        val h1 = hashString(toks(i), Seed)
        var s = 0
        while (s < numHashes) {
          val hs = hashLong(h1, s)
          if (hs < sig(s)) sig(s) = hs
          s += 1
        }
        i += 1
      }
      sig
    }
  }

  private val DebugChecks = java.lang.Boolean.getBoolean("graft.debug.checks")

  /** Exact Jaccard of two DISTINCT string sets — the compiled replacement
    * for `size(array_intersect)/size(array_union)`, whose string-array
    * forms evaluate INTERPRETED (SQLOpenHashSet nullSafeEval) and were
    * measured dominating the near-dup verify stages at the 100× probe
    * (straggler tasks pinned in ArrayUnion.eval). Inputs are already
    * distinct (array_distinct / the shingle kernel's LinkedHashSet), so
    * |union| = |a|+|b|−|a∩b| and the double ratio is bit-identical to the
    * SQL form — the DuckDB oracles are unchanged. Null (→ dropped at the
    * threshold filter) on a null side or an empty union, matching
    * `when(uni > 0, inter/uni)`.
    *
    * The DISTINCT-input precondition is part of the name; under
    * `-Dgraft.debug.checks=true` (on in the test JVM) it is VERIFIED per
    * call — a duplicated input over-counts the intersection and
    * misestimates |union|, and that must fail loudly at the violating call
    * site rather than silently skew similarity scores (ADVICE r7). The
    * check costs one extra HashSet insert pass and is compiled out of the
    * hot path when the flag is unset (static final field). */
  def jaccardDistinct(a: Array[String], b: Array[String]): java.lang.Double = {
    if (a == null || b == null) null
    else {
      val set = new java.util.HashSet[String](math.max(4, a.length * 2))
      var i = 0
      while (i < a.length) { set.add(a(i)); i += 1 }
      if (DebugChecks) {
        require(set.size == a.length,
          s"jaccardDistinct: left input has ${a.length - set.size} duplicate tokens")
        val bs = new java.util.HashSet[String](math.max(4, b.length * 2))
        var k = 0
        while (k < b.length) { bs.add(b(k)); k += 1 }
        require(bs.size == b.length,
          s"jaccardDistinct: right input has ${b.length - bs.size} duplicate tokens")
      }
      var inter = 0
      var j = 0
      while (j < b.length) { if (set.contains(b(j))) inter += 1; j += 1 }
      val uni = a.length + b.length - inter
      if (uni == 0) null else java.lang.Double.valueOf(inter.toDouble / uni)
    }
  }

  val shingleUdf: UserDefinedFunction =
    udf((text: String, n: Int) => shingles(text, n))

  val jaccardUdf: UserDefinedFunction =
    udf((a: Seq[String], b: Seq[String]) => jaccardDistinct(
      if (a == null) null else a.toArray,
      if (b == null) null else b.toArray))

  val minhashTokensUdf: UserDefinedFunction =
    udf((toks: Seq[String], numHashes: Int) =>
      minhashTokens(if (toks == null) null else toks.toArray, numHashes))

  val minhashUdf: UserDefinedFunction =
    udf((text: String, n: Int, numHashes: Int) => minhashSignature(text, n, numHashes))

  val simhashUdf: UserDefinedFunction =
    udf((text: String) => simhash64(text))

  // -------------------------------------------------------------------
  // Rolling polynomial gram digests (the substring-dedup key kernel)
  // -------------------------------------------------------------------

  /** Mersenne prime 2⁶¹ − 1 — the classic rolling-hash modulus: mulmod
    * folds with shifts (2⁶⁴ ≡ 8), and mod-prime polynomial hashes have
    * the textbook ≤ (n−1)/p per-pair collision bound that power-of-two
    * moduli lack. */
  private val P61 = (1L << 61) - 1

  /** Two fixed odd bases < P61 (digits of π/e — nothing up the sleeve);
    * two independent evaluation points give a ~122-bit combined key. */
  private val B1 = 314159265358979323L
  private val B2 = 271828182845904523L

  private def mod61(x: Long): Long = { // x in [0, 2⁶³)
    val r = (x & P61) + (x >>> 61)
    if (r >= P61) r - P61 else r
  }

  /** (a·b) mod P61 for a, b ∈ [0, P61): the 122-bit product hi·2⁶⁴ + lo
    * folds as hi·8 + lo (2⁶⁴ ≡ 2³ mod P61); hi < 2⁵⁸ so hi·8 stays in a
    * long, and lo's top 3 bits ride in via the disjoint OR. */
  private def mulmod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val r = mod61((hi << 3) | (lo >>> 61)) + (lo & P61)
    if (r >= P61) r - P61 else r
  }

  private def powmod61(b: Long, e: Int): Long = {
    var r = 1L; var x = b; var k = e
    while (k > 0) {
      if ((k & 1) == 1) r = mulmod61(r, x)
      x = mulmod61(x, x); k >>= 1
    }
    r
  }

  /** Positioned length-`n` gram digests of a document in ONE O(len)
    * pass — the rolling-hash replacement for materializing each gram's
    * text (×n token bytes per position) before digesting it (VERDICT
    * r11 #4). Per token, one xxhash64 reduced mod P61; per window, the
    * standard Rabin–Karp recurrence d(s+1) = (d(s) − h_s·Bⁿ⁻¹)·B +
    * h_(s+n) at two independent evaluation points (d1, d2) — a ~122-bit
    * combined key, so the digest-equality contract matches the md5
    * paths' "identical modulo digest collisions" (callers that promise
    * collision-PROOF results re-materialize gram text for COLLIDING
    * digests only and confirm exactly). Element i of the result is the
    * digest pair of the gram starting at token position i; empty for
    * docs shorter than n tokens. */
  def gramDigests(text: String, n: Int): Array[(Long, Long)] = {
    val toks = tokenize(text)
    val m = toks.length - n + 1
    if (m <= 0) return Array.empty
    val h = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { h(i) = mod61(hashString(toks(i), Seed) >>> 2); i += 1 }
    val out = new Array[(Long, Long)](m)
    val bn1a = powmod61(B1, n - 1)
    val bn1b = powmod61(B2, n - 1)
    var d1 = 0L; var d2 = 0L
    i = 0
    while (i < n) {
      d1 = mod61(mulmod61(d1, B1) + h(i))
      d2 = mod61(mulmod61(d2, B2) + h(i))
      i += 1
    }
    out(0) = (d1, d2)
    var s = 1
    while (s < m) {
      val drop = h(s - 1)
      d1 = mod61(mulmod61(mod61(d1 + P61 - mulmod61(drop, bn1a)), B1) + h(s + n - 1))
      d2 = mod61(mulmod61(mod61(d2 + P61 - mulmod61(drop, bn1b)), B2) + h(s + n - 1))
      out(s) = (d1, d2)
      s += 1
    }
    out
  }

  /** UDF form, `n` bound at plan build: text → array<struct<_1,_2>> of
    * positioned digest pairs (posexplode upstream). */
  def gramDigestsUdf(n: Int): UserDefinedFunction =
    udf((text: String) => gramDigests(text, n))

  /** Gopher repetition statistics (Rae et al. 2021, table A1) — ALL
    * per-document, so the scale-right plan is this zero-shuffle compiled
    * pass, not the 5-shuffle explode/groupBy/window relational form the
    * DuckDB oracle uses. One tokenization, one hash map per n.
    *
    * Returns 10 longs:
    *   [0]    total characters (sum of token code-point lengths; spaces
    *          and other separators excluded — the denominators),
    *   [1..3] n = 2..4: characters covered by the MOST frequent n-gram
    *          (count × gram token chars; ties on count break to the
    *          LARGEST gram in UTF-8 binary order — the rule the oracle's
    *          `ORDER BY cnt DESC, gram DESC` reproduces),
    *   [4..9] n = 5..10: characters of tokens covered by any n-gram that
    *          occurs more than once in the document (interval-union
    *          coverage, chars counted once however many duplicated grams
    *          overlap them — the paper's "taking care not to count
    *          characters in overlapping n-grams more than once").
    * Documents shorter than n tokens contribute 0 for that n. */
  def gopherRepetition(text: String): Array[Long] = {
    val toks = tokenize(text)
    val m = toks.length
    val lens = new Array[Long](m)
    var i = 0
    var total = 0L
    while (i < m) {
      lens(i) = toks(i).codePointCount(0, toks(i).length).toLong
      total += lens(i); i += 1
    }
    val out = new Array[Long](10)
    out(0) = total
    var n = 2
    while (n <= 10) {
      if (m >= n) {
        val starts = m - n + 1
        val grams = new Array[String](starts)
        val counts = new java.util.HashMap[String, Int](starts * 2)
        var s = 0
        while (s < starts) {
          val sb = new java.lang.StringBuilder(toks(s))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(s + j)); j += 1 }
          val g = sb.toString
          grams(s) = g
          counts.merge(g, 1, Integer.sum)
          s += 1
        }
        if (n <= 4) {
          var bestG: String = null
          var bestC = 0
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue
            if (c > bestC ||
                (c == bestC && graft.ops.Corpus.utf8Compare(e.getKey, bestG) > 0)) {
              bestC = c; bestG = e.getKey
            }
          }
          // gram token chars = rendered code points minus the n-1 spaces
          val gchars = bestG.codePointCount(0, bestG.length).toLong - (n - 1)
          out(n - 1) = bestC.toLong * gchars
        } else {
          val covered = new Array[Boolean](m)
          var s2 = 0
          while (s2 < starts) {
            if (counts.get(grams(s2)) > 1) {
              var k = s2
              while (k < s2 + n) { covered(k) = true; k += 1 }
            }
            s2 += 1
          }
          var chars = 0L
          var k = 0
          while (k < m) { if (covered(k)) chars += lens(k); k += 1 }
          out(n - 1) = chars
        }
      }
      n += 1
    }
    out
  }

  val gopherRepetitionUdf: UserDefinedFunction =
    udf((text: String) => gopherRepetition(text))
}
