package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Dedup, EtlPipeline}
import graft.ops.EtlPipeline.NotAvailable

/** Property-based tests (SURVEY §5.3): algebraic laws of the reference's
  * core pipeline operators over generated small frames (raw ScalaCheck
  * generators, fixed seeds — the scalatest-scalacheck bridge is not in
  * the offline dependency cache). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample stream from a generator. */
  private def forAll[T](g: Gen[T], n: Int = 12)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val cell = Gen.oneOf("a", "b", "c", "1.0,2.0", NotAvailable, "")
  private val rowGen = for {
    d <- cell; l <- cell; r <- cell; z <- Gen.oneOf("1.0,2.0", NotAvailable)
  } yield (d, l, r, z)
  private val framesGen = for {
    a <- Gen.listOfN(6, rowGen); b <- Gen.listOfN(6, rowGen)
  } yield (a, b)

  private def df(rows: List[(String, String, String, String)]) =
    rows.toDF("direccion", "localidad", "rubro", "localizar")

  private def rowSet(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq).toSet

  test("HighWaterMarks: write/read round-trips arbitrary key strings " +
      "and the walk-back carries marks over unwritten epochs") {
    val keyGen = Gen.listOfN(4, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("a\tb", "c\nd", "s p a c e", "ünïcødé/источник", "",
        "%2F%09", "v3")))
    forAll(keyGen) { keys =>
      val root = java.nio.file.Files
        .createTempDirectory("graft-hwm-prop").toString
      try {
        val m0 = keys.distinct.zipWithIndex
          .map { case (k, i) => k -> (i * 7L - 3L) }.toMap
        graft.tools.HighWaterMarks.write(root, 0L, m0)
        assert(graft.tools.HighWaterMarks.readAsOf(root, 0L) == m0)
        // epoch 3 written, 1-2 skipped: readAsOf walks back correctly
        val m3 = m0.map { case (k, v) => k -> (v + 100L) }
        graft.tools.HighWaterMarks.write(root, 3L, m3)
        assert(graft.tools.HighWaterMarks.readAsOf(root, 2L) == m0)
        assert(graft.tools.HighWaterMarks.readAsOf(root, 9L) == m3)
        // nothing at or below an epoch before the first write
        assert(graft.tools.HighWaterMarks.readAsOf(root, -1L).isEmpty)
      } finally graft.tools.TempDirs.deleteRecursively(root)
    }
  }

  test("union+dedup is commutative in the set of rows") {
    forAll(framesGen) { case (a, b) =>
      val ab = df(a).unionByName(df(b)).dropDuplicates()
      val ba = df(b).unionByName(df(a)).dropDuplicates()
      assert(rowSet(ab) == rowSet(ba))
    }
  }

  test("dedup is idempotent") {
    forAll(Gen.listOfN(8, rowGen)) { rows =>
      val once = df(rows).dropDuplicates()
      val twice = once.dropDuplicates()
      assert(rowSet(once) == rowSet(twice))
      assert(once.count() == twice.count())
    }
  }

  test("enrichment preserves row count and all non-target columns") {
    forAll(framesGen) { case (a, b) =>
      val deduped = df(a).unionByName(df(b)).dropDuplicates()
      val out = EtlPipeline.combineAndEnrich(df(a), df(b),
        EtlPipeline.mockGeocoder, spark)
      assert(out.count() == deduped.count())
      assert(rowSet(out.select("direccion", "localidad", "rubro")) ==
        rowSet(deduped.select("direccion", "localidad", "rubro")))
      // rows that had coordinates pass through byte-identical
      assert(rowSet(out.filter($"localizar" =!= NotAvailable &&
          $"localizar".isNotNull).select("localizar"))
        .subsetOf(rowSet(deduped.select("localizar")) ++
          rowSet(out.select("localizar"))))
    }
  }

  test("minhash jaccard is symmetric and bounded in [0, 1]") {
    val texts = Gen.listOfN(4, Gen.listOfN(12,
      Gen.oneOf("x", "y", "z", "w", "v")).map(_.mkString(" ")))
    forAll(texts, n = 6) { ts =>
      if (ts.nonEmpty) {
        val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
        ts.zipWithIndex.map { case (t, i) =>
          (i.toLong, t, "en", "s", t.length.toLong)
        }.toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val pairs = Dedup.minhash(spark, dir, jaccardThreshold = 0.0)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        pairs.foreach { case (a, b, j) =>
          assert(a < b && j >= 0.0 && j <= 1.0)
        }
      }
    }
  }

  test("probeSigs enumerates exactly the Hamming<=d ball, distinct") {
    import graft.functions.VectorKernels
    import graft.ops.Similarity
    forAll(Gen.zip(Gen.chooseNum(0L, 1L << 14), Gen.chooseNum(4, 14)), n = 20) {
      case (sig0, bits) =>
        val sig = sig0 & ((1L << bits) - 1)
        for (d <- 0 to 2) {
          val probes = VectorKernels.probeSigs(sig, bits, d)
          assert(probes.length == Similarity.probeCount(bits, d),
            s"probe count mismatch at bits=$bits d=$d")
          assert(probes.distinct.length == probes.length, "duplicate probes")
          probes.foreach { p =>
            assert(java.lang.Long.bitCount(p ^ sig) <= d, "probe outside ball")
          }
        }
    }
  }

  test("redaction is idempotent and the split partitions every document") {
    val sf001 = "/root/testdata/sf0.001"
    // scrub twice == scrub once (placeholders contain nothing redactable)
    val once = graft.ops.TextAnalysis.redact(spark, sf001)
      .select("doc_id", "redacted").collect().map(_.toSeq)
    val pats = Seq("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "[0-9]+")
    once.foreach { r =>
      val t = r(1).asInstanceOf[String]
      pats.foreach(p => assert(!p.r.findFirstIn(t).isDefined,
        s"redacted text still matches $p"))
    }
    // corpus_split: every document appears exactly once, with a valid tag
    val split = graft.ops.Corpus.splitTrainValTest(spark, sf001).collect()
    val ids = split.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    assert(ids.length == graft.Tables.documents(spark, sf001).count())
    assert(split.forall(r => Set("train", "val", "test")(r.getString(2))))
  }

  test("deletion-neighborhood keys are complete for edit distance 1") {
    // property: any two words within 1 edit share at least one key from
    // {word} ∪ {word minus one char} — the exactness claim dedup_fuzzy's
    // candidate generation rests on
    def keys(s: String): Set[String] =
      Set(s) ++ s.indices.map(i => s.take(i) + s.drop(i + 1))
    val base = Gen.listOfN(6, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    forAll(base) { w =>
      val variants =
        w.indices.map(i => w.updated(i, 'z')) ++                  // substitution
        (0 to w.length).map(i => w.take(i) + "z" + w.drop(i)) ++  // insertion
        w.indices.map(i => w.take(i) + w.drop(i + 1))             // deletion
      variants.foreach { v =>
        assert(keys(w).intersect(keys(v)).nonEmpty,
          s"'$w' vs '$v': no shared deletion key despite distance <= 1")
      }
    }
  }

  test("canonicalizeUrl is idempotent and its output carries no junk " +
      "(generated URL-ish inputs)") {
    import graft.functions.UrlKernels.canonicalizeUrl
    val scheme = Gen.oneOf("http://", "https://", "HTTPS://", "ftp://", "")
    val host = Gen.oneOf("A.com", "www.b.org", "WWW.C.D.com", "x.io")
    val port = Gen.oneOf("", ":80", ":443", ":8080")
    val path = Gen.oneOf("", "/", "/P/q", "/a//b/", "/CaseSensitive")
    val par = Gen.oneOf("a=1", "utm_x=9", "ref=br", "ref_src=tw",
      "gclid=g", "b=2", "", "flag")
    val query = Gen.listOfN(3, par).map { ps =>
      val s = ps.filter(_.nonEmpty).mkString("&")
      if (s.isEmpty) "" else "?" + s
    }
    val frag = Gen.oneOf("", "#sec", "#")
    val urlGen = for {
      s <- scheme; h <- host; po <- port; pa <- path; q <- query; f <- frag
    } yield s + h + po + pa + q + f
    forAll(urlGen, n = 60) { u =>
      val c1 = canonicalizeUrl(u)
      assert(c1 != null, s"null canon for '$u'")
      // idempotence: the canonical form is a fixed point — re-ingesting
      // already-canonical URLs (a crawl re-seeded from its own frontier)
      // must not move digests
      assert(canonicalizeUrl(c1) == c1, s"'$u' -> '$c1' not a fixed point")
      // no junk survives: fragment, tracking keys, www., default port
      assert(!c1.contains("#"), s"fragment in '$c1'")
      assert(!c1.matches(".*[?&](utm_[^=&]*|fbclid|gclid|ref_src|mc_cid|mc_eid)(=|&|$).*"),
        s"tracking key in '$c1'")
      assert(!c1.contains("://www."), s"www. in '$c1'")
      // query params sorted (codepoint order)
      val qi = c1.indexOf('?')
      if (qi >= 0) {
        val ps = c1.substring(qi + 1).split("&").toSeq
        assert(ps == ps.sorted, s"unsorted params in '$c1'")
      }
    }
  }

  test("adaptiveLshBits is monotone in n and meets the scan-fraction target") {
    import graft.ops.Similarity
    val ns = Seq(10L, 100L, 1000L, 10000L, 1000000L, 1000000000L)
    val bits = ns.map(Similarity.adaptiveLshBits(_))
    assert(bits == bits.sorted, s"bits not monotone: $bits")
    ns.zip(bits).foreach { case (n, b) =>
      val frac = Similarity.LshTables.toDouble *
        Similarity.probeCount(b, Similarity.LshProbes) / math.pow(2.0, b)
      assert(frac <= 0.03 + 1e-12, f"n=$n bits=$b fraction $frac%.4f > target")
      assert(b >= (64 - java.lang.Long.numberOfLeadingZeros(n)),
        s"n=$n bits=$b below occupancy floor")
    }
  }
}
