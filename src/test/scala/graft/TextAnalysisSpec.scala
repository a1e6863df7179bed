package graft

import graft.ops.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-text").toString
    rows.toSeq.map { case (id, t, lang) => (id, t, lang, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("wordcount handles repeated separators and counts exactly") {
    val dir = docs((1L, "a b  b   c", "en"), (2L, "b", "en"))
    val counts = TextAnalysis.wordCount(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 1L, "b" -> 3L, "c" -> 1L))
  }

  test("quality score: stopword ratio and mean token length") {
    val dir = docs((1L, "the cat sat", "en"))
    val r = TextAnalysis.qualityScore(spark, dir).collect().head
    assert(r.getLong(1) == 3)                            // n_tokens
    assert(math.abs(r.getDouble(2) - 1.0 / 3) < 1e-12)   // "the" of 3
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-12)       // (3+3+3)/3
  }

  test("polynomial fingerprint matches a hand-rolled hash") {
    val text = "ab c"
    def poly(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007)
    val dir = docs((1L, text, "en"))
    val r = TextAnalysis.fingerprint(spark, dir).collect().head
    assert(r.getLong(1) == poly(text))
    assert(r.getString(2) == java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("language ID votes on marker stopwords with fixed tie priority") {
    val dir = docs(
      (1L, "el perro y la casa de que", "es"),
      (2L, "the dog and of to", "en"),
      (3L, "xyz qqq www", "zh"))
    val out = TextAnalysis.langId(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(out(1L) == "es" && out(2L) == "en" && out(3L) == "und")
  }

  test("bigrams preserve order and multiplicity") {
    val dir = docs((1L, "a b a b", "en"))
    val counts = TextAnalysis.bigrams(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a b" -> 2L, "b a" -> 1L))
  }

  test("multimodal decode stub: per-partition batch, deterministic features") {
    val dir = docs((6L, "abc", "en")) // doc_id 6 → png, width 7, height 7
    val r = Multimodal.extractFeatures(spark, dir).collect().head
    assert(r.getLong(0) == 6L && r.getString(1) == "png" && r.getInt(2) == 3)
    assert(r.getDouble(3) == math.rint(('a' + 'b' + 'c') / 3.0 * 10000) / 10000)
  }

  test("real PNG round-trip: decode(encode(x)) is pixel-exact, resize real") {
    // the image path uses the JDK's actual PNG codec — lossless, so the
    // decoded raster must equal the generated ground-truth pixels exactly
    for (id <- Seq(0L, 7L, 255L)) {
      val (w, h) = ((id % 16 + 4).toInt, (id % 12 + 4).toInt)
      val img = Multimodal.decodePng(Multimodal.encodePng(id, w, h))
      assert(img.getWidth == w && img.getHeight == h)
      val got = img.getRGB(0, 0, w, h, null, 0, w)
      assert(got.toSeq == Multimodal.syntheticPixels(id, w, h).toSeq,
        s"PNG round-trip not pixel-exact for id=$id")
      val half = Multimodal.resizeNearest(img, w / 2, h / 2)
      assert(half.getWidth == w / 2 && half.getHeight == h / 2)
      // nearest-neighbor: every output pixel is some input pixel
      val src = got.toSet
      val hp = half.getRGB(0, 0, w / 2, h / 2, null, 0, w / 2)
      assert(hp.forall(src.contains), "resize invented pixel values")
    }
    // PNG container bytes are real (zlib-compressed, magic header) — the
    // byte length lives here, not in the oracled projection, because the
    // oracle cannot regenerate zlib output
    val png = Multimodal.encodePng(3L, 7, 7)
    assert(png.length > 8 &&
      (png(1) & 0xff) == 'P' && (png(2) & 0xff) == 'N' && (png(3) & 0xff) == 'G')
    val rows = Multimodal.decodeReal(spark, docs((3L, "x", "en"))).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getInt(1) == 7 && r.getInt(2) == 7) // id 3 → 3%16+4 × 3%12+4
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 255.0)
    // the emitted mean is the exact integer-sum mean of the decoded raster
    val full = Multimodal.decodePng(png)
    assert(r.getDouble(3) == Multimodal.lumSum(full).toDouble / (3.0 * 7 * 7))
  }

  test("dHash: replicas bit-identical, distinct rasters far apart, " +
      "invariant under 2x nearest-neighbor upscale") {
    def fpOf(seed: Long, w: Int = 18, h: Int = 16): Long =
      Multimodal.dHash(Multimodal.decodePng(
        Multimodal.encodePngPixels(Multimodal.scrambledPixels(seed, w, h), w, h)))
    // same raster → same fingerprint (the gate's replica claim)
    assert(fpOf(7L) == fpOf(7L))
    // distinct scrambled rasters: Hamming ≈ 32 of 64 — nowhere near the
    // banding threshold (checked pairwise over a handful of seeds)
    val fps = (0L until 8L).map(fpOf(_))
    for (i <- fps.indices; j <- fps.indices if i < j) {
      val d = java.lang.Long.bitCount(fps(i) ^ fps(j))
      assert(d > 10, s"seeds $i,$j unexpectedly close: Hamming $d")
    }
    // the perceptual property: a 2x nearest-neighbor upscale samples the
    // same source pixels at the 9x8 grid, so the fingerprint is unchanged
    val img = Multimodal.decodePng(
      Multimodal.encodePngPixels(Multimodal.scrambledPixels(5L, 18, 16), 18, 16))
    val up = Multimodal.resizeNearest(img, 36, 32)
    assert(Multimodal.dHash(up) == Multimodal.dHash(img),
      "dHash must survive a lossless upscale")
  }

  test("audioHash: replicas bit-identical, distinct PCM far apart, " +
      "invariant under sample duplication") {
    def fpOf(seed: Long, n: Int = 650): Long =
      Multimodal.audioHash(Multimodal.decodeWav(
        Multimodal.encodeWav(Multimodal.scrambledPcm(seed, n))))
    assert(fpOf(7L) == fpOf(7L))
    val fps = (0L until 8L).map(fpOf(_))
    for (i <- fps.indices; j <- fps.indices if i < j) {
      val d = java.lang.Long.bitCount(fps(i) ^ fps(j))
      assert(d > 10, s"seeds $i,$j unexpectedly close: Hamming $d")
    }
    // the perceptual property: duplicating every sample (a 2x
    // "resample") doubles each window's energy — windows align exactly
    // because 65 divides 650 — preserving all gradient signs
    val pcm = Multimodal.scrambledPcm(5L, 650)
    val doubled = pcm.flatMap(s => Array(s, s))
    assert(Multimodal.audioHash(doubled) == Multimodal.audioHash(pcm),
      "audioHash must survive sample duplication")
  }

  test("mm_dedup_audiohash_stream: survivors equal the planted keep-first " +
      "set; replaying the last epoch rewrites identical state") {
    // The gate's claim end-to-end: four id-range WAV batches through the
    // fingerprint-generic stream core keep exactly the first copy of
    // each PCM family plus the uniques.
    val surv = Multimodal.audioHashStreamClustered(spark, "")
      .collect().map(_.getLong(0)).toSet
    assert(surv == ((0L until 40L) ++ (120L until 140L)).toSet,
      s"audio stream survivors wrong: ${surv.size} ids")
    // replay idempotence of the shared core under the AUDIO feed: apply
    // epoch 1 twice — folded survivors must not change (epoch-keyed
    // overwrite, derived from state < batchId only).
    import spark.implicits._
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-audiostream-spec").toString + "/state"
    try {
      val fps = spark.range(0, 20).as[Long]
        .map { id =>
          val seed = if (id < 10) id % 5 else 100L + id
          (id, Multimodal.audioHash(Multimodal.decodeWav(
            Multimodal.encodeWav(Multimodal.scrambledPcm(seed, 650)))))
        }
        .toDF("doc_id", "fp").localCheckpoint()
      val b0 = fps.filter("doc_id < 10")
      val b1 = fps.filter("doc_id >= 10")
      graft.ops.Dedup.fingerprintStreamApplyBatch(b0, 0L, statePath,
        compactEvery = 2)
      graft.ops.Dedup.fingerprintStreamApplyBatch(b1, 1L, statePath,
        compactEvery = 2)
      def surv1() = spark.read.parquet(graft.tools.LogState.pathsAsOf(
          s"$statePath/survivors", 1L): _*)
        .collect().map(_.getLong(0)).toSet
      val first = surv1()
      graft.ops.Dedup.fingerprintStreamApplyBatch(b1, 1L, statePath,
        compactEvery = 2)
      assert(surv1() == first, "replay changed the audio survivor fold")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("pipeline_curation: stage chain is monotone where it must be, " +
      "planned tokens respect the mix arithmetic, pack covers mix tokens") {
    val rows = TextAnalysis.curationPipeline(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val stages = Seq("00_total", "01_url", "02_lang", "03_quality",
      "04_repetition", "05_dedup", "06_decontam", "07_dsir",
      "08_domain_cap", "09_mix", "10_pack")
    assert(rows.keySet == stages.toSet, s"stages: ${rows.keySet}")
    // docs are non-increasing through the selection stages 00..08
    val docCounts = stages.take(9).map(rows(_)._1)
    assert(docCounts.zip(docCounts.tail).forall { case (a, b) => b <= a },
      s"doc attrition not monotone: $docCounts")
    // decontamination can only REMOVE tokens from the s5 survivors
    assert(rows("06_decontam")._2 <= rows("05_dedup")._2)
    // something must survive the whole funnel on the fixture corpus
    assert(rows("08_domain_cap")._1 > 0, "pipeline killed the whole corpus")
    // mix plans over exactly the stage-8 corpus: planned tokens are
    // >= one full pass for any language whose target >= pool, and the
    // pack row packs exactly the planned tokens
    assert(rows("09_mix")._2 == rows("10_pack")._2)
    // sequences cover the planned tokens at seqLen 64: n_seqs is within
    // one sequence per source of planned/64
    val (nSeqs, planned) = rows("10_pack")
    assert(nSeqs >= (planned + 63) / 64 / 5 && nSeqs <= planned / 64 + 5,
      s"n_seqs $nSeqs vs planned $planned")
  }

  test("mm_dedup_video_clustered: replica pairs with closed-form aligned " +
      "counts; a SHIFTED clip shares frames but never aligns") {
    // the gate query reproduces the planted 120 pairs exactly
    val got = Multimodal.videoDHashClustered(spark, "").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (0L until 40L).flatMap { b =>
      val nf = b % 3 + 3
      Seq((b, b + 40L, nf), (b, b + 80L, nf), (b + 40L, b + 80L, nf))
    }.toSet
    assert(got == want, s"${got.size} pairs, expected ${want.size}")
    // the temporal rule: clip 0 = [A,B,C], clip 1 = [B,C,D] (one-frame
    // shift — 2 shared frames, ZERO aligned), clip 2 = copy of clip 0
    import spark.implicits._
    def fp(seed: Long): Long = Multimodal.dHash(Multimodal.decodePng(
      Multimodal.encodePngPixels(Multimodal.scrambledPixels(seed, 18, 16), 18, 16)))
    val (a, b, c, d) = (fp(1L), fp(2L), fp(3L), fp(4L))
    val frames = Seq(
      (0L * 64 + 0, a), (0L * 64 + 1, b), (0L * 64 + 2, c),
      (1L * 64 + 0, b), (1L * 64 + 1, c), (1L * 64 + 2, d),
      (2L * 64 + 0, a), (2L * 64 + 1, b), (2L * 64 + 2, c))
      .toDF("doc_id", "fp")
    val pairs = Multimodal.videoNearDupPairs(frames, minAligned = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs == Seq((0L, 2L, 3L)),
      s"shifted clip must not pair; replica must, with all 3 frames: $pairs")
  }

  test("multimodal incremental forms equal their batch rebuilds " +
      "bitwise (image / audio / video, r16)") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.get(2).asInstanceOf[Number].longValue)).toSeq
    assert(pairs(Multimodal.imageDHashIncrClustered(spark, "")) ==
      pairs(Multimodal.imageDHashClustered(spark, "")))
    assert(pairs(Multimodal.audioHashIncrClustered(spark, "")) ==
      pairs(Multimodal.audioHashClustered(spark, "")))
    assert(pairs(Multimodal.videoDHashIncrClustered(spark, "")) ==
      pairs(Multimodal.videoDHashClustered(spark, "")))
    // a WITHIN-DELTA-only family must also pair (delta×delta arm):
    // split at 120 puts the uniques alone in the delta — no pairs from
    // them — and at 40 the second+third copies in the delta
    val p40 = pairs(Multimodal.imageDHashIncrClustered(spark, "",
      splitId = 40))
    assert(p40 == pairs(Multimodal.imageDHashClustered(spark, "")),
      "splitId=40 (two copies per family in the delta) diverged")
  }

  test("pipeline_fineweb_stream_late: quarantined docs counted in the " +
      "6_late row and excluded from every funnel stage") {
    val rows = TextAnalysis.finewebStreamLate(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set("0_total", "1_url", "2_lang", "3_quality",
      "4_repetition", "5_dedup", "6_late"))
    val nDocs = Tables.documents(spark, sf).count()
    // every doc is either funneled or quarantined, never both/neither
    assert(rows("0_total")._1 + rows("6_late")._1 == nDocs,
      s"on-time + late != corpus: $rows vs $nDocs")
    assert(rows("6_late")._1 >= 1, "planted lateness produced no late doc")
    // stage docs monotone over the on-time population
    val st = Seq("0_total", "1_url", "2_lang", "3_quality",
      "4_repetition", "5_dedup").map(rows(_)._1)
    assert(st.zip(st.tail).forall { case (a, b) => b <= a }, s"$st")
  }

  test("mm_dedup_video_stream: survivors equal the planted keep-first " +
      "set; a shifted clip never aligns cross-epoch; replay idempotent") {
    val surv = Multimodal.videoDHashStreamClustered(spark, "")
      .collect().map(_.getLong(0)).toSet
    assert(surv == ((0L until 40L) ++ (120L until 140L)).toSet,
      s"video stream survivors wrong: ${surv.size} ids")
    // direct core drive: clip 0 = [A,B,C] epoch 0; epoch 1 brings
    // clip 1 = [B,C,D] (one-frame shift — shares frames with history
    // but aligns nowhere) and clip 2 = copy of clip 0 (all 3 aligned)
    import spark.implicits._
    def fp(seed: Long): Long = Multimodal.dHash(Multimodal.decodePng(
      Multimodal.encodePngPixels(Multimodal.scrambledPixels(seed, 18, 16), 18, 16)))
    val (a, b, c, d) = (fp(1L), fp(2L), fp(3L), fp(4L))
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-videostream-spec").toString + "/state"
    try {
      val e0 = Seq((0L * 64 + 0, a), (0L * 64 + 1, b), (0L * 64 + 2, c))
        .toDF("doc_id", "fp")
      val e1 = Seq((1L * 64 + 0, b), (1L * 64 + 1, c), (1L * 64 + 2, d),
          (2L * 64 + 0, a), (2L * 64 + 1, b), (2L * 64 + 2, c))
        .toDF("doc_id", "fp")
      graft.ops.Dedup.sequenceFingerprintStreamApplyBatch(e0, 0L,
        statePath, compactEvery = 2)
      graft.ops.Dedup.sequenceFingerprintStreamApplyBatch(e1, 1L,
        statePath, compactEvery = 2)
      def surv1() = spark.read.parquet(graft.tools.LogState.pathsAsOf(
          s"$statePath/survivors", 1L): _*)
        .collect().map(_.getLong(0)).toSet
      val first = surv1()
      assert(first == Set(0L, 1L),
        s"shifted clip must survive, the replica must not: $first")
      graft.ops.Dedup.sequenceFingerprintStreamApplyBatch(e1, 1L,
        statePath, compactEvery = 2)
      assert(surv1() == first, "replay changed the video survivor fold")
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("real WAV round-trip: decode(encode(x)) is sample-exact, header is 44 bytes") {
    // the audio path uses the JDK's actual RIFF/WAV codec — PCM is
    // lossless, so the decoded samples must equal the generated ones
    for (id <- Seq(0L, 7L, 255L); n <- Seq(1, 100, 999)) {
      val src = Multimodal.syntheticPcm(id, n)
      val wav = Multimodal.encodeWav(src)
      assert(wav.length == 44 + 2 * n, s"WAV container size for id=$id n=$n")
      assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
      val back = Multimodal.decodeWav(wav)
      assert(back.toSeq == src.toSeq, s"WAV round-trip not sample-exact id=$id n=$n")
    }
    // sample generator covers the full signed-16-bit range shape
    val s = Multimodal.syntheticPcm(1L, 65536)
    assert(s.min >= Short.MinValue && s.max <= Short.MaxValue)
  }

  test("real GIF container round-trip: demux returns every frame pixel-exact") {
    for (id <- Seq(0L, 6L, 123L)) {
      val nf = (id % 5 + 2).toInt
      val gif = Multimodal.encodeGif(id, nf, 8, 8)
      assert(new String(gif, 0, 6, "US-ASCII").startsWith("GIF8"))
      val frames = Multimodal.decodeGifFrames(gif)
      assert(frames.length == nf, s"container frame count for id=$id")
      frames.zipWithIndex.foreach { case (img, f) =>
        val want = Multimodal.syntheticFramePx(id, f, 8, 8)
        val got = Array.tabulate(64)(i => img.getRGB(i % 8, i / 8) & 0xFF)
        assert(got.toSeq == want.toSeq, s"frame $f of id=$id not pixel-exact")
      }
    }
    // sampling: only even frame indices survive, count comes from the demux
    val rows = Multimodal.videoReal(spark, "/root/testdata/sf0.001")
      .filter("media_id = 4").collect() // id 4 → 6 frames → sampled 0,2,4
    assert(rows.map(_.getInt(2)).toSeq == Seq(0, 2, 4))
    assert(rows.forall(_.getInt(1) == 6))
  }

  test("multimodal metadata scan does not read the payload column") {
    val plan = Multimodal.mediaMeta(spark, sf).queryExecution.executedPlan.toString
    // the parquet scan must prune to the columns the query needs; payload
    // is derived from text, so ReadSchema contains text but the point holds
    // for a stored binary column: only referenced columns are read
    assert(plan.contains("ReadSchema"))
  }

  test("quality buckets: per-lang thirds with head-heavy remainders, " +
      "ordered by familiarity then doc_id") {
    val rows = graft.ops.TextAnalysis.qualityBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      val n = docs.length
      // bucket must equal the integer formula over the (familiarity
      // DESC, doc_id) rank — recompute the rank independently
      val ranked = docs.sortBy(d => (-d._3, d._1)).zipWithIndex
      ranked.foreach { case ((id, _, _, b), i) =>
        assert(b == 3 * i / n, s"doc $id in $lang: bucket $b at rank $i of $n")
      }
      val sizes = docs.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.values.sum == n)
      // head gets the remainder first: sizes differ by at most 1 and
      // are non-increasing head -> tail
      val s = (0 to 2).map(b => sizes.getOrElse(b, 0))
      if (n >= 3) assert(s(0) >= s(1) && s(1) >= s(2) && s(0) - s(2) <= 1, s"$lang $s")
    }
  }

  test("bm25: distributed scores, hits, and ranks equal an independent " +
      "in-memory reference on a 30-doc corpus") {
    // deterministic corpus with ~26 distinct tokens and skewed df so the
    // rank-6..20 query derivation has real structure
    val rng = new scala.util.Random(42)
    val vocab = (1 to 26).map(i => f"w$i%02d")
    val docsSeq = (0 until 30).map { d =>
      val len = 5 + rng.nextInt(20)
      // token index skew: low indices appear in many docs (stopword-ish)
      val ts = Seq.fill(len)(vocab(math.min(rng.nextInt(27), rng.nextInt(27)) % 26))
      (d.toLong, ts.mkString(" "))
    }
    val dir = docs(docsSeq.map { case (id, t) => (id, t, "en") }: _*)

    // independent reference: same integer formula, BigInt arithmetic
    val toks = docsSeq.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val bigN = BigInt(toks.size)
    val bigT = BigInt(toks.values.map(_.size).sum)
    val tf = for {
      (id, ts) <- toks.toSeq; (tok, g) <- ts.groupBy(identity)
    } yield (id, tok, BigInt(g.size))
    val dfm = tf.groupBy(_._2).map { case (t, xs) => t -> BigInt(xs.size) }
    val qt = dfm.toSeq.sortBy { case (t, d) => (-d, t) } // ASCII = UTF-8 here
      .slice(5, 20).zipWithIndex
      .map { case ((t, d), i) => (t, d, i / 3) }
    val perDoc = (for {
      (tok, d, qid) <- qt
      (id, t2, f) <- tf if t2 == tok
      dl = BigInt(toks(id).size)
    } yield ((qid, id),
        (BigInt(20000000) * bigT * f * (2 * bigN - 2 * d + 1)) /
          ((2 * d + 1) * (8 * bigT * f + 3 * bigT + 9 * dl * bigN))))
      .groupBy(_._1)
      .map { case (k, xs) => k -> (xs.map(_._2).sum.toLong, xs.size.toLong) }
    val expTop = perDoc.groupBy(_._1._1).flatMap { case (qid, m) =>
      m.toSeq.map { case ((_, id), (sc, nh)) => (id, sc, nh) }
        .sortBy { case (id, sc, _) => (-sc, id) }.take(10).zipWithIndex
        .map { case ((id, sc, nh), i) => (qid, i + 1, id, sc, nh) }
    }.toSet

    val got = TextAnalysis.bm25(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expTop)
    assert(got.map(_._1) == Set(0, 1, 2, 3, 4), "five derived queries")
    // the persisted-index form returns the identical ranking (and its
    // second invocation reuses the artifacts rather than rebuilding)
    val idx = TextAnalysis.bm25Indexed(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(idx == got)
    val idx2 = TextAnalysis.bm25Indexed(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(idx2 == got)
    // incrementally maintained index (history = ids < 15, delta = rest,
    // which introduces both new postings for existing tokens and new
    // tokens) must return the identical ranking; empty-delta split too
    for (split <- Seq(15L, 1000L)) {
      val inc = TextAnalysis.bm25Incremental(spark, dir, splitId = split)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(inc == got, s"split $split diverged")
    }
  }

  test("gopher repetition: top-gram chars, tie-break, and overlap coverage") {
    val dir = docs(
      (1L, "a b a b a b", "en"),     // top-2: "a b" x3, 2 chars -> 6
      (2L, "c c c c c c", "en"),     // dup-5: both 5-grams equal -> all 6 covered
      (3L, "bb bb aa aa", "en"),     // 2-gram tie (all cnt 1) -> largest "bb bb" -> 4
      (4L, "", "en"),                // empty -> all zeros, fracs 0.0
      (5L, "x y z", "en"))           // shorter than 5 -> dup cols 0
    val rows = TextAnalysis.gopherRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap

    val d1 = rows(1L)
    assert(d1.getAs[Long]("total_chars") == 6L)
    assert(d1.getAs[Long]("top_2_chars") == 6L)          // 3 x "ab"
    assert(d1.getAs[Long]("dup_5_chars") == 0L)          // the two 5-grams differ
    assert(d1.getAs[Double]("top_2_frac") == 1.0)

    val d2 = rows(2L)
    assert(d2.getAs[Long]("dup_5_chars") == 6L)          // overlap counted once
    assert(d2.getAs[Long]("dup_6_chars") == 0L)          // single 6-gram, no dup
    assert(d2.getAs[Double]("dup_5_frac") == 1.0)

    val d3 = rows(3L)
    assert(d3.getAs[Long]("top_2_chars") == 4L)          // tie -> "bb bb" (largest)

    val d4 = rows(4L)
    assert(d4.getAs[Long]("total_chars") == 0L)
    assert(d4.getAs[Double]("top_2_frac") == 0.0)

    val d5 = rows(5L)
    assert(d5.getAs[Long]("top_2_chars") == 2L)          // any 2-gram once, 2 chars
    assert((5 to 10).forall(n => d5.getAs[Long](s"dup_${n}_chars") == 0L))
  }

  test("gopher quality flags: each rule trips on its planted violator") {
    val long = ("the of " + Seq.fill(60)("word").mkString(" ")) // 62 toks, 2 stops
    val dir = docs(
      (1L, long, "en"),                                   // all rules pass
      (2L, "the of " + Seq.fill(10)("word").mkString(" "), "en"), // too short
      (3L, ("the of " + Seq.fill(60)("ab").mkString(" ")), "en"), // mean len < 3
      (4L, ("the of " + Seq.fill(60)("word#").mkString(" ")), "en"), // symbols
      (5L, ("a " + Seq.fill(60)("word").mkString(" ")), "en"))    // 1 stop hit
    val rows = TextAnalysis.gopherQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"))
    assert(!rows(2L).getAs[Boolean]("ok_count") &&
      !rows(2L).getAs[Boolean]("keep"))
    assert(!rows(3L).getAs[Boolean]("ok_word_len"))
    assert(!rows(4L).getAs[Boolean]("ok_symbols"))
    assert(!rows(5L).getAs[Boolean]("ok_stop"))
  }

  test("c4 filter: line rules and page rules fire exactly as planted") {
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    // doc ids picked for rule isolation: 1 (odd, 2 sentences → dropped),
    // 2 (even, 3 sentences → kept), 14 (lorem ipsum → dropped),
    // 22 (curly brace → dropped), 6 (even + javascript line → line
    // dropped but page kept)
    val dir = docs(Seq(1L, 2L, 14L, 22L, 6L).map(id => (id, text, "en")): _*)
    val rows = TextAnalysis.c4Filter(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!rows(1L).getAs[Boolean]("page_kept")) // 2 sentences only
    assert(rows(2L).getAs[Boolean]("page_kept"))
    assert(rows(2L).getAs[String]("clean_text").count(_ == '\n') == 2)
    assert(!rows(14L).getAs[Boolean]("page_kept")) // lorem ipsum
    assert(!rows(22L).getAs[Boolean]("page_kept")) // { page rule
    val d6 = rows(6L)
    assert(d6.getAs[Boolean]("page_kept"))
    // the javascript line ends in '.' but is excluded by the word rule
    assert(!d6.getAs[String]("clean_text").contains("javascript"))
    assert(d6.getAs[Long]("n_kept_lines") == 3L)
  }

  test("dsir: target-like documents outscore off-distribution ones; " +
      "shared features wash out") {
    // en docs repeat one bigram vocabulary, xx docs another; doc 5 is an
    // xx-language doc WRITTEN in the en feature distribution — DSIR must
    // select it anyway (feature-based, not label-based), and reject the
    // off-distribution xx docs.
    val enText = Seq.fill(30)("alpha beta").mkString(" ")
    val xxText = Seq.fill(30)("gamma delta").mkString(" ")
    val dir = docs(
      (1L, enText, "en"), (2L, enText, "en"), (3L, xxText, "xx"),
      (4L, xxText, "xx"), (5L, enText, "xx"))
    val rows = TextAnalysis.dsirSelect(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("selected")).toMap
    assert(rows(1L) && rows(2L) && rows(5L), s"target-like not selected: $rows")
    assert(!rows(3L) && !rows(4L), s"off-distribution selected: $rows")
  }

  test("dsir stream: frozen-model scoring folds to the batch result; " +
      "model persists as O(B) tables; replay idempotent") {
    val enText = Seq.fill(30)("alpha beta").mkString(" ")
    val xxText = Seq.fill(30)("gamma delta").mkString(" ")
    val dir = docs(
      (1L, enText, "en"), (2L, enText, "en"), (3L, xxText, "xx"),
      (4L, xxText, "xx"), (5L, enText, "xx"))
    val batch = TextAnalysis.dsirSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    val stream = TextAnalysis.dsirStream(spark, dir, epochs = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(stream == batch, s"stream=$stream batch=$batch")
    // direct form: persisted model is bucket-count tables, and an
    // at-least-once replay of a batch rewrites identical results
    val base = java.nio.file.Files
      .createTempDirectory("graft-dsirstream-spec").toString
    try {
      val modelPath = s"$base/model"
      val statePath = s"$base/state"
      TextAnalysis.dsirModelTrain(spark, dir, modelPath)
      assert(spark.read.parquet(s"$modelPath/raw").count() <= 64)
      assert(spark.read.parquet(s"$modelPath/totals").count() == 1)
      val b0 = graft.Tables.documents(spark, dir)
        .filter(org.apache.spark.sql.functions.col("doc_id") <= 2)
      TextAnalysis.dsirStreamApplyBatch(b0, 0L, statePath, modelPath)
      def res() = spark.read.parquet(graft.tools.LogState.pathsAsOf(
          s"$statePath/results", 0L): _*)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Boolean]("selected")).toMap
      val r1 = res()
      assert(r1 == Map(1L -> true, 2L -> true))
      TextAnalysis.dsirStreamApplyBatch(b0, 0L, statePath, modelPath)
      assert(res() == r1, "replay changed the results log")
    } finally graft.tools.TempDirs.deleteRecursively(base)
  }

  test("fineweb funnel: every stage sheds its planted violator") {
    // good docs must clear the quality gate: >= 50 tokens, >= 2
    // stopword hits, mean word length in [3, 10]
    def good(seed: Int) = "the of " +
      (1 to 60).map(i => s"word${(i * seed) % 97}").mkString(" ")
    val rep = "the of " + Seq.fill(60)("spam spam").mkString(" ")
    // the planted URL groups docs by doc_id div 4, so ids are spaced one
    // group apart; 1 and 2 share group 0 — the same canonical URL — and
    // 2 must shed at the new 1_url stage (keep-first keeps 1)
    val dir = docs(
      (1L, good(1), "en"),
      (2L, good(5), "en"),   // same canonical URL as 1 -> sheds at 1_url
      (5L, good(2), "xx"),   // sheds at 2_lang
      (9L, "the of tiny", "en"), // sheds at 3_quality (token count)
      (13L, rep, "en"),      // sheds at 4_repetition (top-2 "spam spam")
      (17L, good(1), "en"),  // exact text copy of 1 -> sheds at 5_dedup
      (21L, good(3), "de"))
    val rows = TextAnalysis.finewebPipeline(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("0_total" -> 7L, "1_url" -> 6L, "2_lang" -> 5L,
      "3_quality" -> 4L, "4_repetition" -> 3L, "5_dedup" -> 2L),
      s"funnel: $rows")
  }

  test("fineweb stream: folded winner logs reproduce the batch funnel " +
      "(cross-epoch url + text dedup exercised)") {
    def good(seed: Int) = "the of " +
      (1 to 60).map(i => s"word${(i * seed) % 97}").mkString(" ")
    val rep = "the of " + Seq.fill(60)("spam spam").mkString(" ")
    // same planted fixture as the batch spec; at epochs=4 the id-range
    // batching puts {1,2,5} / {9} / {13,17} / {21} in separate epochs, so
    // doc 17 (text copy of 1) must defer to a CROSS-EPOCH text winner and
    // doc 2 sheds at the url stage within its batch
    val dir = docs(
      (1L, good(1), "en"), (2L, good(5), "en"), (5L, good(2), "xx"),
      (9L, "the of tiny", "en"), (13L, rep, "en"), (17L, good(1), "en"),
      (21L, good(3), "de"))
    val batch = TextAnalysis.finewebPipeline(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val stream = TextAnalysis.finewebStream(spark, dir, epochs = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stream == batch, s"stream=$stream batch=$batch")
  }

  test("fineweb stream: mid-stream report covers only arrived epochs; " +
      "at-least-once replay is idempotent") {
    def good(seed: Int) = "the of " +
      (1 to 60).map(i => s"word${(i * seed) % 97}").mkString(" ")
    val base = java.nio.file.Files
      .createTempDirectory("graft-fwstream-spec").toString
    val statePath = s"$base/state"
    try {
      def b(rows: (Long, String, String)*) =
        rows.toSeq.toDF("doc_id", "lang", "text")
      val e0 = Seq((1L, "en", good(1)), (2L, "xx", good(2)))
      val e1 = Seq((5L, "en", good(1)), (9L, "de", good(4)))
      TextAnalysis.finewebStreamApplyBatch(b(e0: _*), 0L, statePath)
      // mid-stream: report as-of epoch 0 must equal the batch funnel run
      // on the epoch-0 slice alone (prefix-closure)
      val mid = TextAnalysis.finewebStreamReport(spark, statePath, 0L)
        .get.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val dirE0 = docs(e0.map { case (id, l, t) => (id, t, l) }: _*)
      val midBatch = TextAnalysis.finewebPipeline(spark, dirE0).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(mid == midBatch, s"mid=$mid batch=$midBatch")
      // epoch 1: doc 5 is a text copy of the epoch-0 winner -> must defer
      TextAnalysis.finewebStreamApplyBatch(b(e1: _*), 1L, statePath)
      val r1 = TextAnalysis.finewebStreamReport(spark, statePath, 1L)
        .get.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r1("5_dedup") == 2L && r1("0_total") == 4L, s"r1=$r1")
      // at-least-once replay of the last epoch rewrites identical state
      TextAnalysis.finewebStreamApplyBatch(b(e1: _*), 1L, statePath)
      val r2 = TextAnalysis.finewebStreamReport(spark, statePath, 1L)
        .get.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r2 == r1, s"replay changed the report: $r2 vs $r1")
      // ADMISSION GUARD (r15 verdict #4): both dedup windows assume
      // global id-ordered arrival — a straggler below the high-water
      // mark must fail fast, and the report must be unchanged
      val e = intercept[IllegalStateException] {
        TextAnalysis.finewebStreamApplyBatch(
          b((3L, "en", good(7))), 2L, statePath)
      }
      assert(e.getMessage.contains("id-ordered admission"))
      val r3 = TextAnalysis.finewebStreamReport(spark, statePath, 2L)
        .get.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(r3 == r1, s"rejected batch mutated state: $r3 vs $r1")
    } finally graft.tools.TempDirs.deleteRecursively(base)
  }

  test("mmCuration: each planted defect class drops at exactly its stage, " +
      "and the three caption defect classes are disjoint") {
    val all = (0L until 140L).toSet
    val s1 = all.filter(id => id < 40 || id >= 120)   // image keep-first
    val s2 = s1.filter(_ % 8 != 1)                    // caption quality
    val s3 = s2.filter(_ % 10 != 6)                   // caption dedup
    val s4 = s3.filter(_ % 12 != 7)                   // pair score
    val expect = Map("0_total" -> all, "1_img_dedup" -> s1,
      "2_cap_quality" -> s2, "3_cap_dedup" -> s3, "4_pair_score" -> s4)
    val got = Multimodal.queries("pipeline_mm_curation")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    expect.foreach { case (st, ids) =>
      assert(got(st) == ((ids.size.toLong, ids.sum)),
        s"stage $st: got ${got(st)}, want (${ids.size}, ${ids.sum})")
    }
    // isolation: every drop between consecutive stages belongs to that
    // stage's planted class ONLY — no defect class bleeds into another
    assert((s1 -- s2).nonEmpty && (s1 -- s2).forall(id =>
      id % 8 == 1 && id % 10 != 6 && id % 12 != 7))
    assert((s2 -- s3).nonEmpty && (s2 -- s3).forall(id =>
      id % 10 == 6 && id % 8 != 1 && id % 12 != 7))
    assert((s3 -- s4).nonEmpty && (s3 -- s4).forall(id =>
      id % 12 == 7 && id % 8 != 1 && id % 10 != 6))
  }

  test("mmCurationIncr == mmCuration at every split regime: mid-family " +
      "(cross-split image copies AND cross-split caption dup), " +
      "all-delta, and near-empty-delta") {
    val batch = Multimodal.queries("pipeline_mm_curation")(spark, sf)
      .collect().map(_.toSeq).toSeq
    // 115 = the default doubly-mid-family split (116's caption dups
    // history 112; image bases 35..39 split 2 hist + 1 delta);
    // 1 = everything in the delta (history artifacts all empty);
    // 139 = a single-pair delta against full history
    Seq(115L, 1L, 139L).foreach { split =>
      val incr = Multimodal.mmCurationIncr(spark, sf, splitId = split)
        .collect().map(_.toSeq).toSeq
      assert(incr == batch, s"split $split diverged from the rebuild")
    }
    // the streaming form's epoch-folded report must also equal the
    // batch composition — at the default epochs and at a 7-epoch width
    // that misaligns every image family boundary
    Seq(4, 7).foreach { e =>
      val stream = Multimodal.mmCurationStream(spark, sf, epochs = e)
        .collect().map(_.toSeq).toSeq
      assert(stream == batch, s"stream epochs=$e diverged from batch")
    }
  }
}
