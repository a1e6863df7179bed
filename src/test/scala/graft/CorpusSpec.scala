package graft

import graft.ops.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  /** Tiny corpus with controlled token counts; two sources, two langs. */
  private def docs(rows: (Long, String, String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    rows.toSeq.map { case (id, t, lang, src) => (id, t, lang, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(n: Int, w: String = "tok"): String = Seq.fill(n)(w).mkString(" ")

  test("packSequences: chunk mapping is a prefix sum with documents spanning bins") {
    // source s0: docs of 40, 40, 50 tokens; seqLen 64.
    val dir = docs(
      (1L, words(40), "en", "s0"),
      (2L, words(40), "en", "s0"),
      (3L, words(50), "en", "s0"),
      (10L, words(10), "en", "s1"))
    val rows = Corpus.packSequences(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // doc 1: cum 0  -> seq 0 off 0,  spans 0..(39/64)=0  -> 1 seq
    // doc 2: cum 40 -> seq 0 off 40, spans 0..(79/64)=1  -> 2 seqs
    // doc 3: cum 80 -> seq 1 off 16, spans 1..(129/64)=2 -> 2 seqs
    assert(rows.filter(_._1 == "s0").toSeq == Seq(
      ("s0", 1L, 40L, 0L, 0L, 0L, 1L),
      ("s0", 2L, 40L, 40L, 0L, 40L, 2L),
      ("s0", 3L, 50L, 80L, 1L, 16L, 2L)))
    // independent source restarts at zero
    assert(rows.filter(_._1 == "s1").toSeq == Seq(("s1", 10L, 10L, 0L, 0L, 0L, 1L)))
  }

  test("packSequences: every token lands in exactly one sequence slot") {
    val dir = docs((1L, words(7), "en", "s0"), (2L, words(9), "en", "s0"),
      (3L, words(13), "en", "s0"))
    val rows = Corpus.packSequences(spark, dir, seqLen = 8).collect()
    // Total slots spanned = total tokens; offsets are consistent with cum.
    val total = rows.map(_.getLong(2)).sum
    val last = rows.last
    assert(last.getLong(3) + last.getLong(2) == total) // cum_before + n = total
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(3) % 8)          // offset = cum % seqLen
      assert(r.getLong(4) == r.getLong(3) / 8)          // first = cum div seqLen
    }
  }

  test("packSequences: a zero-token document spans no sequences and " +
      "does not shift its successors") {
    // doc 1 has no tokens at cum_before = 0 — the input where Spark's
    // truncating `div` and DuckDB's flooring `//` disagree on the
    // unguarded formula (0 vs -1); the guard pins n_seqs = 0
    val dir = docs(
      (1L, "", "en", "s0"),
      (2L, words(40), "en", "s0"))
    val rows = Corpus.packSequences(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6)))
      .toSeq
    assert(rows == Seq((1L, 0L, 0L, 0L), (2L, 40L, 0L, 1L)), s"$rows")
  }

  test("packSequencesStream: fold == batch; a document spanning a " +
      "sequence boundary ACROSS epochs gets the history-derived offset") {
    // ids land in separate epochs (4-way id-range batching over 1..21):
    // doc 9 arrives with 80 tokens of s0 history -> seq_first 1,
    // offset 16 — only the cross-epoch running total can produce that
    val dir = docs(
      (1L, words(40), "en", "s0"),
      (2L, words(40), "en", "s0"),
      (9L, words(50), "en", "s0"),
      (21L, words(10), "en", "s1"))
    val batch = Corpus.packSequences(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    val stream = Corpus.packSequencesStream(spark, dir, epochs = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(stream.toSeq == batch.toSeq, s"stream=$stream batch=$batch")
    val d9 = stream.find(_._2 == 9L).get
    assert(d9 == ("s0", 9L, 80L, 1L, 16L, 2L), s"doc 9 span: $d9")
  }

  test("budgetSelect keeps the greedy prefix per source and stops at the budget") {
    val dir = docs(
      (1L, words(200), "en", "s0"),
      (2L, words(150), "en", "s0"),  // cum_before 200 < 300 -> kept (overshoot allowed)
      (3L, words(10), "en", "s0"),   // cum_before 350 >= 300 -> dropped
      (9L, words(5), "en", "s1"))
    val kept = Corpus.budgetSelect(spark, dir).collect().map(r => r.getLong(1)).toSet
    assert(kept == Set(1L, 2L, 9L))
  }

  test("budgetSelectStream: fold == batch; budget boundary crossed " +
      "ACROSS epochs; replay idempotent") {
    // the load-bearing case is the boundary CROSSING an epoch edge: the
    // overshooting doc is kept in epoch 0 (cum_before 200 < 300), and
    // the next doc arrives in a LATER epoch where only the history
    // total — not any within-batch window — can prove it is over budget
    val dir = docs(
      (1L, words(200), "en", "s0"),
      (2L, words(150), "en", "s0"),
      (3L, words(10), "en", "s0"),
      (9L, words(5), "en", "s1"))
    val batch = Corpus.budgetSelect(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val stream = Corpus.budgetSelectStream(spark, dir, epochs = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stream.toSeq == batch.toSeq, s"stream=$stream batch=$batch")
    // direct apply-batch: the cross-epoch history total is what drops
    // the late doc — a fresh-state bug (treating a new epoch's source
    // as empty) would keep it
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-budstream-spec").toString + "/state"
    try {
      def b(rows: (Long, Int)*) = rows.toSeq
        .map { case (id, n) => (id, words(n), "s2") }
        .toDF("doc_id", "text", "source")
      // epoch 0: 250 kept + 100 kept-at-250 (overshoots to 350)
      Corpus.budgetStreamApplyBatch(b(1L -> 250, 2L -> 100), 0L,
        statePath, budget = 300L, compactEvery = 2)
      // epoch 1: cum_before = 350 >= 300 -> dropped on history alone
      Corpus.budgetStreamApplyBatch(b(3L -> 5), 1L, statePath,
        budget = 300L, compactEvery = 2)
      def res() = spark.read.parquet(graft.tools.LogState.pathsAsOf(
          s"$statePath/results", 1L): _*)
        .collect().map(r => r.getLong(1)).toSet
      val r1 = res()
      assert(r1 == Set(1L, 2L), s"kept: $r1")
      // replay of the last epoch rewrites identical state
      Corpus.budgetStreamApplyBatch(b(3L -> 5), 1L, statePath,
        budget = 300L, compactEvery = 2)
      assert(res() == r1)
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("cum-stream admission guard: an out-of-id-order batch fails fast " +
      "and leaves the kept set unchanged (r15 verdict #4)") {
    val statePath = java.nio.file.Files
      .createTempDirectory("graft-budguard-spec").toString + "/state"
    try {
      def b(rows: (Long, Int)*) = rows.toSeq
        .map { case (id, n) => (id, words(n), "s0") }
        .toDF("doc_id", "text", "source")
      Corpus.budgetStreamApplyBatch(b(5L -> 10), 0L, statePath,
        budget = 300L, compactEvery = 2)
      // doc 3 arrives AFTER doc 5 of its source: the prefix-sum keep
      // rule is no longer prefix-closed — must throw, not mis-fold
      val e = intercept[IllegalStateException] {
        Corpus.budgetStreamApplyBatch(b(3L -> 5), 1L, statePath,
          budget = 300L, compactEvery = 2)
      }
      assert(e.getMessage.contains("id-ordered admission"))
      val kept = spark.read.parquet(graft.tools.LogState.pathsAsOf(
          s"$statePath/results", 1L): _*)
        .collect().map(_.getLong(1)).toSet
      assert(kept == Set(5L), s"state corrupted by rejected batch: $kept")
      // a DIFFERENT source is an independent prefix: same ids are fine
      Corpus.budgetStreamApplyBatch(
        Seq((3L, words(5), "s1")).toDF("doc_id", "text", "source"),
        1L, statePath, budget = 300L, compactEvery = 2)
    } finally graft.tools.TempDirs.deleteRecursively(
      statePath.stripSuffix("/state"))
  }

  test("budgetSelectStreamLate: planted late doc quarantined with its " +
      "epoch; kept set equals the batch rule over on-time docs only") {
    // ids 0..15, 4 epochs -> width 4; the one late candidate is doc 10
    // (10 % 7 = 3, arr_epoch 2, src_epoch 0): ts 313ms < wm(1) = 417ms.
    val rows = (0L to 15L).map(i => (i, words(10), "en", s"s${i % 2}"))
    val dir = docs(rows: _*)
    val out = Corpus.budgetSelectStreamLate(spark, dir, budget = 1000L)
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4)))
    val quar = out.filter(_._2 >= 0L)
    assert(quar.toSeq == Seq((10L, 2L)),
      s"expected exactly doc 10 quarantined at epoch 2: ${quar.toSeq}")
    val kept = out.filter(_._2 < 0L).map(_._1).toSet
    val noLate = docs(rows.filterNot(_._1 == 10L): _*)
    val batchKept = Corpus.budgetSelect(spark, noLate, budget = 1000L)
      .collect().map(_.getLong(1)).toSet
    assert(kept == batchKept, s"kept=$kept batch-over-on-time=$batchKept")
  }

  test("packSequencesStreamLate: late doc quarantined; slot assignments " +
      "equal the batch rule over on-time docs only") {
    // same planted recipe as the budget-late spec: doc 10 is the one
    // late arrival (arr_epoch 2, event time from epoch 0)
    val rows = (0L to 15L).map(i => (i, words(10), "en", s"s${i % 2}"))
    val dir = docs(rows: _*)
    val out = Corpus.packSequencesStreamLate(spark, dir).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(7)) -1L else r.getLong(7)))
    assert(out.filter(_._2 >= 0L).toSeq == Seq((10L, 2L)),
      s"expected exactly doc 10 quarantined at epoch 2")
    val noLate = docs(rows.filterNot(_._1 == 10L): _*)
    val batch = Corpus.packSequences(spark, noLate).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    val onTime = Corpus.packSequencesStreamLate(spark, dir).collect()
      .filter(_.isNullAt(7))
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    assert(onTime == batch, "slot assignments diverge from batch-over-on-time")
  }

  test("shuffleShards: every doc exactly once, shards balanced within 1, " +
      "positions contiguous, deterministic across runs (r16)") {
    val dir = docs((1L to 17L).map(i => (i, words(2), "en", "s0")): _*)
    def run() = Corpus.shuffleShards(spark, dir, shards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val out = run()
    assert(out.map(_._1).toSet == (1L to 17L).toSet, "not a permutation")
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced: $sizes")
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.size).toSeq,
        s"shard $sh positions not contiguous")
    }
    assert(run() == out, "shuffle not deterministic across runs")
    // round-robin interleave: global md5 rank r lands in shard (r-1)%4
    val byRank = out.sortBy(r => (r._3, r._2))
    assert(byRank.map(_._2).take(8).toSeq ==
      Seq(0L, 1L, 2L, 3L, 0L, 1L, 2L, 3L))
  }

  test("balanceByLang caps each language at perLang with a deterministic rank") {
    val dir = docs((1L to 10L).map(i => (i, words(3), if (i <= 7) "en" else "fr", "s0")): _*)
    val out = Corpus.balanceByLang(spark, dir, perLang = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.count(_._1 == "en") == 4)   // capped
    assert(out.count(_._1 == "fr") == 3)   // fewer than cap -> all kept
    assert(out.filter(_._1 == "fr").map(_._3).sorted.toSeq == Seq(1, 2, 3))
    // determinism: same input -> same ranks
    val again = Corpus.balanceByLang(spark, dir, perLang = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("shardShuffle partitions all docs and positions are dense per shard") {
    val dir = docs((1L to 20L).map(i => (i, words(2) + s" d$i", "en", "s0")): _*)
    val out = Corpus.shardShuffle(spark, dir, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.map(_._3).toSet == (1L to 20L).toSet)              // every doc once
    assert(out.map(_._1).toSet == Set(0L, 1L, 2L, 3L))            // doc_id % 4
    out.groupBy(_._1).foreach { case (_, rs) =>                   // dense 1..n positions
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.size).toSeq)
    }
    out.foreach { case (shard, _, id) => assert(shard == id % 4) }
  }

  test("vocabPrune replaces exactly the out-of-vocab tokens and preserves order") {
    // counts: a=4, b=3, c=2, d=1 -> vocabSize=2 keeps {a, b}
    val dir = docs(
      (1L, "a b c a", "en", "s0"),
      (2L, "b d a c", "en", "s0"),
      (3L, "a b", "en", "s0"))
    val out = Corpus.vocabPrune(spark, dir, vocabSize = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, "a b <unk> a", 1L),
      (2L, "b <unk> a <unk>", 2L),
      (3L, "a b", 0L)))
  }

  test("vocabPrune frequency ties break on token text") {
    // a=2, b=2, c=2: vocabSize=2 keeps {a, b} (tie -> lexicographic)
    val dir = docs((1L, "a b c", "en", "s0"), (2L, "c b a", "en", "s0"))
    val out = Corpus.vocabPrune(spark, dir, vocabSize = 2).collect()
      .map(r => r.getString(1)).toSeq
    assert(out == Seq("a b <unk>", "<unk> b a"))
  }

  test("splitTrainValTest: exact per-language proportions, deterministic") {
    // 10 docs per language -> exactly 8 train / 1 val / 1 test each
    val rows = (0L until 20L).map(i =>
      (i, s"doc $i", if (i < 10) "en" else "fr", "s0"))
    val dir = docs(rows: _*)
    val out = Corpus.splitTrainValTest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.length == 20)
    for (lang <- Seq("en", "fr")) {
      val counts = out.filter(_._2 == lang).groupBy(_._3).view.mapValues(_.length).toMap
      assert(counts == Map("train" -> 8, "val" -> 1, "test" -> 1),
        s"$lang got $counts")
    }
    // deterministic: a second run assigns identically
    val again = Corpus.splitTrainValTest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("mixWeights: planned tokens land within one document of each target") {
    // The mixture plan's accuracy bound: sum(repeats × n_tokens) per
    // language sits in [target, target + max doc) — full passes hit the
    // quotient exactly and the remainder prefix overshoots by at most
    // the straddling document. At the default budget the fixture's zh
    // pool is smaller than its target, so the upsampling regime
    // (floor ≥ 1 full pass) runs alongside the others' prefix fills.
    val rows = Corpus.mixWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(4)))
    val planned = rows.groupBy(_._1).view
      .mapValues(v => (v.map(x => x._2 * x._3).sum, v.map(_._2).max)).toMap
    val pools = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val weights = Map("de" -> 1500L, "en" -> 4000L, "es" -> 1000L,
      "fr" -> 1000L, "zh" -> 2500L)
    weights.foreach { case (lang, bp) =>
      val target = bp * 20000L / 10000L
      val (got, maxDoc) = planned(lang)
      assert(got >= target && got < target + maxDoc,
        s"$lang planned $got outside [$target, ${target + maxDoc})")
      // repeats are uniform across a language's full passes: every doc
      // gets at least target/pool and at most target/pool + 1
      val floor = target / pools(lang)
      val reps = rows.filter(_._1 == lang).map(_._3)
      assert(reps.min == floor && reps.max <= floor + 1)
    }
  }

  test("unigram Viterbi: picks the max-likelihood split, prefers fewer " +
      "pieces on score ties, falls back to chars out of vocab") {
    import graft.ops.Corpus
    // "abcdef": [abc][def] (100·100) must beat [abcd][ef] (5·5)
    val counts = Map("abc" -> 100L, "def" -> 100L, "abcd" -> 5L,
      "ef" -> 5L, "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L,
      "e" -> 1L, "f" -> 1L)
    val total = counts.values.sum.toDouble
    assert(Corpus.viterbiSegment("abcdef", counts, total, 4)
      == Seq("abc", "def"))
    // single piece beats any split of itself (adding factors < 1)
    assert(Corpus.viterbiSegment("abc", counts, total, 4) == Seq("abc"))
    // exact score tie ("xy" and "yx" both 10 → [xy][yx] vs... no tie
    // here; the fewer-pieces rule: "aa" with c(aa)=c(a)^2/total would
    // tie only by construction — assert the simple case instead):
    // unknown chars fall back to themselves
    assert(Corpus.viterbiSegment("zq", counts, total, 4) == Seq("z", "q"))
    // zero-count chars stay usable via the count floor
    val floored = Map("x" -> 0L, "y" -> 0L)
    assert(Corpus.viterbiSegment("xy", floored, 10.0, 4)
      == Seq("x", "y"))
  }

  test("unigram trainer on the planted corpus: morphemes converge, the " +
      "concatenation resolves, the singleton prunes to char fallback") {
    import graft.ops.Corpus
    import org.apache.spark.sql.functions.col
    val vocab = Corpus.unigramClustered(spark, "").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(vocab.length == 40)
    val multi = vocab.filter(_._1.length > 1)
    assert(multi.length == 10 && multi.forall(_._1.length == 3),
      s"converged multi-char pieces must be the 10 morphemes: ${multi.toSeq}")
    assert(multi.forall(_._2 > 0) && vocab.filter(_._1.length == 1)
      .forall(_._2 == 0L))
    // application: concat doc -> two morphemes; singleton -> chars
    val tok = Corpus.tokenizeUnigramClustered(spark, "")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tok(140L) == "abc def")
    assert(tok(145L) == "a x d")
    assert(tok(0L) == "abc" && tok(11L) == "def def def")
  }

  test("shuffleShardsEpochs: per-epoch permutations are distinct over the " +
      "same doc set, shards balanced-within-1, positions dense") {
    val out = Corpus.shuffleShardsEpochs(spark, sf, shards = 4, epochs = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(0))) // (epoch, shard, pos, doc_id)
    val n = out.length / 3
    assert(n > 0 && out.length == 3 * n)
    // per-epoch global order (shard-major round-robin inverts to rank)
    def order(e: Long): Seq[Long] = out.filter(_._1 == e)
      .sortBy(t => (t._3 * 4 + t._2)).map(_._4).toSeq
    val perms = (0L to 2L).map(order)
    assert(perms.forall(_.length == n))
    assert(perms.forall(_.toSet == perms.head.toSet), "same doc set per epoch")
    assert(perms.distinct.length == 3, "epoch salts must change the order")
    // balance: every (epoch, shard) within 1 of n/4
    val sizes = out.groupBy(t => (t._1, t._2)).values.map(_.length)
    assert(sizes.size == 12 && sizes.forall(s =>
      math.abs(s - n / 4.0) <= 1), s"shard sizes: ${sizes.toSeq}")
    // positions dense per (epoch, shard)
    out.groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq)
    }
  }

  test("chunkDocs: window boundaries — short doc = one chunk, exact fit " +
      "= one chunk, len+1 = two chunks with a short tail, empty doc " +
      "emits nothing, stride overlap preserved") {
    def words(n: Int, p: String = "w") = (1 to n).map(p + _).mkString(" ")
    val dir = docs(
      (1L, words(5), "short", "s0"),       // n < len → 1 chunk of 5
      (2L, words(32), "exact", "s0"),      // n == len → 1 chunk
      (3L, words(33), "plusone", "s0"),    // → chunks at 0 and 24 (9 toks)
      (4L, "", "empty", "s0"),             // no chunks
      (5L, words(80), "long", "s0"))       // starts 0,24,48 → 32,32,32
    val got = Corpus.chunkDocs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val by = got.groupBy(_._1)
    assert(by(1L).map(t => (t._2, t._3)).toSeq == Seq((0L, 5L)))
    assert(by(2L).map(t => (t._2, t._3)).toSeq == Seq((0L, 32L)))
    assert(by(3L).sortBy(_._2).map(t => (t._2, t._3)).toSeq ==
      Seq((0L, 32L), (1L, 9L)))
    assert(!by.contains(4L))
    assert(by(5L).sortBy(_._2).map(t => (t._2, t._3)).toSeq ==
      Seq((0L, 32L), (1L, 32L), (2L, 32L)))
    // overlap: doc 3's second chunk starts at token 25 (stride 24)
    assert(by(3L).sortBy(_._2).last._4.startsWith("w25 "))
    // every token of doc 3 is covered by some chunk
    val covered = by(3L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 33).map("w" + _).toSet)
  }

  test("packPadded: fresh sequence per doc, pad arithmetic at the " +
      "boundaries, per-source prefix of sequence counts") {
    def words(n: Int) = (1 to n).map("w" + _).mkString(" ")
    val dir = docs(
      (1L, words(64), "a", "s0"),   // exact fit: 1 seq, 0 pad
      (2L, words(65), "b", "s0"),   // 2 seqs, 63 pad
      (3L, words(1), "c", "s0"),    // 1 seq, 63 pad
      (4L, "", "d", "s0"),          // 0 seqs, 0 pad
      (5L, words(10), "e", "s0"))   // 1 seq, 54 pad — after 1..4 in s0
    val got = Corpus.packPadded(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) == ((0L, 1L, 0L)))
    assert(got(2L) == ((1L, 2L, 63L)))
    assert(got(3L) == ((3L, 1L, 63L)))
    assert(got(4L) == ((4L, 0L, 0L)))
    assert(got(5L) == ((4L, 1L, 54L)))
  }

  test("splitTrainValTest: tiny strata round toward train") {
    // 1 doc in a language: 1*100 <= 1*80 is false, <= 90 false -> test?
    // rk=1, n=1: 100 <= 80 fails, 100 <= 90 fails -> test. A 2-doc
    // stratum: rk=1 -> 50 <= 80 train; rk=2 -> 100 -> test.
    val dir = docs((1L, "x", "solo", "s0"),
      (2L, "y", "duo", "s0"), (3L, "z", "duo", "s0"))
    val by = Corpus.splitTrainValTest(spark, dir).collect()
      .map(r => r.getString(1) -> r.getString(2)).toSeq
    assert(by.count(_._1 == "duo") == 2)
    assert(by.filter(_._1 == "duo").map(_._2).sorted == Seq("test", "train"))
    assert(by.filter(_._1 == "solo").map(_._2) == Seq("test"))
  }

  test("curriculumOrder: every doc once, shards balanced within 1, the " +
      "bucket phase is non-decreasing along every shard, and buckets " +
      "match qualityBuckets") {
    val out = Corpus.curriculumOrder(spark, sf, shards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(out.map(_._1).distinct.length.toLong == nDocs)
    val sizes = out.groupBy(_._3).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"imbalanced shards: $sizes")
    out.groupBy(_._3).foreach { case (sh, rows) =>
      val byPos = rows.sortBy(_._4).map(_._2)
      assert(byPos.zip(byPos.tail).forall { case (a, b) => a <= b },
        s"shard $sh violates curriculum order: ${byPos.toSeq}")
    }
    val qb = graft.ops.TextAnalysis.qualityBuckets(spark, sf)
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.forall { case (id, b, _, _) => qb(id) == b })
  }

  test("sampleStratified: membership is append-stable (a sub-corpus run " +
      "equals the full run restricted), rates land near target, and " +
      "thresholds are exact binary fractions") {
    import org.apache.spark.sql.functions.col
    val full = Corpus.sampleStratified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // append-stability: sampling HALF the corpus picks exactly the
    // full run's members with doc_id in that half
    val half = Corpus.sampleStratifiedDocs(
        graft.Tables.documents(spark, sf).filter(col("doc_id") < 250))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(half == full.filter(_._1 < 250))
    // per-lang realized rate within a loose binomial band of its target
    val byLang = graft.Tables.documents(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, n) =>
      val (num, den) = Corpus.SampleRates.getOrElse(lang,
        Corpus.SampleDefaultRate)
      val got = full.count(_._2 == lang).toDouble / n
      val want = num.toDouble / den
      assert(math.abs(got - want) < 0.15,
        s"$lang: realized $got vs target $want over $n docs")
    }
    assert(Corpus.hexThreshold(3, 4) == "c000000000000000" &&
      Corpus.hexThreshold(1, 2) == "8000000000000000")
  }

  test("mixTemperature: targets sum to the budget exactly, upsample " +
      "low-resource languages vs proportional, and per-lang repeats " +
      "account for the full target") {
    val out = Corpus.mixTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byLang = out.groupBy(_._1)
    val targets = byLang.view.mapValues(_.head._5).toMap
    assert(targets.values.sum == Corpus.MixTempBudgetDefault,
      s"largest-remainder must hit the budget exactly: $targets")
    // α = 1/2 compresses the pool ratio: every language's target share
    // must sit BETWEEN its proportional share and the uniform share
    val pools = byLang.view.mapValues(_.map(_._3).sum).toMap
    val pTot = pools.values.sum.toDouble
    val tTot = Corpus.MixTempBudgetDefault.toDouble
    val nL = pools.size.toDouble
    pools.foreach { case (l, p) =>
      val prop = p / pTot
      val share = targets(l) / tTot
      val lo = math.min(prop, 1.0 / nL) - 0.002
      val hi = math.max(prop, 1.0 / nL) + 0.002
      assert(share >= lo && share <= hi,
        s"$l: share $share outside [$lo, $hi] (prop $prop)")
    }
    // per-doc repeats: sum(repeats · n_tokens) lands within one doc of
    // the target (the prefix-sum remainder rule's contract)
    byLang.foreach { case (l, rows) =>
      val got = rows.map(r => r._6 * r._3).sum
      val t = targets(l)
      assert(got >= t - rows.map(_._3).max && got <= t + rows.map(_._3).max,
        s"$l: assembled $got vs target $t")
    }
  }

  test("dataloaderPipeline: instances come only from sampled docs, " +
      "shards balanced within 1, positions dense per shard") {
    val out = Corpus.dataloaderPipeline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    val sampledIds = Corpus.sampleStratified(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(out.map(_._2).toSet.subsetOf(sampledIds),
      "an unsampled doc leaked into the assembly")
    val sizes = out.groupBy(_._4).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"imbalanced shards: $sizes")
    out.groupBy(_._4).foreach { case (sh, rows) =>
      assert(rows.map(_._5).sorted.toSeq == (0L until rows.size).toSeq,
        s"shard $sh positions not dense")
    }
  }

  test("dataloaderResume: suffix ∪ prefix == the full epoch, disjointly, " +
      "with original (shard, pos) preserved") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val full = Corpus.dataloaderPipeline(spark, sf).collect().map(key).toSet
    val resume = Corpus.dataloaderResume(spark, sf).collect().map(key).toSet
    assert(resume.nonEmpty && resume.size < full.size,
      "a mid-epoch cursor must leave a real, proper suffix")
    // the trained prefix under the same closed-form cursor
    val cuts = full.groupBy(_._4).view
      .mapValues(rows => rows.map(_._5).max / 2).toMap
    val prefix = full.filter(t => t._5 < cuts(t._4))
    assert(resume == full -- prefix, "resume must be exactly the suffix")
    assert((resume intersect prefix).isEmpty)
    // every shard resumes at its own cursor (per-shard marks, not one
    // global cut): min resumed pos per shard == that shard's mark
    resume.groupBy(_._4).foreach { case (sh, rows) =>
      assert(rows.map(_._5).min == cuts(sh),
        s"shard $sh resumed at ${rows.map(_._5).min}, cursor ${cuts(sh)}")
    }
  }

  test("dataloaderCurriculum: same instance pool as the shuffled assembly, " +
      "phase monotone within every shard, shards balanced within 1") {
    val cur = Corpus.dataloaderCurriculum(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(cur.nonEmpty)
    // identical pool: the curriculum must reorder the SAME (lang, doc,
    // rep) instances the shuffled assembly emits — nothing added or lost
    val pool = Corpus.dataloaderPipeline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(cur.map(t => (t._1, t._2, t._3)).sorted.toSeq == pool)
    // the curriculum property: within each shard, bucket (head=0 →
    // tail=2) never decreases as pos advances — round-robin dealing
    // preserves the global phase order per shard
    cur.groupBy(_._5).foreach { case (sh, rows) =>
      val byPos = rows.sortBy(_._6).map(_._4)
      assert(byPos.zip(byPos.tail).forall { case (a, b) => a <= b },
        s"shard $sh bucket order not monotone: ${byPos.mkString(",")}")
    }
    val sizes = cur.groupBy(_._5).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"imbalanced shards: $sizes")
    // more than one phase actually present — the monotonicity claim has
    // content on this corpus
    assert(cur.map(_._4).distinct.length > 1)
  }

  test("dataloaderResumeEpochs: suffix ∪ prefix == the full multi-epoch " +
      "schedule, disjointly, across the epoch boundary") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)) // (lang, doc, rep, epoch, shard, pos)
    val epochs = Corpus.DataloaderEpochsDefault
    val cutEpoch = epochs / 2
    val resume = Corpus.dataloaderResumeEpochs(spark, sf).collect()
      .map(key).toSet
    assert(resume.nonEmpty)
    // reconstruct the full schedule from the single-epoch pool size:
    // every epoch is a permutation of the same instance pool, so the
    // full schedule has pool × epochs rows
    val pool = Corpus.dataloaderPipeline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // epochs BELOW the cursor epoch contribute nothing; epochs above it
    // are complete permutations of the pool
    (cutEpoch + 1 until epochs).foreach { e =>
      val late = resume.filter(_._4 == e).toSeq.map(t => (t._1, t._2, t._3))
      assert(late.sorted == pool.sorted,
        s"epoch $e (after the cursor) must be the untouched full permutation")
    }
    assert(resume.forall(_._4 >= cutEpoch),
      "fully-trained epochs must not reappear")
    // the cursor epoch is a real, proper suffix with per-shard cuts:
    // min resumed pos per shard == that shard's closed-form mark, and
    // prefix ∪ suffix is dense (0 until shard size)
    val cutRows = resume.filter(_._4 == cutEpoch)
    assert(cutRows.nonEmpty && cutRows.size < pool.size,
      "the cursor epoch must resume mid-epoch")
    cutRows.groupBy(_._5).foreach { case (sh, rows) =>
      val poss = rows.map(_._6)
      val fullShardMax = poss.max // suffix keeps original pos ⇒ max = shard max
      assert(poss.min == fullShardMax / 2,
        s"shard $sh resumed at ${poss.min}, cursor ${fullShardMax / 2}")
      assert(poss.toSeq.sorted == (poss.min to fullShardMax).toSeq,
        s"shard $sh suffix positions not dense — original pos not preserved")
    }
  }

  test("dataloaderCurriculumResume: exactly the curriculum suffix, original " +
      "(bucket, shard, pos) preserved, phases never restart") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)) // (lang, doc, rep, bucket, shard, pos)
    val full = Corpus.dataloaderCurriculum(spark, sf).collect().map(key).toSet
    val resume = Corpus.dataloaderCurriculumResume(spark, sf).collect()
      .map(key).toSet
    assert(resume.nonEmpty && resume.size < full.size)
    val cuts = full.groupBy(_._5).view
      .mapValues(rows => rows.map(_._6).max / 2).toMap
    val prefix = full.filter(t => t._6 < cuts(t._5))
    assert(resume == full -- prefix, "resume must be exactly the suffix")
    assert((resume intersect prefix).isEmpty)
    // no phase restarts: within each shard the resumed rows' buckets
    // continue monotonically from the prefix's last bucket
    resume.groupBy(_._5).foreach { case (sh, rows) =>
      val byPos = rows.toSeq.sortBy(_._6).map(_._4)
      assert(byPos.zip(byPos.tail).forall { case (a, b) => a <= b },
        s"shard $sh resumed buckets not monotone")
      val lastTrained = prefix.filter(_._5 == sh).toSeq
      if (lastTrained.nonEmpty)
        assert(byPos.head >= lastTrained.maxBy(_._6)._4,
          s"shard $sh resumed into an earlier phase than it trained")
    }
  }
}
