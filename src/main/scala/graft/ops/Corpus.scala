package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.tools.Stage._

/** Corpus-assembly operators — the steps between "filtered documents" and
  * "tensors on a trainer": sequence packing, token-budget selection,
  * per-language balancing, shard-and-shuffle, and vocabulary pruning.
  * These complete the LLM-data-pipeline surface (SURVEY.md §2 extensions)
  * alongside TextAnalysis (filter/score) and Dedup (near-dup removal).
  *
  * Scale posture: every operator here is window-over-group or
  * aggregate-join — no global single-partition window anywhere, and no
  * per-stratum single-task window either: strata (`source` / `lang`) are
  * low-cardinality and SKEWED in a real corpus (one language can be 80%
  * of 100 TB), so every prefix-sum / rank here runs in the two-level
  * bucketed form ([[TwoLevel]]) — bucket-local windows at
  * |strata| × |buckets| parallelism plus a broadcast offsets table,
  * bit-identical to the naive window (TwoLevelSpec proves it per
  * operator). The only corpus-wide state (the vocabulary) is an
  * aggregate that fits in memory and broadcasts. `shard` windows stay
  * single-level: shard cardinality and balance are writer-chosen.
  */
object Corpus {

  /** Whitespace tokens, empties dropped — same tokenizer as TextAnalysis. */
  private def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= lit(""))

  private val tokensSql =
    "list_filter(string_split(text, ' '), t -> t <> '')"

  /** Tunables shared between the lateness/shard queries and their SQL
    * oracles — the q103 `Q103Epochs` pattern (ADVICE r16): each value
    * is written ONCE and read by BOTH the Scala default parameter and
    * the oracle interpolation, so a query/oracle desync requires an
    * explicit non-default call (which the gate board never makes). */
  val StreamLateEpochs: Int = 4
  val StreamLatenessMicros: Long = 1500000L
  val BudgetDefault: Long = 300L
  val SeqLenDefault: Int = 64
  val ShardsDefault: Int = 8
  val ShuffleEpochsDefault: Int = 3
  val ChunkLenDefault: Int = 32
  val ChunkStrideDefault: Int = 24

  // ---------------------------------------------------------------------

  /** GPT-style concat-and-chunk sequence packing: within each source,
    * documents are concatenated in doc_id order and cut into fixed
    * `seqLen`-token training sequences; a document may span several. Emits,
    * per document, its first sequence id, offset inside it, and span width.
    *
    * The cumulative token count is a running sum per source in the
    * two-level form — [[TwoLevel.cumBefore]] over doc_id-range buckets —
    * so the packing of one source never waits on another AND a dominant
    * source never serializes on one window task; (unlike next-fit bin
    * packing) the chunk mapping is a pure prefix-sum, so it parallelizes
    * and is deterministic for the oracle. */
  def packSequences(spark: SparkSession, dir: String, seqLen: Int = 64): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    TwoLevel.cumBefore(
        TwoLevel.withIdRangeBucket(d, "source", "doc_id", "__b"),
        Seq("source"), "__b", Seq(col("doc_id")), "n_tokens", "cum_before")
      .drop("__b")
      .withColumn("seq_first", expr(s"cum_before div $seqLen"))
      .withColumn("seq_offset", expr(s"cum_before % $seqLen"))
      // zero-token docs span no sequences — guarded explicitly because
      // at cum_before = 0 the unguarded (c + n - 1) term goes NEGATIVE,
      // where Spark's `div` truncates toward zero but DuckDB's `//`
      // floors (0 vs -1): the one input where the engines' integer
      // division disagrees
      .withColumn("n_seqs", when(col("n_tokens") === 0L, lit(0L))
        .otherwise(expr(s"(cum_before + n_tokens - 1) div $seqLen")
          - col("seq_first") + lit(1L)))
      .orderBy(col("source"), col("doc_id"))
  }

  val packSequencesSql: String =
    s"""SELECT source, doc_id, n_tokens,
       |  cum_before,
       |  cum_before // 64 AS seq_first,
       |  cum_before % 64 AS seq_offset,
       |  CASE WHEN n_tokens = 0 THEN 0
       |       ELSE (cum_before + n_tokens - 1) // 64 - cum_before // 64 + 1
       |  END AS n_seqs
       |FROM (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM (SELECT source, doc_id, len($tokensSql) AS n_tokens FROM documents)
       |)
       |ORDER BY source, doc_id""".stripMargin

  /** Greedy per-source token-budget selection: walk each source in doc_id
    * order and keep documents while the running total is under budget — the
    * "give me ~N tokens per source" sampling step of a corpus recipe. Same
    * two-level prefix-sum shape as packing; the filter is on its result. */
  def budgetSelect(spark: SparkSession, dir: String, budget: Long = 300L): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    TwoLevel.cumBefore(
        TwoLevel.withIdRangeBucket(d, "source", "doc_id", "__b"),
        Seq("source"), "__b", Seq(col("doc_id")), "n_tokens", "cum_before")
      .drop("__b")
      .filter(col("cum_before") < budget)
      .orderBy(col("source"), col("doc_id"))
  }

  /** One micro-batch of STREAMING token-budget selection — corpus
    * assembly at INGEST time (a crawl keeps admitting documents per
    * source until that source's token budget fills). The keep rule
    * `cum_before < budget` is PREFIX-CLOSED under id-ordered arrival: a
    * doc's cumulative-before depends only on earlier-id docs of its
    * source, so decisions at arrival are final. State under
    * `statePath`:
    *  - `srctot`  — (source, n) per-epoch token totals; fold = the
    *    count-sum monoid (totals count ALL arrived docs, kept or not —
    *    the batch rule's running sum does);
    *  - `results` — kept docs with their cum_before, append-only.
    * Per-epoch cost: one within-batch TwoLevel prefix sum + a broadcast
    * join against the O(|sources|) folded totals. Epoch-keyed
    * overwrites derived from state < epoch — replay-idempotent. */
  /** Shared core of the streaming per-source prefix-sum operators
    * (budget admission, sequence packing): per-source running token
    * totals (count-sum LogState monoid) + a within-batch TwoLevel
    * prefix sum; `finish` maps the cum-annotated batch frame
    * (source, doc_id, n_tokens, cum_before) to the epoch's result
    * delta. Both operators' decisions are pure functions of cum_before,
    * which is prefix-closed under id-ordered arrival — decisions at
    * arrival are final. */
  private def cumStreamApplyBatch(batch: DataFrame, epoch: Long,
                                  statePath: String, phasePrefix: String,
                                  compactEvery: Int)(
                                  finish: DataFrame => DataFrame): Unit = {
    val sp = batch.sparkSession
    val tEpoch = System.nanoTime()
    Seq("srctot", "results").foreach(r =>
      graft.tools.LogState.requireNoFuture(s"$statePath/$r", epoch))
    val d = batch
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .stage()
    // ADMISSION CONTRACT, enforced (VERDICT r15 #4): the keep rules
    // downstream are prefix-closed only under PER-SOURCE id-ordered
    // arrival — a doc arriving after a larger-id doc of its source
    // would silently shift every later cum_before. Rather than corrupt
    // state, fail fast: epoch-keyed high-water-mark FILES (the CdcUpsert
    // watermark pattern — a LogState log here charged every epoch an
    // extra write + fold job, 2.2× on the tiny-scale bench) record each
    // source's max doc_id; a batch carrying doc_id ≤ its source's mark
    // is rejected before any state write. The per-epoch cost is ONE
    // bounded aggregate (O(|sources|) rows collected). Upstream has two
    // remedies: deliver in id order, or quarantine stragglers with the
    // shared [[graft.ops.CdcUpsert.withLateness]] wrapper the way
    // [[budgetSelectStreamLate]] does. Replay stays legal: the guard
    // reads marks strictly OLDER than this epoch, and the epoch's file
    // derives from those marks + the batch alone.
    val marksRoot = s"$statePath/maxid"
    val marks = graft.tools.HighWaterMarks.readAsOf(marksRoot, epoch - 1)
    val ranges = d.groupBy(col("source"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bad = ranges.filter { case (s, lo, _) =>
      marks.get(s).exists(lo <= _) }
    if (bad.nonEmpty) throw new IllegalStateException(
      s"cum stream epoch $epoch: sources ${bad.map(_._1).mkString(",")} " +
        "arrive at or below their high-water doc_id — per-source " +
        "id-ordered admission violated; deliver in order or quarantine " +
        "via withLateness")
    if (ranges.nonEmpty)
      graft.tools.HighWaterMarks.write(marksRoot, epoch,
        marks ++ ranges.map { case (s, _, hi) =>
          s -> math.max(marks.getOrElse(s, Long.MinValue), hi) })
    val local = TwoLevel.cumBefore(
        TwoLevel.withIdRangeBucket(d, "source", "doc_id", "__b"),
        Seq("source"), "__b", Seq(col("doc_id")), "n_tokens", "loc_before")
      .drop("__b")
    val histPaths =
      graft.tools.LogState.pathsAsOf(s"$statePath/srctot", epoch - 1)
    val hist =
      if (histPaths.isEmpty)
        d.select(col("source"), lit(0L).as("n")).limit(0)
      else sp.read.parquet(histPaths: _*)
    val histTot = hist.groupBy(col("source")).agg(sum(col("n")).as("h"))
    val res = finish(local
        .join(broadcast(histTot), Seq("source"), "left_outer")
        .na.fill(0L, Seq("h"))
        .withColumn("cum_before", col("h") + col("loc_before"))
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("cum_before")))
      .withColumn("epoch", lit(epoch))
    d.groupBy(col("source")).agg(sum(col("n_tokens")).as("n"))
      .write.mode("overwrite").parquet(s"$statePath/srctot/delta/v$epoch")
    res.write.mode("overwrite")
      .parquet(s"$statePath/results/delta/v$epoch")
    graft.tools.LogState.maintain(sp, Seq(s"$statePath/srctot"), epoch,
      compactEvery)(_.groupBy(col("source")).agg(sum(col("n")).as("n")))
    graft.tools.LogState.maintain(sp, Seq(s"$statePath/results"), epoch,
      compactEvery)(identity)
    graft.tools.PhaseTiming.record(f"$phasePrefix$epoch%03d",
      (System.nanoTime() - tEpoch) / 1e9)
  }

  def budgetStreamApplyBatch(batch: DataFrame, epoch: Long,
                             statePath: String, budget: Long = 300L,
                             compactEvery: Int = 4): Unit =
    cumStreamApplyBatch(batch, epoch, statePath, "budepoch",
      compactEvery)(_.filter(col("cum_before") < budget))

  /** One micro-batch of STREAMING sequence packing — slot assignment at
    * INGEST: each arriving document gets its training-sequence span
    * (seq_first / seq_offset / n_seqs) the moment it lands, because the
    * per-source token prefix is prefix-closed under id-ordered arrival.
    * This is how a shard writer packs on the fly instead of re-running
    * a global prefix sum over the whole corpus per refresh. */
  def packStreamApplyBatch(batch: DataFrame, epoch: Long,
                           statePath: String, seqLen: Int = 64,
                           compactEvery: Int = 4): Unit =
    cumStreamApplyBatch(batch, epoch, statePath, "packepoch",
      compactEvery)(
      _.withColumn("seq_first", expr(s"cum_before div $seqLen"))
        .withColumn("seq_offset", expr(s"cum_before % $seqLen"))
        // zero-token guard — see packSequences (div-vs-floor divergence)
        .withColumn("n_seqs", when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr(s"(cum_before + n_tokens - 1) div $seqLen")
            - col("seq_first") + lit(1L))))

  /** STREAMING sequence packing through the HASH GATE: id-range batches,
    * folded slot assignments must equal batch [[packSequences]] — the
    * SAME oracle. A history total lost across an epoch edge shifts every
    * later doc's span and breaks the hash. */
  def packSequencesStream(spark: SparkSession, dir: String,
                          seqLen: Int = 64, epochs: Int = 4): DataFrame = {
    val base = graft.tools.StateCache.getOrBuild(
      "corpus_pack_stream",
      s"$dir@${graft.tools.ArtifactCache.dirToken(dir)}|$seqLen|$epochs") { root =>
      val statePath = s"$root/state"
      val all = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text")).stage()
      val mm = all.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val width = (hi - lo) / epochs + 1
      (0 until epochs).foreach { k =>
        packStreamApplyBatch(
          all.filter(expr(s"(doc_id - $lo) div $width") === k),
          k, statePath, seqLen, compactEvery = 2)
      }
    }
    spark.read.parquet(graft.tools.LogState.pathsAsOf(
        s"$base/state/results", epochs - 1L): _*)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_before"), col("seq_first"), col("seq_offset"),
        col("n_seqs"))
      .stage()
      .orderBy(col("source"), col("doc_id"))
  }

  /** STREAMING budget select through the HASH GATE: contiguous id-range
    * batches (arrival order = id order — the prefix-closure regime),
    * folded kept set must equal batch [[budgetSelect]] — the SAME
    * oracle. A history total that drops unkept docs' tokens, a
    * double-counted replay, or a budget boundary crossed mid-batch all
    * move cum_before and break the hash. */
  def budgetSelectStream(spark: SparkSession, dir: String,
                         budget: Long = 300L,
                         epochs: Int = 4): DataFrame = {
    val base = graft.tools.StateCache.getOrBuild(
      "corpus_budget_stream",
      s"$dir@${graft.tools.ArtifactCache.dirToken(dir)}|$budget|$epochs") { root =>
      val statePath = s"$root/state"
      val all = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text")).stage()
      val mm = all.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val width = (hi - lo) / epochs + 1
      (0 until epochs).foreach { k =>
        budgetStreamApplyBatch(
          all.filter(expr(s"(doc_id - $lo) div $width") === k),
          k, statePath, budget, compactEvery = 2)
      }
    }
    spark.read.parquet(graft.tools.LogState.pathsAsOf(
        s"$base/state/results", epochs - 1L): _*)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_before"))
      .stage()
      .orderBy(col("source"), col("doc_id"))
  }

  val budgetSelectSql: String =
    s"""SELECT source, doc_id, n_tokens, cum_before FROM (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM (SELECT source, doc_id, len($tokensSql) AS n_tokens FROM documents)
       |)
       |WHERE cum_before < 300
       |ORDER BY source, doc_id""".stripMargin

  /** STREAMING budget select under EVENT-TIME LATENESS (VERDICT r15 #4
    * — the assembly tier where the hazard is sharpest: a late doc that
    * slipped into the fold would shift every later doc's running total
    * for its source). Same protocol as the four dedup streaming tiers:
    * each id-range batch passes through [[CdcUpsert.withLateness]]
    * before touching the budget state — rows whose event time sits
    * below the carried watermark are quarantined (epoch-keyed,
    * auditable, replay-idempotent) and NEVER enter the running totals;
    * on-time rows flow to [[budgetStreamApplyBatch]] unchanged, and
    * because batches are contiguous id ranges the on-time stream stays
    * id-ordered, so the prefix-closure argument (and the admission
    * guard) hold over exactly the admitted docs. Event times are a
    * planted deterministic function of doc_id (the substring-late
    * recipe: docs with doc_id % 7 == 3 arriving in epoch ≥ 2 carry an
    * event time two epochs old — some fall under the watermark, some
    * are tolerated disorder, so both paths are exercised). Output =
    * folded kept set over on-time docs UNION quarantine rows
    * (budget fields null, quarantine epoch carried); the oracle
    * replays the dense watermark recurrence in SQL and recomputes the
    * prefix-sum over exactly the on-time docs — a leaked late doc, a
    * misclassified tolerated doc, or a dropped quarantine row breaks
    * the hash. */
  def budgetSelectStreamLate(spark: SparkSession, dir: String,
                             budget: Long = BudgetDefault,
                             epochs: Int = StreamLateEpochs,
                             latenessMicros: Long = StreamLatenessMicros): DataFrame = {
    val base = graft.tools.StateCache.getOrBuild(
      "corpus_budget_stream_late",
      s"$dir@${graft.tools.ArtifactCache.dirToken(dir)}|$budget|$epochs|$latenessMicros") { root =>
      val budState = s"$root/state"
      val lateState = s"$root/late"
      val all = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text")).stage()
      val mm = all.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val width = (hi - lo) / epochs + 1
      val staged = all
        .withColumn("arr_epoch", expr(s"(doc_id - $lo) div $width"))
        .withColumn("src_epoch",
          when(col("doc_id") % 7 === 3 && col("arr_epoch") >= 2,
            col("arr_epoch") - 2).otherwise(col("arr_epoch")))
        .withColumn("ts_us",
          col("src_epoch") * 1000000L + (col("doc_id") * 131 % 997) * 1000L)
        .stage()
      (0 until epochs).foreach { k =>
        CdcUpsert.withLateness(
          staged.filter(col("arr_epoch") === k)
            .select(col("doc_id"), col("source"), col("text"), col("ts_us")),
          k, lateState, latenessMicros, col("ts_us")) { onTime =>
          budgetStreamApplyBatch(
            onTime.select(col("doc_id"), col("source"), col("text")),
            k, budState, budget, compactEvery = 2)
        }
      }
    }
    val kept = spark.read.parquet(graft.tools.LogState.pathsAsOf(
        s"$base/state/results", epochs - 1L): _*)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_before"),
        lit(null).cast("long").as("quarantine_epoch"))
    val quar = CdcUpsert.quarantineAsOf(spark, s"$base/late", epochs - 1L)
      .map(_.select(col("source"), col("doc_id"),
        lit(null).cast("long").as("n_tokens"),
        lit(null).cast("long").as("cum_before"),
        col("quarantine_epoch").cast("long")))
      .getOrElse(kept.limit(0))
    kept.unionByName(quar).stage().orderBy(col("doc_id"))
  }

  /** STREAMING sequence packing under EVENT-TIME LATENESS (r16 — the
    * pack tier's twin of [[budgetSelectStreamLate]]; a late doc slipping
    * into the fold would shift every later doc's slot assignment for
    * its source): same protocol — id-range batches through
    * [[CdcUpsert.withLateness]], late docs quarantined before the
    * prefix-sum state, on-time stream stays id-ordered so the admission
    * guard and prefix-closure hold over admitted docs. Output = folded
    * slot assignments over on-time docs UNION quarantine rows (pack
    * fields null, quarantine epoch carried). */
  def packSequencesStreamLate(spark: SparkSession, dir: String,
                              seqLen: Int = SeqLenDefault,
                              epochs: Int = StreamLateEpochs,
                              latenessMicros: Long = StreamLatenessMicros): DataFrame = {
    val base = graft.tools.StateCache.getOrBuild(
      "corpus_pack_stream_late",
      s"$dir@${graft.tools.ArtifactCache.dirToken(dir)}|$seqLen|$epochs|$latenessMicros") { root =>
      val packState = s"$root/state"
      val lateState = s"$root/late"
      val all = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text")).stage()
      val mm = all.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val width = (hi - lo) / epochs + 1
      val staged = all
        .withColumn("arr_epoch", expr(s"(doc_id - $lo) div $width"))
        .withColumn("src_epoch",
          when(col("doc_id") % 7 === 3 && col("arr_epoch") >= 2,
            col("arr_epoch") - 2).otherwise(col("arr_epoch")))
        .withColumn("ts_us",
          col("src_epoch") * 1000000L + (col("doc_id") * 131 % 997) * 1000L)
        .stage()
      (0 until epochs).foreach { k =>
        CdcUpsert.withLateness(
          staged.filter(col("arr_epoch") === k)
            .select(col("doc_id"), col("source"), col("text"), col("ts_us")),
          k, lateState, latenessMicros, col("ts_us")) { onTime =>
          packStreamApplyBatch(
            onTime.select(col("doc_id"), col("source"), col("text")),
            k, packState, seqLen, compactEvery = 2)
        }
      }
    }
    val kept = spark.read.parquet(graft.tools.LogState.pathsAsOf(
        s"$base/state/results", epochs - 1L): _*)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_before"), col("seq_first"), col("seq_offset"),
        col("n_seqs"),
        lit(null).cast("long").as("quarantine_epoch"))
    val quar = CdcUpsert.quarantineAsOf(spark, s"$base/late", epochs - 1L)
      .map(_.select(col("source"), col("doc_id"),
        lit(null).cast("long").as("n_tokens"),
        lit(null).cast("long").as("cum_before"),
        lit(null).cast("long").as("seq_first"),
        lit(null).cast("long").as("seq_offset"),
        lit(null).cast("long").as("n_seqs"),
        col("quarantine_epoch").cast("long")))
      .getOrElse(kept.limit(0))
    kept.unionByName(quar).stage().orderBy(col("doc_id"))
  }

  /** Oracle of [[packSequencesStreamLate]]: the budget-late watermark
    * recurrence, then the packing arithmetic over on-time docs only,
    * UNION the quarantine rows. */
  val packSequencesStreamLateSql: String =
    s"""WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi
       |           FROM documents),
       |d0 AS (
       |  SELECT d.doc_id, d.source, d.text,
       |    (d.doc_id - b.lo) // ((b.hi - b.lo) // $StreamLateEpochs + 1) AS arr_epoch
       |  FROM documents d, b),
       |t AS (
       |  SELECT doc_id, source, text, arr_epoch,
       |    (CASE WHEN doc_id % 7 = 3 AND arr_epoch >= 2
       |          THEN arr_epoch - 2 ELSE arr_epoch END) * 1000000
       |      + (doc_id * 131 % 997) * 1000 AS ts_us
       |  FROM d0),
       |m AS (SELECT arr_epoch, MAX(ts_us) AS mx FROM t GROUP BY arr_epoch),
       |w AS (SELECT g.epoch,
       |        MAX(m.mx) OVER (ORDER BY g.epoch
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          - $StreamLatenessMicros AS wm
       |      FROM range(0, $StreamLateEpochs) g(epoch) LEFT JOIN m ON m.arr_epoch = g.epoch),
       |lt AS (SELECT t.*, CASE WHEN p.wm IS NOT NULL AND t.ts_us < p.wm
       |              THEN 1 ELSE 0 END AS late
       |       FROM t LEFT JOIN w p ON p.epoch = t.arr_epoch - 1),
       |sel AS (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM (SELECT source, doc_id, len($tokensSql) AS n_tokens
       |        FROM lt WHERE late = 0))
       |SELECT source, doc_id, n_tokens, cum_before,
       |  cum_before // $SeqLenDefault AS seq_first,
       |  cum_before % $SeqLenDefault AS seq_offset,
       |  CASE WHEN n_tokens = 0 THEN 0
       |       ELSE (cum_before + n_tokens - 1) // $SeqLenDefault
       |            - cum_before // $SeqLenDefault + 1
       |  END AS n_seqs,
       |  CAST(NULL AS BIGINT) AS quarantine_epoch
       |FROM sel
       |UNION ALL
       |SELECT source, doc_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       |  CAST(arr_epoch AS BIGINT)
       |FROM lt WHERE late = 1
       |ORDER BY doc_id""".stripMargin

  /** Oracle of [[budgetSelectStreamLate]]: dense watermark recurrence
    * (the q100/substring-late pattern) over the SAME derived event
    * times, then the per-source prefix-sum keep rule over exactly the
    * on-time docs, UNION the late rows with their quarantine epoch. */
  val budgetSelectStreamLateSql: String =
    s"""WITH b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi
       |           FROM documents),
       |d0 AS (
       |  SELECT d.doc_id, d.source, d.text,
       |    (d.doc_id - b.lo) // ((b.hi - b.lo) // $StreamLateEpochs + 1) AS arr_epoch
       |  FROM documents d, b),
       |t AS (
       |  SELECT doc_id, source, text, arr_epoch,
       |    (CASE WHEN doc_id % 7 = 3 AND arr_epoch >= 2
       |          THEN arr_epoch - 2 ELSE arr_epoch END) * 1000000
       |      + (doc_id * 131 % 997) * 1000 AS ts_us
       |  FROM d0),
       |m AS (SELECT arr_epoch, MAX(ts_us) AS mx FROM t GROUP BY arr_epoch),
       |w AS (SELECT g.epoch,
       |        MAX(m.mx) OVER (ORDER BY g.epoch
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          - $StreamLatenessMicros AS wm
       |      FROM range(0, $StreamLateEpochs) g(epoch) LEFT JOIN m ON m.arr_epoch = g.epoch),
       |lt AS (SELECT t.*, CASE WHEN p.wm IS NOT NULL AND t.ts_us < p.wm
       |              THEN 1 ELSE 0 END AS late
       |       FROM t LEFT JOIN w p ON p.epoch = t.arr_epoch - 1),
       |sel AS (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM (SELECT source, doc_id, len($tokensSql) AS n_tokens
       |        FROM lt WHERE late = 0))
       |SELECT source, doc_id, n_tokens, cum_before,
       |  CAST(NULL AS BIGINT) AS quarantine_epoch
       |FROM sel WHERE cum_before < $BudgetDefault
       |UNION ALL
       |SELECT source, doc_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       |  CAST(arr_epoch AS BIGINT)
       |FROM lt WHERE late = 1
       |ORDER BY doc_id""".stripMargin

  /** Deterministic global shuffle + shard assignment — the dataloader
    * SHARDING step of a pretraining recipe (r16): every training run
    * needs the corpus in a shuffled order, split into S equal shards,
    * reproducible across reruns and engines with NO seed file. The
    * permutation is the seedless md5(doc_id) order this repo
    * standardizes (det_split / balanceByLang), the global rank comes
    * from the [[TwoLevel]] md5-prefix bucket decomposition — bucket-
    * local windows + broadcast prefix counts, NO global sort at any
    * corpus size — and shards fill ROUND-ROBIN over that rank, so
    * shard sizes differ by ≤1 and each shard is itself an unbiased
    * sample of the corpus (an interleave of the permutation, not a
    * contiguous block — the property that lets a run train on a shard
    * subset without distribution shift). At 100 TB the output is
    * written partitioned by `shard`; pos gives the within-shard read
    * order. */
  def shuffleShards(spark: SparkSession, dir: String,
                    shards: Int = ShardsDefault): DataFrame = {
    import spark.implicits._
    // GLOBAL rank with no unpartitioned window anywhere (the fleet-wide
    // ban PlanRegressionSpec enforces): stratify by the md5's LEADING
    // hex char (16 real strata — a constant stratum would constant-fold
    // out of the window spec and leave the bucket-offset prefix sum
    // unpartitioned), rank within strata via TwoLevel, then lift to the
    // global order with a 16-row driver-side offset fold (bounded by
    // construction — the k-limited-collect discipline). The md5 order
    // is unchanged: the stratum is a prefix of the sort key.
    val ranked = TwoLevel.rank(
        TwoLevel.withMd5Bucket(
          Tables.documents(spark, dir).select(col("doc_id")),
          col("doc_id").cast("string"), "__o", "__b")
          .withColumn("__s", substring(col("__o"), 1, 1)),
        Seq("__s"), "__b", Seq(col("__o"), col("doc_id")), "rk",
        stratumTotalOut = Some("__tot"))
      .stage()
    val totals = ranked.select(col("__s"), col("__tot")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (s, t) =>
      val o = (s, acc); acc += t; o }
    ranked
      .join(broadcast(offsets.toSeq.toDF("__s", "__off")), Seq("__s"))
      .withColumn("gr", col("__off") + col("rk"))
      .withColumn("shard", ((col("gr") - 1) % shards).cast("long"))
      .withColumn("pos", expr(s"(gr - 1) div $shards"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  val shuffleShardsSql: String =
    s"""SELECT doc_id,
      |  CAST((rk - 1) % $ShardsDefault AS BIGINT) AS shard,
      |  CAST((rk - 1) // $ShardsDefault AS BIGINT) AS pos
      |FROM (
      |  SELECT doc_id, ROW_NUMBER() OVER (
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |ORDER BY shard, pos""".stripMargin

  /** PER-EPOCH reshuffle (VERDICT r16 #5): [[shuffleShards]] fixes ONE
    * permutation, but a training run wants a DIFFERENT document order
    * each epoch without rewriting storage — the "reshuffle each epoch"
    * dial of a dataloader. Salting the seedless md5 key with the epoch
    * (`md5(doc_id || ':' || epoch)`) gives one independent deterministic
    * permutation per epoch from the same corpus scan; each rides the
    * SAME TwoLevel decomposition (strata = (epoch, md5-prefix char) —
    * per-epoch bucket-local windows, still no unpartitioned window, no
    * global sort) and fills shards round-robin, so every (epoch, shard)
    * is balanced-within-1 and an unbiased interleave of its epoch's
    * permutation. The offset fold collects epochs × 16 stratum totals —
    * bounded by construction. At 100 TB the epoch fan-out is a narrow
    * flatMap over (doc_id) — the corpus body is scanned once and never
    * replicated; output is written partitioned by (epoch, shard). */
  def shuffleShardsEpochs(spark: SparkSession, dir: String,
                          shards: Int = ShardsDefault,
                          epochs: Int = ShuffleEpochsDefault): DataFrame = {
    import spark.implicits._
    val salted = TwoLevel.withMd5Bucket(
        Tables.documents(spark, dir).select(col("doc_id"))
          .withColumn("epoch",
            explode(expr(s"sequence(0L, ${epochs - 1}L)"))),
        concat(col("doc_id").cast("string"), lit(":"),
          col("epoch").cast("string")),
        "__o", "__b")
      .withColumn("__s", substring(col("__o"), 1, 1))
    val ranked = TwoLevel.rank(salted, Seq("epoch", "__s"), "__b",
        Seq(col("__o"), col("doc_id")), "rk",
        stratumTotalOut = Some("__tot"))
      .stage()
    // epochs × 16 stratum totals — the k-limited-collect discipline
    val totals = ranked.select(col("epoch"), col("__s"), col("__tot"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (e, ts) =>
      var acc = 0L
      ts.sortBy(_._2).map { case (_, s, t) =>
        val o = (e, s, acc); acc += t; o }
    }
    ranked
      .join(broadcast(offsets.toDF("epoch", "__s", "__off")),
        Seq("epoch", "__s"))
      .withColumn("gr", col("__off") + col("rk"))
      .withColumn("shard", ((col("gr") - 1) % shards).cast("long"))
      .withColumn("pos", expr(s"(gr - 1) div $shards"))
      .select(col("doc_id"), col("epoch"), col("shard"), col("pos"))
      .orderBy(col("epoch"), col("shard"), col("pos"))
  }

  /** Oracle of [[shuffleShardsEpochs]]: the same per-epoch ROW_NUMBER
    * over the salted md5 order — derived from the SAME constants as the
    * Scala defaults. */
  val shuffleShardsEpochsSql: String =
    s"""SELECT doc_id, epoch,
      |  CAST((rk - 1) % $ShardsDefault AS BIGINT) AS shard,
      |  CAST((rk - 1) // $ShardsDefault AS BIGINT) AS pos
      |FROM (
      |  SELECT d.doc_id, e.epoch, ROW_NUMBER() OVER (
      |    PARTITION BY e.epoch
      |    ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':'
      |                   || CAST(e.epoch AS VARCHAR)), d.doc_id) AS rk
      |  FROM documents d, range(0, $ShuffleEpochsDefault) e(epoch))
      |ORDER BY epoch, shard, pos""".stripMargin

  /** CURRICULUM ordering for the dataloader — competence-based training
    * order (Platanios et al., NAACL 2019; CCNet's head→middle→tail is
    * the standard LLM instance): documents are phased by the
    * [[TextAnalysis.qualityBuckets]] LM-familiarity bucket (head = 0
    * first), shuffled WITHIN each phase by a salted seedless md5
    * permutation (`md5('c:' || doc_id)` — independent of the
    * [[shuffleShards]] key), and dealt round-robin into shards. Round-
    * robin preserves the curriculum per shard: shard s reads positions
    * s, s+shards, … — head docs first, tail last — while every shard
    * stays balanced-within-1.
    *
    * Global rank with NO unpartitioned window (the fleet-wide ban):
    * strata = (bucket, leading md5 hex char) — ≤ 3×16 real strata —
    * ranked via [[TwoLevel]], lifted to the global curriculum order by
    * a ≤48-row driver-side offset fold (bounded by construction). The
    * familiarity chain underneath is lmScore's bigram-equi-join plan;
    * the curriculum layer itself adds one narrow shuffle of
    * (doc_id, bucket, key) rows. */
  def curriculumOrder(spark: SparkSession, dir: String,
                      shards: Int = ShardsDefault): DataFrame = {
    import spark.implicits._
    val phased = TextAnalysis.qualityPhases(spark, dir)
    val salted = TwoLevel.withMd5Bucket(phased,
        concat(lit("c:"), col("doc_id").cast("string")), "__o", "__b")
      .withColumn("__s", substring(col("__o"), 1, 1))
    val ranked = TwoLevel.rank(salted, Seq("bucket", "__s"), "__b",
        Seq(col("__o"), col("doc_id")), "rk",
        stratumTotalOut = Some("__tot"))
      .stage()
    // ≤ 3 buckets × 16 hex strata — the k-limited-collect discipline;
    // offsets accumulate ACROSS buckets (one global curriculum order)
    val totals = ranked.select(col("bucket"), col("__s"), col("__tot"))
      .distinct().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    var acc = 0L
    val offsets = totals.map { case (b, s, t) =>
      val o = (b, s, acc); acc += t; o }
    ranked
      .join(broadcast(offsets.toSeq.toDF("bucket", "__s", "__off")),
        Seq("bucket", "__s"))
      .withColumn("gr", col("__off") + col("rk"))
      .withColumn("shard", ((col("gr") - 1) % shards).cast("long"))
      .withColumn("pos", expr(s"(gr - 1) div $shards"))
      .select(col("doc_id"), col("bucket"), col("shard"), col("pos"))
      .orderBy(col("doc_id"))
  }

  /** Oracle of [[curriculumOrder]]: the quality-buckets oracle verbatim
    * as the phase, then ROW_NUMBER over (bucket, salted md5) — derived
    * from the same [[ShardsDefault]]. */
  lazy val curriculumSql: String =
    s"""WITH qb AS (
       |${TextAnalysis.qualityBucketsSql}),
       |r AS (SELECT doc_id, bucket, ROW_NUMBER() OVER (
       |        ORDER BY bucket, md5('c:' || CAST(doc_id AS VARCHAR)),
       |                 doc_id) AS gr
       |      FROM qb)
       |SELECT doc_id, bucket,
       |  CAST((gr - 1) % $ShardsDefault AS BIGINT) AS shard,
       |  CAST((gr - 1) // $ShardsDefault AS BIGINT) AS pos
       |FROM r ORDER BY doc_id""".stripMargin

  /** Per-language sampling rates for [[sampleStratified]] — exact
    * binary fractions so the hex thresholds are exact; the oracle CASE
    * derives from the SAME map (the q103 shared-constant pattern). */
  val SampleRates: Map[String, (Long, Long)] = Map(
    "en" -> (3L, 4L), "zh" -> (1L, 2L))
  val SampleDefaultRate: (Long, Long) = (1L, 4L)

  /** rate → the 16-hex-digit threshold a uniform md5 prefix compares
    * against: floor(16¹⁶ · num / den), zero-padded lowercase — string
    * order on lowercase hex IS numeric order, in both engines. */
  private[graft] def hexThreshold(num: Long, den: Long): String = {
    // num >= den would emit a 17-char hex string, the pad expression
    // would go negative-length, and the string compare against a 16-char
    // md5 prefix would silently keep ~6 % instead of all rows (ADVICE
    // r17) — a keep-everything rate needs no sampling predicate at all.
    require(num > 0 && num < den,
      s"sampling rate must satisfy 0 < num < den, got $num/$den")
    val t = (BigInt(16).pow(16) * num / den).toString(16)
    ("0" * (16 - t.length)) + t
  }

  /** DETERMINISTIC STRATIFIED SAMPLING — reproducible per-stratum
    * downsampling (the "keep 25 % of web, 75 % of English, 50 % of zh"
    * dial every corpus recipe has): keep a document iff the first 16
    * hex chars of `md5(doc_id || ':smp')` fall below its language's
    * exact-fraction threshold. Membership is a pure function of the
    * DOCUMENT — unlike rank- or reservoir-based sampling, growing the
    * corpus never flips an earlier document's membership (the
    * append-stability property incremental pipelines need; spec-pinned).
    * Plan: one narrow predicate on a column-pruned scan — no shuffle,
    * no state, embarrassingly parallel at any scale. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    sampleStratifiedDocs(Tables.documents(spark, dir))

  private[graft] def sampleStratifiedDocs(docs: DataFrame): DataFrame = {
    val thr = SampleRates.foldLeft(
        lit(hexThreshold(SampleDefaultRate._1, SampleDefaultRate._2))) {
      case (els, (lang, (n, d))) =>
        when(col("lang") === lang, lit(hexThreshold(n, d))).otherwise(els)
    }
    docs.select(col("doc_id"), col("lang"), col("source"))
      .filter(substring(md5(concat(col("doc_id").cast("string"),
        lit(":smp"))), 1, 16) < thr)
      .orderBy(col("doc_id"))
  }

  /** Oracle of [[sampleStratified]] — thresholds interpolated from the
    * same [[SampleRates]]. */
  lazy val sampleStratifiedSql: String = {
    val cases = SampleRates.toSeq.sortBy(_._1).map { case (lang, (n, d)) =>
      s"WHEN '$lang' THEN '${hexThreshold(n, d)}'"
    }.mkString(" ")
    s"""SELECT doc_id, lang, source FROM documents
       |WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':smp'), 1, 16)
       |  < CASE lang $cases
       |    ELSE '${hexThreshold(SampleDefaultRate._1, SampleDefaultRate._2)}' END
       |ORDER BY doc_id""".stripMargin
  }

  /** END-TO-END DATALOADER ASSEMBLY through the HASH GATE — the
    * assembly-side integration (`pipeline_curation` composed the
    * cleaning side in r16; this composes the four dataloader stages
    * over one another):
    *
    *   1. [[sampleStratified]] — reproducible per-language subsample;
    *   2. [[mixTemperatureDocs]] over the SAMPLED pool — α = ½ targets
    *      with the exact-budget largest-remainder top-up;
    *   3. replicate — each document becomes `repeats` training
    *      instances (a narrow generator, zero shuffle);
    *   4. shuffle+shard — instances permute by the seedless
    *      `md5(doc_id ':' rep)` key through the TwoLevel strata rank
    *      (no global sort, no unpartitioned window) and deal
    *      round-robin into [[ShardsDefault]] shards.
    *
    * Every stage is integer-/md5-exact, so the oracle replays the WHOLE
    * chain — a sampling flip, a one-token budget miss, a lost or extra
    * replica, or a permutation divergence anywhere breaks one hash.
    * Scale shape: the stages compose scans and one narrow rank shuffle;
    * the only driver folds are one row per language and 16 stratum
    * offsets. */
  def dataloaderPipeline(spark: SparkSession, dir: String,
                         totalBudget: Long = MixTempBudgetDefault,
                         shards: Int = ShardsDefault): DataFrame = {
    import spark.implicits._
    val reps = dataloaderInstances(spark, dir, totalBudget)
    val salted = TwoLevel.withMd5Bucket(reps,
        concat(col("doc_id").cast("string"), lit(":"),
          col("rep").cast("string")), "__o", "__b")
      .withColumn("__s", substring(col("__o"), 1, 1))
    val ranked = TwoLevel.rank(salted, Seq("__s"), "__b",
        Seq(col("__o"), col("doc_id"), col("rep")), "rk",
        stratumTotalOut = Some("__tot"))
      .stage()
    val totals = ranked.select(col("__s"), col("__tot")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (s, t) => val o = (s, acc); acc += t; o }
    ranked
      .join(broadcast(offsets.toSeq.toDF("__s", "__off")), Seq("__s"))
      .withColumn("gr", col("__off") + col("rk"))
      .withColumn("shard", ((col("gr") - 1) % shards).cast("long"))
      .withColumn("pos", expr(s"(gr - 1) div $shards"))
      .select(col("lang"), col("doc_id"), col("rep"), col("shard"),
        col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** The sample→temper→replicate chain as shared oracle CTEs (ending at
    * `inst`, the training-instance table): [[dataloaderPipelineSql]],
    * [[dataloaderCurriculumSql]] and (via the pipeline oracle)
    * [[dataloaderResumeSql]] all replay the SAME pool — one definition
    * so the three capstones cannot drift apart. */
  private lazy val dataloaderInstSql: String = {
    val cases = SampleRates.toSeq.sortBy(_._1).map { case (lang, (n, dn)) =>
      s"WHEN '$lang' THEN '${hexThreshold(n, dn)}'"
    }.mkString(" ")
    s"""sm AS (
       |  SELECT lang, doc_id, CAST(len($tokensSql) AS BIGINT) AS n_tokens
       |  FROM documents
       |  WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':smp'), 1, 16)
       |    < CASE lang $cases
       |      ELSE '${hexThreshold(SampleDefaultRate._1, SampleDefaultRate._2)}' END),
       |p AS (SELECT lang, SUM(n_tokens) AS pool FROM sm GROUP BY 1),
       |w AS (SELECT lang, pool,
       |        CAST(floor(sqrt(CAST(pool AS DOUBLE)) * $MixTempScale)
       |          AS BIGINT) AS w
       |      FROM p),
       |s AS (SELECT CAST(SUM(w) AS HUGEINT) AS wsum FROM w),
       |b AS (SELECT lang, pool,
       |        CAST($MixTempBudgetDefault AS HUGEINT) * w // wsum AS t0,
       |        CAST($MixTempBudgetDefault AS HUGEINT) * w % wsum AS rem
       |      FROM w CROSS JOIN s),
       |lf AS (SELECT $MixTempBudgetDefault - SUM(t0) AS lft FROM b),
       |r AS (SELECT lang, pool,
       |        CAST(t0 + CASE WHEN ROW_NUMBER() OVER
       |            (ORDER BY rem DESC, lang) <= lft
       |          THEN 1 ELSE 0 END AS BIGINT) AS target
       |      FROM b CROSS JOIN lf),
       |c AS (SELECT lang, doc_id, n_tokens,
       |        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
       |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS BIGINT) AS cum_before
       |      FROM sm),
       |rp AS (SELECT c.lang, doc_id,
       |         CAST(target // pool +
       |           CASE WHEN cum_before < target % pool THEN 1 ELSE 0 END
       |           AS BIGINT) AS repeats
       |       FROM c JOIN r ON c.lang = r.lang),
       |inst AS (SELECT lang, doc_id, CAST(u AS BIGINT) AS rep
       |         FROM rp, unnest(range(0, repeats)) t(u))""".stripMargin
  }

  /** Oracle of [[dataloaderPipeline]] — the full chain replayed:
    * sample predicate, tempered targets over the sampled pool,
    * prefix-sum repeats, per-instance md5 permutation. Constants
    * shared throughout. */
  lazy val dataloaderPipelineSql: String =
    s"""WITH $dataloaderInstSql,
       |rk AS (SELECT lang, doc_id, rep, ROW_NUMBER() OVER (
       |         ORDER BY md5(CAST(doc_id AS VARCHAR) || ':'
       |                        || CAST(rep AS VARCHAR)),
       |                  doc_id, rep) AS gr
       |       FROM inst)
       |SELECT lang, doc_id, rep,
       |  CAST((gr - 1) % $ShardsDefault AS BIGINT) AS shard,
       |  CAST((gr - 1) // $ShardsDefault AS BIGINT) AS pos
       |FROM rk
       |ORDER BY shard, pos""".stripMargin

  /** The sampled→tempered→replicated training-instance table (lang,
    * doc_id, rep) — the Scala twin of [[dataloaderInstSql]], shared by
    * [[dataloaderPipeline]] and [[dataloaderCurriculum]] so the two
    * capstones assemble the SAME pool by construction. */
  private def dataloaderInstances(spark: SparkSession, dir: String,
                                  totalBudget: Long): DataFrame = {
    val sampled = sampleStratifiedDocs(Tables.documents(spark, dir))
      .join(Tables.documents(spark, dir).select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens")),
        Seq("doc_id"))
      .select(col("lang"), col("doc_id"), col("n_tokens"))
    mixTemperatureDocs(sampled, totalBudget)
      .filter(col("repeats") > 0L)
      .withColumn("rep", explode(expr("sequence(0L, repeats - 1L)")))
      .select(col("lang"), col("doc_id"), col("rep"))
  }

  /** The assembled dataloader schedules are deterministic functions of
    * (corpus, budget, shards[, epochs]), and the three RESUME gates
    * measure cursor persistence + the suffix filter — NOT assembly
    * construction, which stays timed under its own names
    * (pipeline_dataloader / _curriculum / the epochs fan-out). So the
    * resume gates read the assembly from a once-per-JVM parquet artifact
    * (the q99 / sim_recall discipline): the build stays visible as a
    * `<kind>.build` bench phase, and [[graft.tools.ArtifactCache]]'s
    * dirToken invalidates it if the corpus is rebuilt in place. Params
    * are folded into the kind so different budgets/shards never share an
    * artifact. */
  private def cachedAssembly(spark: SparkSession, dir: String, kind: String)
                            (build: => DataFrame): DataFrame =
    graft.tools.ArtifactCache.parquet(spark, dir, kind) { p =>
      build.write.parquet(p)
    }

  /** MID-EPOCH DATALOADER RESUME through the HASH GATE (VERDICT r17 #6
    * — real training jobs restart; the assembly must hand back exactly
    * the untrained suffix). The cursor is a per-shard high-water mark
    * `(epoch 0, shard → pos)` persisted through
    * [[graft.tools.HighWaterMarks]] — the same tiny-atomic-file pattern
    * the id-ordered-admission guards use — and the READ-BACK marks (not
    * the in-memory ones) drive the filter, so the persistence
    * round-trip is load-bearing in the gate. The gate's cursor is
    * mid-epoch by construction: shard s trained through
    * pos < max(pos) div 2 (a pure function of the assembled epoch, so
    * the oracle replays it in closed form at any SF). Resume emits the
    * suffix WITH ITS ORIGINAL (shard, pos) — a trainer concatenating
    * prefix + resume gets the identical epoch order, spec-pinned
    * disjointly in CorpusSpec.
    *
    * Scale shape: [[dataloaderPipeline]]'s plan plus one ≤`shards`-row
    * driver fold (the cursor), a broadcast join, and a narrow filter —
    * nothing new shuffles. */
  def dataloaderResume(spark: SparkSession, dir: String,
                       totalBudget: Long = MixTempBudgetDefault,
                       shards: Int = ShardsDefault): DataFrame = {
    import spark.implicits._
    val full = cachedAssembly(spark, dir, s"dl_asm_${totalBudget}_$shards")(
      dataloaderPipeline(spark, dir, totalBudget, shards))
    // ≤ `shards` rows — the k-limited-collect discipline
    val cuts = full.groupBy(col("shard"))
      .agg(expr("max(pos) div 2").as("cut"))
      .collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    val root = graft.tools.TempDirs.createFast("graft-dlresume")
    try {
      graft.tools.HighWaterMarks.write(s"$root/cursor", 0L, cuts)
      val got = graft.tools.HighWaterMarks.readAsOf(s"$root/cursor", 0L)
      val cursor = got.toSeq.map { case (k, v) => (k.toLong, v) }
        .toDF("shard", "cut")
      full.join(broadcast(cursor), Seq("shard"))
        .filter(col("pos") >= col("cut"))
        .select(col("lang"), col("doc_id"), col("rep"), col("shard"),
          col("pos"))
        .orderBy(col("shard"), col("pos"))
    } finally graft.tools.TempDirs.deleteRecursively(root)
  }

  /** Oracle of [[dataloaderResume]]: the full assembly, filtered by the
    * same closed-form mid-epoch cursor — suffix rows keep their
    * original (shard, pos). */
  // plain concatenation, NOT an outer stripMargin: the embedded assembly
  // SQL has `||` concat operators at line starts, and a second stripMargin
  // pass would eat their first pipe (Binder Error: '|'(VARCHAR, VARCHAR))
  lazy val dataloaderResumeSql: String =
    "WITH asm AS (\n" + dataloaderPipelineSql + "),\n" +
      "cur AS (SELECT shard, MAX(pos) // 2 AS cut FROM asm GROUP BY shard)\n" +
      "SELECT f.lang, f.doc_id, f.rep, f.shard, f.pos\n" +
      "FROM asm f JOIN cur ON cur.shard = f.shard\n" +
      "WHERE f.pos >= cur.cut\n" +
      "ORDER BY f.shard, f.pos"

  /** Epochs in the multi-epoch dataloader schedule (kept small — the
    * gate's cost is pool × epochs; the epoch-boundary semantics are
    * identical at any count). The resume cursor sits at epochs/2, so 3
    * exercises all three regimes: a fully-trained epoch 0, a mid-epoch
    * cut at 1, an untouched epoch 2. */
  val DataloaderEpochsDefault = 3

  /** The instance pool fanned across `epochs` INDEPENDENT salted
    * permutations — [[dataloaderPipeline]]'s assembly composed with the
    * [[shuffleShardsEpochs]] recipe (salt = doc:rep:epoch; strata =
    * (epoch, md5-prefix char); per-epoch offset fold, ≤ epochs×16 rows;
    * round-robin dealing per epoch). The corpus chain runs ONCE — the
    * epoch fan-out is a narrow explode over the slim (lang, doc_id,
    * rep) pool, never the text. */
  private def dataloaderEpochsAssembly(spark: SparkSession, dir: String,
                                       totalBudget: Long, shards: Int,
                                       epochs: Int): DataFrame = {
    import spark.implicits._
    val reps = dataloaderInstances(spark, dir, totalBudget)
      .withColumn("epoch", explode(expr(s"sequence(0L, ${epochs - 1}L)")))
    val salted = TwoLevel.withMd5Bucket(reps,
        concat(col("doc_id").cast("string"), lit(":"),
          col("rep").cast("string"), lit(":"),
          col("epoch").cast("string")), "__o", "__b")
      .withColumn("__s", substring(col("__o"), 1, 1))
    val ranked = TwoLevel.rank(salted, Seq("epoch", "__s"), "__b",
        Seq(col("__o"), col("doc_id"), col("rep")), "rk",
        stratumTotalOut = Some("__tot"))
      .stage()
    // epochs × 16 stratum totals — the k-limited-collect discipline
    val totals = ranked.select(col("epoch"), col("__s"), col("__tot"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (e, ts) =>
      var acc = 0L
      ts.sortBy(_._2).map { case (_, s, t) =>
        val o = (e, s, acc); acc += t; o }
    }
    ranked
      .join(broadcast(offsets.toDF("epoch", "__s", "__off")),
        Seq("epoch", "__s"))
      .withColumn("gr", col("__off") + col("rk"))
      .withColumn("shard", ((col("gr") - 1) % shards).cast("long"))
      .withColumn("pos", expr(s"(gr - 1) div $shards"))
      .select(col("lang"), col("doc_id"), col("rep"), col("epoch"),
        col("shard"), col("pos"))
  }

  /** MULTI-EPOCH DATALOADER RESUME through the HASH GATE (VERDICT r18
    * #4 — [[dataloaderResume]] gates an epoch-0 cursor only, but a real
    * run restarts in the MIDDLE of epoch e of a multi-epoch schedule
    * where every epoch has its own shuffle): the cursor is
    * (epoch e, shard → pos) — e = epochs/2, per-shard cut =
    * max(pos) div 2 within epoch e, both pure functions of the
    * assembled schedule so the oracle replays them in closed form —
    * persisted through [[graft.tools.HighWaterMarks]] at version e and
    * READ BACK to drive the filter (the persistence round-trip is
    * load-bearing). Resume = the suffix of epoch e in ITS OWN salted
    * order, then epochs e+1.. untouched, every row with its ORIGINAL
    * (epoch, shard, pos) — so prefix ∪ resume == the full schedule
    * disjointly ACROSS the epoch boundary (spec-pinned). A cursor
    * applied to the wrong epoch's permutation, a suffix row re-dealt,
    * or an untouched later epoch perturbed all break the hash.
    *
    * Scale shape: the epoch assembly's plan plus one ≤shards-row
    * driver fold, a broadcast join, and a narrow filter — nothing new
    * shuffles. */
  def dataloaderResumeEpochs(spark: SparkSession, dir: String,
                             totalBudget: Long = MixTempBudgetDefault,
                             shards: Int = ShardsDefault,
                             epochs: Int = DataloaderEpochsDefault): DataFrame = {
    import spark.implicits._
    val full = cachedAssembly(spark, dir,
      s"dl_asm_epochs_${totalBudget}_${shards}_$epochs")(
      dataloaderEpochsAssembly(spark, dir, totalBudget, shards, epochs))
    val cutEpoch = epochs / 2
    // ≤ `shards` rows — the k-limited-collect discipline
    val cuts = full.filter(col("epoch") === cutEpoch)
      .groupBy(col("shard"))
      .agg(expr("max(pos) div 2").as("cut"))
      .collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    val root = graft.tools.TempDirs.createFast("graft-dlresumee")
    try {
      graft.tools.HighWaterMarks.write(s"$root/cursor", cutEpoch.toLong, cuts)
      val got = graft.tools.HighWaterMarks.readAsOf(s"$root/cursor",
        cutEpoch.toLong)
      val cursor = got.toSeq.map { case (k, v) => (k.toLong, v) }
        .toDF("shard", "cut")
      full.filter(col("epoch") >= cutEpoch)
        .join(broadcast(cursor), Seq("shard"))
        .filter(col("epoch") > cutEpoch || col("pos") >= col("cut"))
        .select(col("lang"), col("doc_id"), col("rep"), col("epoch"),
          col("shard"), col("pos"))
        .orderBy(col("epoch"), col("shard"), col("pos"))
    } finally graft.tools.TempDirs.deleteRecursively(root)
  }

  /** Oracle of [[dataloaderResumeEpochs]]: the shared instance CTEs
    * fanned across epochs with the same per-epoch salt, the closed-form
    * (epoch, shard → cut) cursor, suffix-of-epoch-e ∪ later epochs. */
  lazy val dataloaderResumeEpochsSql: String = {
    val e = DataloaderEpochsDefault
    val cut = e / 2
    s"WITH $dataloaderInstSql,\n" +
      "rk AS (SELECT i.lang, i.doc_id, i.rep, e.epoch, ROW_NUMBER() OVER (\n" +
      "         PARTITION BY e.epoch\n" +
      "         ORDER BY md5(CAST(i.doc_id AS VARCHAR) || ':'\n" +
      "                        || CAST(i.rep AS VARCHAR) || ':'\n" +
      "                        || CAST(e.epoch AS VARCHAR)),\n" +
      "                  i.doc_id, i.rep) AS gr\n" +
      s"       FROM inst i CROSS JOIN range(0, $e) e(epoch)),\n" +
      "asm AS (SELECT lang, doc_id, rep, epoch,\n" +
      s"          CAST((gr - 1) % $ShardsDefault AS BIGINT) AS shard,\n" +
      s"          CAST((gr - 1) // $ShardsDefault AS BIGINT) AS pos\n" +
      "        FROM rk),\n" +
      s"cur AS (SELECT shard, MAX(pos) // 2 AS cut FROM asm\n" +
      s"        WHERE epoch = $cut GROUP BY shard)\n" +
      "SELECT a.lang, a.doc_id, a.rep, a.epoch, a.shard, a.pos\n" +
      "FROM asm a JOIN cur ON cur.shard = a.shard\n" +
      s"WHERE a.epoch > $cut OR (a.epoch = $cut AND a.pos >= cur.cut)\n" +
      "ORDER BY a.epoch, a.shard, a.pos"
  }

  /** CURRICULUM-ORDERED RESUME through the HASH GATE (VERDICT r18 #4's
    * second arm): the mid-epoch cursor applied to the
    * [[dataloaderCurriculum]] assembly — a restart inside a quality
    * phase must hand back the untrained suffix WITHOUT reordering
    * phases. Positions are curriculum-ordered (bucket-major), so the
    * per-shard `max(pos) div 2` cut lands mid-phase by construction and
    * the suffix keeps each row's ORIGINAL (bucket, shard, pos): a
    * resume that re-ranked the suffix (restarting a phase, or letting a
    * later bucket jump the cut) breaks the hash; the monotone-phase and
    * disjoint-union properties are spec-pinned beside the batch
    * curriculum's. */
  def dataloaderCurriculumResume(spark: SparkSession, dir: String,
                                 totalBudget: Long = MixTempBudgetDefault,
                                 shards: Int = ShardsDefault): DataFrame = {
    import spark.implicits._
    val full = cachedAssembly(spark, dir,
      s"dl_asm_curriculum_${totalBudget}_$shards")(
      dataloaderCurriculum(spark, dir, totalBudget, shards))
    // ≤ `shards` rows — the k-limited-collect discipline
    val cuts = full.groupBy(col("shard"))
      .agg(expr("max(pos) div 2").as("cut"))
      .collect().map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    val root = graft.tools.TempDirs.createFast("graft-dlcurresume")
    try {
      graft.tools.HighWaterMarks.write(s"$root/cursor", 0L, cuts)
      val got = graft.tools.HighWaterMarks.readAsOf(s"$root/cursor", 0L)
      val cursor = got.toSeq.map { case (k, v) => (k.toLong, v) }
        .toDF("shard", "cut")
      full.join(broadcast(cursor), Seq("shard"))
        .filter(col("pos") >= col("cut"))
        .select(col("lang"), col("doc_id"), col("rep"), col("bucket"),
          col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    } finally graft.tools.TempDirs.deleteRecursively(root)
  }

  /** Oracle of [[dataloaderCurriculumResume]]: the curriculum assembly
    * filtered by the same closed-form cursor — suffix rows keep their
    * original (bucket, shard, pos). Plain concatenation (see
    * [[dataloaderResumeSql]]'s stripMargin note). */
  lazy val dataloaderCurriculumResumeSql: String =
    "WITH asm AS (\n" + dataloaderCurriculumSql + "),\n" +
      "cur AS (SELECT shard, MAX(pos) // 2 AS cut FROM asm GROUP BY shard)\n" +
      "SELECT f.lang, f.doc_id, f.rep, f.bucket, f.shard, f.pos\n" +
      "FROM asm f JOIN cur ON cur.shard = f.shard\n" +
      "WHERE f.pos >= cur.cut\n" +
      "ORDER BY f.shard, f.pos"

  /** CURRICULUM-ORDERED DATALOADER ASSEMBLY through the HASH GATE
    * (VERDICT r17 #7 — [[curriculumOrder]] and [[dataloaderPipeline]]
    * were separate capstones; real runs want competence-ordered phases
    * OVER the sampled+tempered pool): the [[dataloaderInstances]] chain
    * builds the instance pool, each instance inherits its document's
    * [[TextAnalysis.qualityBuckets]] phase, instances order by
    * (bucket, salted md5 permutation within the phase — the
    * [[curriculumOrder]] `c:` salt extended with the replica index so
    * duplicates of one document still scatter within their phase), and
    * round-robin dealing preserves the curriculum per shard exactly as
    * in [[curriculumOrder]]. Shares BOTH existing oracles' constants
    * ([[SampleRates]]/[[MixTempBudgetDefault]] and the qualityBuckets
    * integer bucket rule); the monotone-phase-per-shard property is
    * spec-pinned over the mixed pool.
    *
    * Scale shape: the pool chain is [[dataloaderPipeline]]'s; the
    * phase join adds lmScore's bigram-equi-join plan; the rank is the
    * same TwoLevel strata decomposition with a ≤3×16-row driver offset
    * fold — still no global sort, no unpartitioned window. */
  def dataloaderCurriculum(spark: SparkSession, dir: String,
                           totalBudget: Long = MixTempBudgetDefault,
                           shards: Int = ShardsDefault): DataFrame = {
    import spark.implicits._
    val phased = dataloaderInstances(spark, dir, totalBudget)
      .join(TextAnalysis.qualityPhases(spark, dir), Seq("doc_id"))
    val salted = TwoLevel.withMd5Bucket(phased,
        concat(lit("c:"), col("doc_id").cast("string"), lit(":"),
          col("rep").cast("string")), "__o", "__b")
      .withColumn("__s", substring(col("__o"), 1, 1))
    val ranked = TwoLevel.rank(salted, Seq("bucket", "__s"), "__b",
        Seq(col("__o"), col("doc_id"), col("rep")), "rk",
        stratumTotalOut = Some("__tot"))
      .stage()
    // ≤ 3 buckets × 16 hex strata — the k-limited-collect discipline;
    // offsets accumulate ACROSS buckets (one global curriculum order)
    val totals = ranked.select(col("bucket"), col("__s"), col("__tot"))
      .distinct().collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    var acc = 0L
    val offsets = totals.map { case (b, s, t) =>
      val o = (b, s, acc); acc += t; o }
    ranked
      .join(broadcast(offsets.toSeq.toDF("bucket", "__s", "__off")),
        Seq("bucket", "__s"))
      .withColumn("gr", col("__off") + col("rk"))
      .withColumn("shard", ((col("gr") - 1) % shards).cast("long"))
      .withColumn("pos", expr(s"(gr - 1) div $shards"))
      .select(col("lang"), col("doc_id"), col("rep"), col("bucket"),
        col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Oracle of [[dataloaderCurriculum]]: the shared instance CTEs, the
    * qualityBuckets oracle verbatim as the phase, ROW_NUMBER over
    * (bucket, salted per-instance md5). */
  lazy val dataloaderCurriculumSql: String =
    s"""WITH qb AS (
       |${TextAnalysis.qualityBucketsSql}),
       |$dataloaderInstSql,
       |rk AS (SELECT i.lang, i.doc_id, i.rep, qb.bucket,
       |         ROW_NUMBER() OVER (
       |           ORDER BY qb.bucket,
       |                    md5('c:' || CAST(i.doc_id AS VARCHAR) || ':'
       |                          || CAST(i.rep AS VARCHAR)),
       |                    i.doc_id, i.rep) AS gr
       |       FROM inst i JOIN qb ON qb.doc_id = i.doc_id)
       |SELECT lang, doc_id, rep, bucket,
       |  CAST((gr - 1) % $ShardsDefault AS BIGINT) AS shard,
       |  CAST((gr - 1) // $ShardsDefault AS BIGINT) AS pos
       |FROM rk
       |ORDER BY shard, pos""".stripMargin

  /** PADDED sequence packing — the document-boundary-respecting recipe
    * (SFT / instruction-tuning runs pad rather than concat: attention
    * must not bleed across documents without masking): every document
    * starts a fresh sequence, spans ⌈n / seqLen⌉ of them, and its last
    * sequence carries `n_pad` padding tokens. Sequence ids are a
    * per-source prefix sum of the per-doc sequence counts — the same
    * [[TwoLevel]] decomposition as [[packSequences]], so the dominant
    * source still fans out across buckets instead of serializing. A
    * zero-token doc spans no sequences (n_seqs = 0, pad 0). Integer-
    * exact end to end; emits per-doc (seqs_before, n_seqs, n_pad) — the
    * padding column is what a mix planner aggregates to trade seqLen
    * against padding loss. */
  def packPadded(spark: SparkSession, dir: String,
                 seqLen: Int = SeqLenDefault): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("n_seqs",
        expr(s"(n_tokens + ${seqLen - 1}) div $seqLen"))
      .withColumn("n_pad", when(col("n_tokens") === 0L, lit(0L))
        .otherwise(col("n_seqs") * seqLen - col("n_tokens")))
    TwoLevel.cumBefore(
        TwoLevel.withIdRangeBucket(d, "source", "doc_id", "__b"),
        Seq("source"), "__b", Seq(col("doc_id")), "n_seqs", "seqs_before")
      .drop("__b")
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("seqs_before"), col("n_seqs"), col("n_pad"))
      .orderBy(col("source"), col("doc_id"))
  }

  val packPaddedSql: String = {
    val l = SeqLenDefault
    s"""SELECT source, doc_id, n_tokens,
       |  CAST(COALESCE(SUM(n_seqs) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS seqs_before,
       |  n_seqs, n_pad
       |FROM (
       |  SELECT source, doc_id, n_tokens,
       |    (n_tokens + ${l - 1}) // $l AS n_seqs,
       |    CASE WHEN n_tokens = 0 THEN 0
       |         ELSE ((n_tokens + ${l - 1}) // $l) * $l - n_tokens
       |    END AS n_pad
       |  FROM (SELECT source, doc_id, len($tokensSql) AS n_tokens
       |        FROM documents))
       |ORDER BY source, doc_id""".stripMargin
  }

  /** Sliding-window document CHUNKING with overlap — the retrieval /
    * long-context preprocessing step (every RAG index and most SFT
    * pipelines chunk documents into fixed windows with a stride so no
    * boundary sentence is lost to a hard cut): each document with ≥1
    * token emits windows of [[ChunkLenDefault]] tokens every
    * [[ChunkStrideDefault]] tokens; the LAST window is the first one
    * whose end reaches the document end (a short final window, never a
    * redundant tail). Chunk count = 1 + ⌈max(n − len, 0) / stride⌉ —
    * integer-exact, so the oracle reproduces text and counts bitwise.
    *
    * Scale: one narrow projection + an explode — no shuffle at all
    * until a consumer aggregates; the fan-out is size-proportional
    * (≈ n/stride rows per doc), the shape a 100 TB chunking pass
    * needs. */
  def chunkDocs(spark: SparkSession, dir: String,
                len: Int = ChunkLenDefault,
                stride: Int = ChunkStrideDefault): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("chunk_id", explode(expr(
        s"sequence(0L, (greatest(n - $len, 0L) + ${stride - 1}) div $stride)")))
      .withColumn("chunk_toks",
        expr(s"slice(tk, chunk_id * $stride + 1, $len)"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk_toks")).cast("long").as("n_tokens"),
        array_join(col("chunk_toks"), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Oracle of [[chunkDocs]] — same window arithmetic from the same
    * shared constants. */
  val chunkDocsSql: String = {
    val (l, st) = (ChunkLenDefault, ChunkStrideDefault)
    s"""SELECT doc_id, s AS chunk_id,
       |  CAST(len(tk[s * $st + 1 : s * $st + $l]) AS BIGINT) AS n_tokens,
       |  array_to_string(tk[s * $st + 1 : s * $st + $l], ' ') AS chunk_text
       |FROM (SELECT doc_id, $tokensSql AS tk FROM documents),
       |  unnest(range(0,
       |    (greatest(len(tk) - $l, 0) + ${st - 1}) // $st + 1)) AS u(s)
       |WHERE len(tk) > 0
       |ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** Mixture weighting — the data-MIXING step of a pretraining recipe
    * (fixed source weights à la The Pile, Gao et al. 2020; learned
    * variants like DoReMi produce the same artifact): given target token
    * SHARES per language (basis points) and a total token budget, emit a
    * deterministic repetition plan — every document's integer `repeats` =
    * full passes of its language pool (`target div pool`) plus one extra
    * pass on the md5-ranked prefix that fills the remainder
    * (`cum_before < target mod pool`), so each language's planned tokens
    * land within one document of `share × budget`. Upsampling (repeats
    * > 1 for high-weight languages) and downsampling (repeats = 0 outside
    * a prefix) fall out of the same arithmetic; the default budget
    * exercises both on the fixture. Integer-exact end to end.
    *
    * Scale: a |langs|-row aggregate broadcasts back; the prefix-sum runs
    * in the two-level form over md5-prefix buckets ([[TwoLevel]]) — no
    * global sort, no one-task-per-language serialization under a
    * dominant language, and the md5 rank keeps the plan a pure function
    * of stable ids (same reproducibility trick as balanceByLang /
    * text_det_split). */
  def mixWeights(spark: SparkSession, dir: String,
                 totalBudget: Long = 20000L): DataFrame = {
    val weightsBp = Seq(
      ("de", 1500L), ("en", 4000L), ("es", 1000L), ("fr", 1000L), ("zh", 2500L))
    import spark.implicits._
    val wdf = weightsBp.toDF("lang", "w_bp")
    val d = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    val tgt = d.groupBy(col("lang")).agg(sum(col("n_tokens")).as("pool"))
      .join(broadcast(wdf), Seq("lang"))
      .withColumn("target", expr(s"w_bp * $totalBudget div 10000"))
      .select(col("lang"), col("pool"), col("target"))
    TwoLevel.cumBefore(
        TwoLevel.withMd5Bucket(d, col("doc_id").cast("string"), "__o", "__b"),
        Seq("lang"), "__b", Seq(col("__o"), col("doc_id")),
        "n_tokens", "cum_before")
      .join(broadcast(tgt), Seq("lang"))
      .withColumn("repeats", expr("target div pool") +
        when(col("cum_before") < expr("target % pool"), lit(1L)).otherwise(lit(0L)))
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        col("cum_before"), col("repeats"))
      .orderBy(col("lang"), col("doc_id"))
  }

  val mixWeightsSql: String =
    s"""WITH d AS (
       |  SELECT lang, doc_id, CAST(len($tokensSql) AS BIGINT) AS n_tokens
       |  FROM documents),
       |w(lang, w_bp) AS (VALUES
       |  ('de', 1500), ('en', 4000), ('es', 1000), ('fr', 1000), ('zh', 2500)),
       |p AS (SELECT lang, SUM(n_tokens) AS pool FROM d GROUP BY 1),
       |t AS (SELECT p.lang, pool, w_bp * 20000 // 10000 AS target
       |      FROM p JOIN w ON p.lang = w.lang),
       |c AS (SELECT lang, doc_id, n_tokens,
       |        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
       |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |          AS cum_before
       |      FROM d)
       |SELECT c.lang AS lang, doc_id, n_tokens, cum_before,
       |  CAST(target // pool +
       |    CASE WHEN cum_before < target % pool THEN 1 ELSE 0 END AS BIGINT)
       |    AS repeats
       |FROM c JOIN t ON c.lang = t.lang
       |ORDER BY c.lang, doc_id""".stripMargin

  /** [[mixTemperature]]'s tunables, shared with its oracle. */
  val MixTempBudgetDefault = 20000L
  val MixTempScale = 1000000L

  /** TEMPERATURE-BASED source mixing — the multilingual upsampling
    * recipe (α = 1/2: sampling weight ∝ pool^α, the XLM-R/mBERT dial
    * that keeps low-resource languages from vanishing under
    * proportional sampling): per-language targets derive from the DATA
    * (unlike [[mixWeights]]' fixed basis points) as
    * w = floor(sqrt(pool) · 10⁶) — the floor-scale trick makes the only
    * non-integer step (sqrt, bitwise-identical across engines) an exact
    * integer before any arithmetic that could diverge. Targets are
    * budget·w div W plus a LARGEST-REMAINDER top-up ranked by
    * (remainder DESC, lang), so Σ targets == budget EXACTLY — the
    * invariant a token-budget contract needs. Target math runs
    * driver-side in BigInt over one row per language (bounded by
    * construction; overflow-proof at any pool size); per-doc repeats
    * ride the same TwoLevel prefix-sum decomposition as mixWeights. */
  def mixTemperature(spark: SparkSession, dir: String,
                     totalBudget: Long = MixTempBudgetDefault): DataFrame =
    mixTemperatureDocs(
      Tables.documents(spark, dir)
        .select(col("lang"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens")),
      totalBudget)

  /** [[mixTemperature]] over an arbitrary (lang, doc_id, n_tokens)
    * pool — the composition entry ([[dataloaderPipeline]] feeds the
    * SAMPLED pool through the same definition). */
  private[graft] def mixTemperatureDocs(d: DataFrame,
                                        totalBudget: Long): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    // one row per language — the k-limited-collect discipline
    val pools = d.groupBy(col("lang")).agg(sum(col("n_tokens")).as("pool"))
      .withColumn("w", expr(
        s"CAST(floor(sqrt(CAST(pool AS DOUBLE)) * $MixTempScale) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val wSum = pools.map(p => BigInt(p._3)).sum
    val base = pools.map { case (l, p, w) =>
      val prod = BigInt(totalBudget) * w
      (l, p, (prod / wSum).toLong, prod % wSum)
    }
    val leftover = totalBudget - base.map(_._3).sum
    val bumped = base.sortBy { case (l, _, _, rem) => (-rem, l) }
      .take(leftover.toInt).map(_._1).toSet
    val tgt = base.map { case (l, p, t, _) =>
      (l, p, t + (if (bumped(l)) 1L else 0L)) }
      .toSeq.toDF("lang", "pool", "target")
    TwoLevel.cumBefore(
        TwoLevel.withMd5Bucket(d, col("doc_id").cast("string"), "__o", "__b"),
        Seq("lang"), "__b", Seq(col("__o"), col("doc_id")),
        "n_tokens", "cum_before")
      .join(broadcast(tgt), Seq("lang"))
      .withColumn("repeats", expr("target div pool") +
        when(col("cum_before") < expr("target % pool"), lit(1L))
          .otherwise(lit(0L)))
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        col("cum_before"), col("target"), col("repeats"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Oracle of [[mixTemperature]] — sqrt floor-scale, HUGEINT products,
    * the same largest-remainder rank; constants shared. */
  lazy val mixTemperatureSql: String =
    s"""WITH d AS (
       |  SELECT lang, doc_id, CAST(len($tokensSql) AS BIGINT) AS n_tokens
       |  FROM documents),
       |p AS (SELECT lang, SUM(n_tokens) AS pool FROM d GROUP BY 1),
       |w AS (SELECT lang, pool,
       |        CAST(floor(sqrt(CAST(pool AS DOUBLE)) * $MixTempScale)
       |          AS BIGINT) AS w
       |      FROM p),
       |s AS (SELECT CAST(SUM(w) AS HUGEINT) AS wsum FROM w),
       |b AS (SELECT lang, pool,
       |        CAST($MixTempBudgetDefault AS HUGEINT) * w // wsum AS t0,
       |        CAST($MixTempBudgetDefault AS HUGEINT) * w % wsum AS rem
       |      FROM w CROSS JOIN s),
       |lf AS (SELECT $MixTempBudgetDefault - SUM(t0) AS lft FROM b),
       |r AS (SELECT lang, pool,
       |        CAST(t0 + CASE WHEN ROW_NUMBER() OVER
       |            (ORDER BY rem DESC, lang) <= lft
       |          THEN 1 ELSE 0 END AS BIGINT) AS target
       |      FROM b CROSS JOIN lf),
       |c AS (SELECT lang, doc_id, n_tokens,
       |        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
       |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS BIGINT) AS cum_before
       |      FROM d)
       |SELECT c.lang AS lang, doc_id, n_tokens, cum_before, target,
       |  CAST(target // pool +
       |    CASE WHEN cum_before < target % pool THEN 1 ELSE 0 END
       |    AS BIGINT) AS repeats
       |FROM c JOIN r ON c.lang = r.lang
       |ORDER BY c.lang, doc_id""".stripMargin

  /** Per-language corpus balancing: a deterministic uniform subsample of at
    * most `perLang` documents per language, ranked by md5(doc_id) — the
    * standard "don't let English drown the mixture" rebalance, reproducible
    * across runs because the rank is a pure function of the stable id
    * (same trick as text_det_split). The rank is [[TwoLevel.rank]] over
    * md5-prefix buckets — the exact scenario the two-level form exists
    * for, since the whole point of this operator is that one language
    * dominates the corpus. */
  def balanceByLang(spark: SparkSession, dir: String, perLang: Int = 40): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("lang"), col("doc_id"))
    TwoLevel.rank(
        TwoLevel.withMd5Bucket(d, col("doc_id").cast("string"), "__o", "__b"),
        Seq("lang"), "__b", Seq(col("__o"), col("doc_id")), "rk")
      .withColumn("rk", col("rk").cast("int"))
      .filter(col("rk") <= perLang)
      .select(col("lang"), col("doc_id"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** One micro-batch of STREAMING per-language balancing — the mixture
    * rebalance maintained at INGEST via the shared [[TopKStream]] core
    * (per-language K smallest md5 ranks; displacement semantics keep the
    * folded view equal to the batch sample — see TopKStream).
    * LATENESS CONTRACT (r16): unlike the prefix-sum assembly ops, the
    * top-K-merge fold is commutative/associative/idempotent over ALL
    * arrivals, so the folded winners are ARRIVAL-ORDER-INDEPENDENT — a
    * late document simply folds in (possibly displacing a winner, the
    * spec'd behavior); no quarantine or admission guard is needed for
    * correctness. */
  def balanceStreamApplyBatch(batch: DataFrame, epoch: Long,
                              statePath: String, perLang: Int = 40,
                              compactEvery: Int = 4): Unit = {
    val tEpoch = System.nanoTime()
    TopKStream.applyBatch(
      batch.select(col("lang"),
        md5(col("doc_id").cast("string")).as("ord"), col("doc_id")),
      epoch, statePath, "lang", perLang, compactEvery)
    graft.tools.PhaseTiming.record(f"balepoch$epoch%03d",
      (System.nanoTime() - tEpoch) / 1e9)
  }

  /** STREAMING balance through the HASH GATE: id-range batches, folded
    * per-language winner sets must equal batch [[balanceByLang]] — the
    * SAME oracle. A displacement the fold misses or a replay
    * double-publish breaks the hash. */
  def balanceByLangStream(spark: SparkSession, dir: String,
                          perLang: Int = 40, epochs: Int = 4): DataFrame = {
    val base = graft.tools.StateCache.getOrBuild(
      "corpus_balance_stream",
      s"$dir@${graft.tools.ArtifactCache.dirToken(dir)}|$perLang|$epochs") { root =>
      val statePath = s"$root/state"
      val all = Tables.documents(spark, dir)
        .select(col("lang"), col("doc_id")).stage()
      val mm = all.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val width = (hi - lo) / epochs + 1
      (0 until epochs).foreach { k =>
        balanceStreamApplyBatch(
          all.filter(expr(s"(doc_id - $lo) div $width") === k),
          k, statePath, perLang, compactEvery = 2)
      }
    }
    TopKStream.rankedAsOf(spark, s"$base/state", epochs - 1L, "lang", perLang)
      .getOrElse(sys.error("balance stream: no state"))
      .select(col("lang"), col("doc_id"), col("rk").cast("int").as("rk"))
      .stage()
      .orderBy(col("lang"), col("rk"))
  }

  val balanceByLangSql: String =
    """SELECT lang, doc_id, rk FROM (
      |  SELECT lang, doc_id,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
      |  FROM documents
      |)
      |WHERE rk <= 40
      |ORDER BY lang, rk""".stripMargin

  /** Shard-and-shuffle for training: assign each document to one of
    * `nShards` shards and give it a deterministic pseudo-random position
    * inside its shard (rank by md5 of the text). This is the global-shuffle
    * step before writing training shards — expressed as per-shard windows,
    * so no global sort: each shard's ordering is independent work after one
    * hash partition. */
  def shardShuffle(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(md5(col("text")), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("shard", col("doc_id") % nShards)
      .withColumn("pos", row_number().over(w))
      .select(col("shard"), col("pos"), col("doc_id"))
      .orderBy(col("shard"), col("pos"))
  }

  val shardShuffleSql: String =
    """SELECT shard, pos, doc_id FROM (
      |  SELECT doc_id % 8 AS shard,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id % 8
      |      ORDER BY md5(text), doc_id) AS INT) AS pos,
      |    doc_id
      |  FROM documents
      |)
      |ORDER BY shard, pos""".stripMargin

  /** Stratified train/val/test split with EXACT per-language proportions:
    * within each language, documents are ranked by md5(doc_id) (a
    * deterministic uniform shuffle, same trick as balanceByLang) and the
    * first 80% become train, the next 10% val, the rest test. Unlike a
    * bare hash-threshold split, small strata get their proportions
    * exactly — the property an eval-set builder actually needs.
    *
    * Scale posture: one hash-partition shuffle on (lang, md5 bucket) —
    * [[TwoLevel.rank]], so a dominant language fans out across its
    * buckets instead of one task; the per-stratum count is derived from
    * the same bucket totals (`stratumTotalOut`), so still no second pass
    * over the data and no driver-side sizes. */
  def splitTrainValTest(spark: SparkSession, dir: String,
                        trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("lang"), col("doc_id"))
    TwoLevel.rank(
        TwoLevel.withMd5Bucket(d, col("doc_id").cast("string"), "__o", "__b"),
        Seq("lang"), "__b", Seq(col("__o"), col("doc_id")), "rk",
        stratumTotalOut = Some("n"))
      .withColumn("split",
        when(col("rk") * 100 <= col("n") * trainPct, lit("train"))
          .when(col("rk") * 100 <= col("n") * (trainPct + valPct), lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy(col("doc_id"))
  }

  val splitTrainValTestSql: String =
    """SELECT doc_id, lang,
      |  CASE WHEN rk * 100 <= n * 80 THEN 'train'
      |       WHEN rk * 100 <= n * 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id, lang,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents
      |)
      |ORDER BY doc_id""".stripMargin

  /** Vocabulary pruning: build the corpus vocabulary, keep the top
    * `vocabSize` tokens by frequency (ties broken by token), and rewrite
    * every document replacing out-of-vocabulary tokens with `<unk>` — the
    * classic closed-vocab preprocessing step.
    *
    * The vocabulary is the only corpus-wide state and it is O(distinct
    * tokens); it broadcasts to the rewrite join, so the heavy side (the
    * exploded token stream) never shuffles for the lookup — the one shuffle
    * is the final per-document regroup. */
  def vocabPrune(spark: SparkSession, dir: String, vocabSize: Int = 20): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "token")))
    // Top-K by frequency via orderBy().limit() — plans as
    // TakeOrderedAndProject (per-partition heaps merged on the driver),
    // not a single-partition Window sort over every distinct token. Same
    // deterministic result (ties broken by token), but the vocabulary
    // ranking now scales with K, not with the vocabulary.
    val vocab = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(vocabSize)
      .select(col("token"), lit(1).as("kept"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("kept").isNull, lit("<unk>")).otherwise(col("token")).as("tok"),
        col("kept").isNull.cast("long").as("is_unk"))
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")),
          " ").as("pruned_text"),
        sum(col("is_unk")).as("n_unk"))
      .orderBy(col("doc_id"))
  }

  val vocabPruneSql: String =
    s"""WITH parts AS (
       |  SELECT doc_id, $tokensSql AS parts FROM documents
       |), tok AS (
       |  SELECT doc_id, pos, parts[pos] AS token FROM (
       |    SELECT doc_id, unnest(generate_series(1, len(parts))) AS pos, parts
       |    FROM parts)
       |), vocab AS (
       |  SELECT token FROM (
       |    SELECT token, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS vrk
       |    FROM tok GROUP BY token)
       |  WHERE vrk <= 20
       |)
       |SELECT t.doc_id,
       |  string_agg(CASE WHEN v.token IS NULL THEN '<unk>' ELSE t.token END,
       |             ' ' ORDER BY t.pos) AS pruned_text,
       |  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
       |FROM tok t LEFT JOIN vocab v ON t.token = v.token
       |GROUP BY t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** The corpus-assembly steps composed end to end — the shape of a real
    * "docs in, training shards out" job: length filter → exact dedup
    * (min-id winner) → per-language balance → shard assignment → per-shard
    * packing stats (how many `seqLen`-token sequences each shard yields).
    * One narrow pipeline per stage; the only shuffles are the dedup
    * group-by, the balance window, and the final per-shard rollup. */
  def shardsPipeline(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .filter(col("n_tokens") >= 15)
    // Dedup stage groups on the 128-bit content digest, not the text —
    // the shuffle carries 16 bytes/doc (see Dedup.exact for the rationale).
    val keep = base.select(md5(col("text")).as("digest"), col("doc_id"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val surv = base.join(keep, Seq("doc_id"), "left_semi")
    val balanced = TwoLevel.rank(
        TwoLevel.withMd5Bucket(surv, col("doc_id").cast("string"), "__o", "__b"),
        Seq("lang"), "__b", Seq(col("__o"), col("doc_id")), "rk")
      .filter(col("rk") <= 40)
    balanced
      .withColumn("shard", col("doc_id") % 4)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .withColumn("n_seqs", expr("(total_tokens + 63) div 64"))
      .orderBy(col("shard"))
  }

  val shardsPipelineSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, lang, text, len($tokensSql) AS n_tokens
       |  FROM documents
       |  WHERE len($tokensSql) >= 15
       |), keep AS (
       |  SELECT MIN(doc_id) AS doc_id FROM base GROUP BY md5(text)
       |), balanced AS (
       |  SELECT doc_id, n_tokens FROM (
       |    SELECT b.doc_id, b.n_tokens,
       |      ROW_NUMBER() OVER (PARTITION BY b.lang
       |        ORDER BY md5(CAST(b.doc_id AS VARCHAR)), b.doc_id) AS rk
       |    FROM base b JOIN keep k USING (doc_id))
       |  WHERE rk <= 40
       |)
       |SELECT doc_id % 4 AS shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  (CAST(SUM(n_tokens) AS BIGINT) + 63) // 64 AS n_seqs
       |FROM balanced
       |GROUP BY shard
       |ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------------
  // BPE merge-rule training (tokenizer training)
  // ---------------------------------------------------------------------

  /** Number of BPE merge rounds the gate trains. Production tokenizers
    * run 30k–100k merges over the same loop; the loop cost is per-round
    * aggregate + rewrite, independent of this constant's size. */
  val BpeMerges = 12

  /** Greedy leftmost merge of adjacent (l, r) in one symbol sequence —
    * the per-word rewrite of a BPE round (Sennrich et al., "Neural
    * Machine Translation of Rare Words with Subword Units", ACL 2016).
    * Left-fold form: merge when the accumulated tail equals `l` and the
    * next symbol equals `r`. Equivalent to the scan form: a merged
    * symbol `l+r` can never re-match `l` (that would need r = ""), so
    * the fold neither over- nor under-merges; for l == r runs it takes
    * positions 0-1, 2-3, … exactly like the scan. The DuckDB oracle
    * executes the same fold via list_reduce. */
  private[graft] def greedyMerge(syms: Seq[String], l: String,
                                 r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    syms.foreach { x =>
      if (out.nonEmpty && out.last == l && x == r) {
        out.remove(out.length - 1); out += (l + r)
      } else out += x
    }
    out.toSeq
  }

  /** Apply an ORDERED list of merges to one symbol sequence — the exact
    * sequential semantics, one [[greedyMerge]] pass per rule in order.
    * The batched trainer ships a whole round's rules through this in a
    * single distributed rewrite instead of one rewrite job per rule. */
  private[graft] def greedyMergeAll(syms: Seq[String],
                                    ms: Seq[(String, String)]): Seq[String] =
    ms.foldLeft(syms) { case (s, (l, r)) => greedyMerge(s, l, r) }

  /** Select the longest PREFIX of one round's pair-count table (rows in
    * the sequential argmax order: count DESC, l, r) that provably equals
    * the next |prefix| steps of the SEQUENTIAL trainer (VERDICT r11 #1 —
    * batching makes training O(merges / batch) driver round-trips
    * instead of O(merges)).
    *
    * Why a selected prefix replays sequentially byte-for-byte:
    *  - Batch members are pairwise symbol-DISJOINT (no l, r, or merged
    *    symbol l+r shared), so applying earlier members neither destroys
    *    nor creates occurrences of later members — each member's count
    *    at its sequential step equals its pre-table count (the recorded
    *    `pair_count` stays exact).
    *  - Each merged symbol m_i = l_i+r_i must be a string NEW to the
    *    vocabulary (`existingSyms` holds every multi-char symbol ever
    *    created: prior rounds' merges + `</w>`; initial symbols are
    *    single UTF-16 units, shorter than any m). Then no OLD pair's
    *    count can rise (a created occurrence always involves a
    *    new-string symbol), and every NEW pair (u, v) has exactly one
    *    pre-image boundary pair — (x, l_i), (r_i, y), or (r_i, l_j) —
    *    which SHARES a symbol with a member, so its count is bounded by
    *    the best-ranked sharing pair. The scan records that bound as
    *    `threat` = count of the FIRST row sharing a symbol with the
    *    selection or reusing an existing merged string (rows are
    *    count-sorted, so the first is the max; rows beyond the collected
    *    window are bounded by the window's last count). Keeping only
    *    members with count STRICTLY above the threat guarantees no new
    *    pair can outrank any kept member, even on ties (tie-break order
    *    is not inherited by new pairs).
    *  - Unselected non-sharing rows rank below every member in the
    *    (count, l, r) order and their counts never rise, so they stay
    *    below at every intermediate step.
    * If the filter empties the batch (threat ties the top count), the
    * head row alone is returned — the plain sequential argmax, always
    * exact — so every round makes progress.
    *
    * `sawWholeTable` = the rows passed in are the ENTIRE pair table; then
    * an absent threat means NO pair shares a symbol with the selection,
    * and no new pair can appear at all (a new pair needs a pre-existing
    * sharing occurrence), so the bound is -inf. */
  private[graft] def selectCommutingBatch(
      rows: Seq[(String, String, Long)], maxBatch: Int,
      sawWholeTable: Boolean,
      existingSyms: Set[String] = Set("</w>")): Seq[(String, String, Long)] = {
    if (rows.isEmpty) return Seq.empty
    val used = scala.collection.mutable.Set[String]()
    val selected = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var threat: Option[Long] = None
    val it = rows.iterator
    while (it.hasNext && threat.isEmpty) {
      val row @ (l, r, c) = it.next()
      if (used(l) || used(r) || used(l + r) || existingSyms(l + r))
        threat = Some(c)
      else if (selected.size < maxBatch) {
        selected += row; used += l; used += r; used += (l + r)
      } // rows beyond the cap: skip but keep scanning for the threat
    }
    val bound = threat.getOrElse(
      if (sawWholeTable) Long.MinValue else rows.last._3)
    val batch = selected.takeWhile(_._3 > bound).toSeq
    if (batch.isEmpty) Seq(rows.head) else batch
  }

  /** UTF-8 binary string order — Spark (UTF8String) and DuckDB both
    * compare strings by unsigned UTF-8 bytes; Java's compareTo (UTF-16
    * units) diverges for supplementary code points. Training tie-breaks
    * are (count DESC, l, r) in THIS order, so the in-memory trainer must
    * use it to stay bitwise-equal to the distributed loop. */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Exact in-memory BPE training over a collected word-type table —
    * the classic incremental algorithm (pair → containing-words index,
    * per-merge work proportional to AFFECTED word types), bitwise equal
    * to the distributed sequential loop by construction: same pair
    * counting (every adjacent position, weighted by type count), same
    * (count DESC, l, r) argmax under UTF-8 order, same [[greedyMerge]]
    * rewrite. Returns (merge table rows, final symbol arrays parallel to
    * the input). */
  private[graft] def bpeTrainLocalArrays(
      types: Array[(Array[String], Long)], merges: Int)
      : (Seq[(Int, String, String, String, Long)], Array[Array[String]]) = {
    val syms = types.map(_._1)
    val cnts = types.map(_._2)
    val pairCount = scala.collection.mutable.HashMap[(String, String), Long]()
    val pairWords = scala.collection.mutable.HashMap[(String, String),
      scala.collection.mutable.HashSet[Int]]()
    def addPairs(wid: Int, s: Array[String], sign: Long): Unit = {
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * cnts(wid)
        if (c == 0L) pairCount.remove(p) else pairCount.update(p, c)
        if (sign > 0)
          pairWords.getOrElseUpdate(p,
            scala.collection.mutable.HashSet[Int]()) += wid
        i += 1
      }
    }
    syms.indices.foreach(w => addPairs(w, syms(w), 1L))
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var round = 1
    var exhausted = false
    while (round <= merges && !exhausted) {
      var best: ((String, String), Long) = null
      pairCount.foreach { case e @ (p, c) =>
        if (best == null || c > best._2 || (c == best._2 && {
          val dl = utf8Compare(p._1, best._1._1)
          dl < 0 || (dl == 0 && utf8Compare(p._2, best._1._2) < 0)
        })) best = e
      }
      if (best == null) exhausted = true
      else {
        val ((l, r), c) = best
        learned += ((round, l, r, l + r, c))
        // stale ids tolerated: a word rewritten since it was indexed may
        // no longer hold the adjacency — the scan below re-verifies
        val affected = pairWords.remove((l, r))
          .getOrElse(scala.collection.mutable.HashSet[Int]())
        affected.foreach { wid =>
          val s = syms(wid)
          var has = false
          var i = 0
          while (!has && i < s.length - 1) {
            has = s(i) == l && s(i + 1) == r; i += 1
          }
          if (has) {
            addPairs(wid, s, -1L)
            val ns = greedyMerge(s.toSeq, l, r).toArray
            syms(wid) = ns
            addPairs(wid, ns, 1L)
          }
        }
        round += 1
      }
    }
    (learned.toSeq, syms)
  }

  /** One deterministic BPE training run over the corpus vocabulary:
    * word types weighted by occurrence count, initial symbols =
    * characters + a `</w>` end marker, `merges` rules of (count adjacent
    * pairs → (count DESC, l, r) argmax → greedy rewrite). Two engines,
    * one result (BpeSpec pins the three-way equality; the M=12
    * DuckDB-replay gate is unchanged):
    *
    *  - VOCABULARY FITS THE DRIVER (`nTypes <= localTypeBudget`, the
    *    common case — training input is vocabulary-sized by design, the
    *    SentencePiece posture): collect the type table ONCE and train
    *    in-memory with incremental pair-count maintenance. Driver-
    *    blocking Spark actions: O(1) regardless of merge count — 32k
    *    production merges stop being 32k sequential Spark jobs (the r11
    *    `weak` item).
    *  - OVER-BUDGET VOCABULARY: distributed rounds, each one map-side-
    *    partial pair aggregation + ONE bounded collect (top `topK`
    *    pairs) + one narrow rewrite shipping a provably-sequential
    *    PREFIX of the argmax order ([[selectCommutingBatch]]) —
    *    round-trips scale with merges/batch; localCheckpoint caps
    *    lineage at one round.
    *
    * Scale posture: the corpus-sized work is the ONE explode+groupBy
    * that builds the type table; the corpus never re-enters the loop. */
  private[graft] def bpeTrainUncached(spark: SparkSession, dir: String,
                                      merges: Int,
                                      maxBatch: Int = 64,
                                      localTypeBudget: Long = 1000000L): (DataFrame, DataFrame) = {
    import spark.implicits._
    var words = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        concat(split(col("word"), ""), array(lit("</w>"))))
      .stage()
    val nTypes = words.count()
    if (nTypes > 0 && nTypes <= localTypeBudget) {
      val t0 = System.nanoTime()
      // collect (word, cnt, initial syms) — the syms column itself, so
      // the local path inherits Spark's split semantics bit-for-bit
      val rows = words.select(col("word"), col("cnt"), col("syms"))
        .collect().map { r =>
          (r.getString(0), r.getLong(1),
            r.getSeq[String](2).toArray)
        }
      graft.tools.PhaseTiming.record("bpe_collect",
        (System.nanoTime() - t0) / 1e9)
      val t1 = System.nanoTime()
      val (learned, finals) =
        bpeTrainLocalArrays(rows.map(r => (r._3, r._2)), merges)
      graft.tools.PhaseTiming.record("bpe_train_local",
        (System.nanoTime() - t1) / 1e9)
      // driver-blocking actions in the whole training path: the type
      // count and the one collect
      graft.tools.RoutingMetrics.add("bpe_spark_rounds", 2L)
      val mtDf = learned
        .toDF("round", "l", "r", "merged", "pair_count")
      val wordsDf = rows.zip(finals)
        .map { case ((wd, c, _), fs) => (wd, c, fs.toSeq) }.toSeq
        .toDF("word", "cnt", "syms")
      return (mtDf, wordsDf)
    }
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    // the threat scan needs to see past the cap: collect a window large
    // enough that a truncated table still yields a useful (conservative)
    // bound from its last row
    val topK = math.max(maxBatch * 4, 64)
    val symSet = scala.collection.mutable.Set("</w>")
    var round = 1
    var exhausted = false
    var sparkRounds = 0
    while (round <= merges && !exhausted) {
      val tRound = System.nanoTime()
      val w = Window.partitionBy(col("word")).orderBy(col("pos"))
      val top = words
        .select(col("word"), col("cnt"),
          posexplode(col("syms")).as(Seq("pos", "s")))
        .withColumn("r", lead(col("s"), 1).over(w))
        .filter(col("r").isNotNull)
        .groupBy(col("s").as("l"), col("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(topK).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      sparkRounds += 1
      if (top.isEmpty) exhausted = true
      else {
        val batch = selectCommutingBatch(top,
          maxBatch = math.min(maxBatch, merges - round + 1),
          sawWholeTable = top.size < topK,
          existingSyms = symSet.toSet)
        batch.foreach { case (l, r, c) =>
          learned += ((round, l, r, l + r, c)); symSet += (l + r)
          round += 1
        }
        val rules = batch.map { case (l, r, _) => (l, r) }
        val mergeUdf = udf((syms: Seq[String]) => greedyMergeAll(syms, rules))
        words = words.withColumn("syms", mergeUdf(col("syms")))
          .stage()
        // per-Spark-round wall + rules shipped this round — the probe's
        // flatness evidence (names sort by round)
        graft.tools.PhaseTiming.record(
          f"bpe_round$sparkRounds%03d_x${batch.size}%02d",
          (System.nanoTime() - tRound) / 1e9)
      }
    }
    graft.tools.RoutingMetrics.add("bpe_spark_rounds", sparkRounds.toLong)
    (learned.toSeq.toDF("round", "l", "r", "merged", "pair_count"), words)
  }

  /** The learned merge table — the gate query: M rows of
    * (round, l, r, merged, pair_count), bitwise against a DuckDB oracle
    * that replays the identical training loop as M generated CTE stages
    * (pair counts + argmax + list_reduce rewrite per stage). */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeTrainCached(spark, dir)._1.orderBy(col("round"))

  /** ArtifactCache wrapper: merge table and final word representations
    * are both deterministic functions of the corpus — train once per
    * session, reuse across corpus_bpe and corpus_pack_bpe. */
  private def bpeTrainCached(spark: SparkSession,
                             dir: String): (DataFrame, DataFrame) = {
    val mt = graft.tools.ArtifactCache.parquet(spark, dir,
      s"bpe_merges_m$BpeMerges") { p =>
      val (m, w) = bpeTrainUncached(spark, dir, BpeMerges)
      m.write.mode("overwrite").parquet(p)
      w.select(col("word"), col("cnt"), col("syms"))
        .write.mode("overwrite").parquet(p + "_words")
    }
    val wordsPath = graft.tools.ArtifactCache.pathOf(dir,
      s"bpe_merges_m$BpeMerges").get + "_words"
    (mt, spark.read.parquet(wordsPath))
  }

  /** Sequence packing under the LEARNED tokenizer: identical prefix-sum
    * arithmetic to [[packSequences]], but each document's token count is
    * its BPE symbol count (sum over its words of the trained
    * representation's length) — the accounting a trainer actually packs
    * by. The vocabulary's (word → length) table broadcasts; the corpus
    * pays one narrow join, no re-tokenization loop. */
  def packSequencesBpe(spark: SparkSession, dir: String,
                       seqLen: Int = 64): DataFrame = {
    val wlen = bpeTrainCached(spark, dir)._2
      .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
    val d = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        explode(tokens(col("text"))).as("word"))
      .join(broadcast(wlen), Seq("word"))
      .groupBy(col("source"), col("doc_id"))
      .agg(sum(col("n_syms")).as("n_tokens"))
    TwoLevel.cumBefore(
        TwoLevel.withIdRangeBucket(d, "source", "doc_id", "__b"),
        Seq("source"), "__b", Seq(col("doc_id")), "n_tokens", "cum_before")
      .drop("__b")
      .withColumn("seq_first", expr(s"cum_before div $seqLen"))
      .withColumn("seq_offset", expr(s"cum_before % $seqLen"))
      // zero-token docs span no sequences — guarded explicitly because
      // at cum_before = 0 the unguarded (c + n - 1) term goes NEGATIVE,
      // where Spark's `div` truncates toward zero but DuckDB's `//`
      // floors (0 vs -1): the one input where the engines' integer
      // division disagrees
      .withColumn("n_seqs", when(col("n_tokens") === 0L, lit(0L))
        .otherwise(expr(s"(cum_before + n_tokens - 1) div $seqLen")
          - col("seq_first") + lit(1L)))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Tokenizer APPLICATION: rewrite every document as its BPE symbol
    * sequence under the trained merge table — the step that actually
    * feeds a trainer. The vocabulary's (word → joined symbols) table
    * broadcasts to the exploded token stream (same discipline as
    * vocabPrune's `<unk>` rewrite): the corpus pays one narrow join and
    * one per-doc regroup, never a per-word training replay. */
  def tokenizeBpe(spark: SparkSession, dir: String): DataFrame = {
    val words = bpeTrainCached(spark, dir)._2
      .select(col("word"), array_join(col("syms"), " ").as("wtoks"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "word")))
      .join(broadcast(words), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("wtoks")))),
          x => x.getField("wtoks"))).as("bpe_text"),
        count(lit(1)).as("n_words"))
      .orderBy(col("doc_id"))
  }

  /** The generated M-stage training replay shared by both BPE oracles:
    * w0 = char-split word types (+ `</w>`), then per stage k an argmax
    * CTE pk ((count DESC, l, r)-first adjacent pair over w(k-1)) and a
    * rewrite CTE wk (the same greedy fold as [[greedyMerge]], as a
    * list_reduce over single-element lists; LEFT JOIN ON TRUE keeps
    * words intact if pairs ever run dry, matching the Scala loop's
    * early stop).
    *
    * Every stage is AS MATERIALIZED: DuckDB's default CTE inlining
    * re-expands each referenced stage (~3x per reference), which is
    * exponential in the merge count — the unmaterialized form cost
    * 312 s (train) + 411 s (tokenize) at sf0.01 and blew the driver's
    * oracle budget in round 13; materialized, the same queries run in
    * well under a second (the WordPiece twin below already used this
    * discipline and runs in 0.1 s). */
  private def bpeStagesSql(merges: Int): String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT word, cnt, list_append(string_split(word, ''), '</w>') AS s
         |  FROM (
         |    SELECT word, COUNT(*) AS cnt FROM (
         |      SELECT unnest($tokensSql) AS word FROM documents)
         |    GROUP BY word))""".stripMargin
    val stages = (1 to merges).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT l, r, c FROM (
         |    SELECT s[i] AS l, s[i + 1] AS r, SUM(cnt) AS c
         |    FROM w${k - 1}, unnest(range(1, len(s))) AS t(i)
         |    GROUP BY 1, 2)
         |  ORDER BY c DESC, l, r LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT word, cnt,
         |    list_reduce(list_transform(s, x -> [x]),
         |      (acc, x) -> CASE WHEN acc[-1] = l AND x[1] = r
         |                  THEN acc[1:len(acc) - 1] || [l || r]
         |                  ELSE acc || x END) AS s
         |  FROM w${k - 1} LEFT JOIN p$k ON TRUE)""".stripMargin
    }
    (w0 +: stages).mkString(",\n")
  }

  val bpeMergesSql: String = {
    val arms = (1 to BpeMerges).map { k =>
      s"SELECT $k AS round, l, r, l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM p$k"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${bpeStagesSql(BpeMerges)}
       |SELECT * FROM (
       |  $arms)
       |ORDER BY round""".stripMargin
  }

  val tokenizeBpeSql: String =
    s"""WITH ${bpeStagesSql(BpeMerges)},
       |wt AS (SELECT word, array_to_string(s, ' ') AS wtoks FROM w$BpeMerges),
       |parts AS (SELECT doc_id, $tokensSql AS parts FROM documents),
       |t AS (
       |  SELECT doc_id, pos, parts[pos] AS word FROM (
       |    SELECT doc_id, unnest(generate_series(1, len(parts))) AS pos, parts
       |    FROM parts))
       |SELECT t.doc_id,
       |  string_agg(wt.wtoks, ' ' ORDER BY t.pos) AS bpe_text,
       |  COUNT(*) AS n_words
       |FROM t JOIN wt USING (word)
       |GROUP BY t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  val packSequencesBpeSql: String =
    s"""WITH ${bpeStagesSql(BpeMerges)},
       |wlen AS (SELECT word, CAST(len(s) AS BIGINT) AS n_syms FROM w$BpeMerges),
       |d AS (
       |  SELECT source, doc_id, CAST(SUM(n_syms) AS BIGINT) AS n_tokens
       |  FROM (SELECT source, doc_id, unnest($tokensSql) AS word FROM documents) t
       |  JOIN wlen USING (word)
       |  GROUP BY source, doc_id)
       |SELECT source, doc_id, n_tokens, cum_before,
       |  cum_before // 64 AS seq_first,
       |  cum_before % 64 AS seq_offset,
       |  CASE WHEN n_tokens = 0 THEN 0
       |       ELSE (cum_before + n_tokens - 1) // 64 - cum_before // 64 + 1
       |  END AS n_seqs
       |FROM (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM d)
       |ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Unigram-LM tokenizer trainer (SentencePiece-style, Kudo 2018)
  // ---------------------------------------------------------------------

  /** Viterbi segmentation of one word under a piece-count table: maximize
    * Σ ln(max(count, 1) / total) over pieces of length ≤ maxLen (the
    * hard-EM E-step and the application step share this). The count
    * floor keeps zero-usage single characters usable as fallback pieces
    * (SentencePiece's smoothing, simplified). Ties (exact score
    * equality) break to fewer pieces, then the lexicographically
    * smallest piece sequence — fully deterministic. A prefix unreachable
    * through the vocab falls back to its raw characters (covers
    * out-of-vocabulary characters at application time). */
  private[graft] def viterbiSegment(word: String, counts: Map[String, Long],
                                    total: Double,
                                    maxLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    // dp(i): best (score, nPieces, pieces) for the length-i prefix
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val nP = Array.fill(n + 1)(Int.MaxValue)
    val segs = Array.fill[List[String]](n + 1)(Nil)
    score(0) = 0.0; nP(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (score(j) > Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          counts.get(piece).foreach { c =>
            val s = score(j) + math.log(math.max(c, 1L).toDouble / total)
            val k = nP(j) + 1
            val cand = (piece :: segs(j))
            val better = s > score(i) || (s == score(i) && (k < nP(i) ||
              (k == nP(i) && lexLess(cand, segs(i)))))
            if (better) { score(i) = s; nP(i) = k; segs(i) = cand }
          }
        }
        j += 1
      }
      // unreachable prefix: emit the raw character and continue — the
      // out-of-vocab fallback (never triggers when training chars are in
      // the vocab, which the trainer guarantees on its own corpus)
      if (score(i) == Double.NegativeInfinity) {
        score(i) = score(i - 1); nP(i) = nP(i - 1) + 1
        segs(i) = word.substring(i - 1, i) :: segs(i - 1)
      }
      i += 1
    }
    segs(n).reverse
  }

  /** Reversed-list lexicographic compare (lists are built head-first). */
  private def lexLess(a: List[String], b: List[String]): Boolean = {
    val (ra, rb) = (a.reverse, b.reverse)
    val it = ra.iterator.zip(rb.iterator)
    while (it.hasNext) {
      val (x, y) = it.next()
      val c = x.compareTo(y)
      if (c != 0) return c < 0
    }
    ra.size < rb.size
  }

  /** All substrings of length 1..maxLen with positional multiplicity —
    * the unigram seed inventory of one word. */
  private[graft] def substringsOf(word: String,
                                  maxLen: Int): Seq[String] =
    for {
      i <- 0 until word.length
      l <- 1 to math.min(maxLen, word.length - i)
    } yield word.substring(i, i + l)

  /** Train a unigram-LM tokenizer (the OTHER production tokenizer family
    * beside BPE — VERDICT r12 #6) over any documents frame. Structure
    * (Kudo 2018, hard-EM form):
    *
    *  1. SEED: every substring of length ≤ `seedMaxLen` of every word
    *     type, weighted by occurrence (one explode + one aggregation);
    *     keep all single characters plus the top `seedSize` multi-char
    *     pieces by (count DESC, piece ASC).
    *  2. EM × `emIters`: E-step — Viterbi-segment each word TYPE under
    *     current counts (broadcast vocab map inside a UDF: a narrow map
    *     over types, no shuffle); M-step — usage = Σ word_count over the
    *     chosen segmentations (one aggregation), multi-char pieces with
    *     zero usage drop out, characters always survive.
    *  3. PRUNE to `vocabSize`: all characters + the top multi-char
    *     pieces by (usage DESC, piece ASC). (True SentencePiece prunes
    *     by likelihood LOSS; usage-rank is the deterministic
    *     simplification, exact on corpora without usage near-ties.)
    *
    * Spark-job budget: 1 type aggregation + 1 seed aggregation +
    * emIters × 1 usage aggregation — the bpeTrainUncached discipline;
    * the driver only ever holds the vocabulary (≤ chars + seedSize
    * rows), never word types. The float log-probs stay INSIDE the
    * Scala Viterbi (both training and application run this exact code),
    * so the fixture entries are rows-only and the hash gates run on the
    * planted corpus where the converged result is provable by
    * construction and the oracle SYNTHESIZES it (no cross-engine float
    * replay — the dedup clustered-gate pattern). */
  private[graft] def unigramTrainUncached(spark: SparkSession, docs: DataFrame,
                                          vocabSize: Int, seedMaxLen: Int = 4,
                                          seedSize: Int = 1000,
                                          emIters: Int = 2): Seq[(String, Long)] = {
    val words = docs
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .stage()
    val subUdf = udf((w: String) => substringsOf(w, seedMaxLen))
    val t0 = System.nanoTime()
    // seed selection stays DISTRIBUTED through the top-k: at a long seed
    // inventory (production SentencePiece runs maxLen ~8-16) the distinct
    // substring count is word-types × maxLen-ish — collecting it whole
    // breaks the "driver only ever holds the vocabulary" contract this
    // trainer documents (the first cut did exactly that; fixed when the
    // long-seed probe arm landed). (c, piece) is a total order, so the
    // distributed limit is deterministic.
    // localCheckpoint: the inventory aggregation feeds TWO collect
    // actions (single-char set + multi-char top-k) — without it the
    // explode+groupBy runs twice, in the stage the seed probe times.
    val seedAgg = words
      .select(col("cnt"), explode(subUdf(col("word"))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
      .stage()
    val chars0 = seedAgg.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val multi0 = seedAgg.filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece"))
      .limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Map[String, Long] = (chars0 ++ multi0).toMap
    graft.tools.PhaseTiming.record("unigram_seed",
      (System.nanoTime() - t0) / 1e9)
    for (it <- 1 to emIters) {
      val tIt = System.nanoTime()
      val total = vocab.values.map(math.max(_, 1L)).sum.toDouble
      val frozen = vocab
      val segUdf = udf((w: String) =>
        viterbiSegment(w, frozen, total, seedMaxLen))
      val usage = words
        .select(col("cnt"), explode(segUdf(col("word"))).as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      vocab = vocab.keysIterator.filter(_.length == 1)
        .map(ch => ch -> usage.getOrElse(ch, 0L)).toMap ++
        usage.filter { case (p, u) => p.length > 1 && u > 0 }
      // per-round timing: the EM cost CURVE is the probe evidence — each
      // round is one broadcast-vocab narrow map + one usage aggregation,
      // so rounds should be flat in the iteration index
      graft.tools.PhaseTiming.record(f"unigram_em$it%02d",
        (System.nanoTime() - tIt) / 1e9)
    }
    val chars = vocab.toSeq.filter(_._1.length == 1)
    val multi = vocab.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, u) => (-u, p) }
      .take(math.max(0, vocabSize - chars.size))
    (chars ++ multi).sortBy { case (p, u) => (-u, p) }
  }

  /** Production parameters for the fixture entries. */
  val UnigramVocabSize = 64

  /** ArtifactCache wrapper: the trained vocabulary is a deterministic
    * function of the corpus — train once per session, shared by the
    * vocab and tokenize entries (the bpeTrainCached pattern). */
  private def unigramTrainCached(spark: SparkSession,
                                 dir: String): DataFrame =
    graft.tools.ArtifactCache.parquet(spark, dir,
      s"unigram_vocab_v$UnigramVocabSize") { p =>
      import spark.implicits._
      unigramTrainUncached(spark, Tables.documents(spark, dir),
        UnigramVocabSize)
        .toDF("piece", "usage")
        .write.mode("overwrite").parquet(p)
    }

  /** The trained unigram vocabulary — fixture entry (rows-only: the EM's
    * internal log-probs are float, §5.5; the clustered gate below is the
    * hash check). */
  def unigramVocab(spark: SparkSession, dir: String): DataFrame =
    unigramTrainCached(spark, dir).orderBy(col("usage").desc, col("piece"))

  /** Tokenizer APPLICATION: segment every document under the trained
    * unigram vocabulary — per word TYPE once (broadcast join, the
    * tokenizeBpe discipline), never per occurrence. */
  private def tokenizeUnigramOf(docs: DataFrame,
                                vocabDf: DataFrame): DataFrame = {
    val vocab = vocabDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = vocab.values.map(math.max(_, 1L)).sum.toDouble
    val segUdf = udf((w: String) =>
      viterbiSegment(w, vocab, total, 4).mkString(" "))
    val types = docs.select(explode(tokens(col("text"))).as("word"))
      .distinct()
      .withColumn("wtoks", segUdf(col("word")))
      .withColumn("n_p", size(split(col("wtoks"), " ")).cast("long"))
    docs
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "word")))
      .join(broadcast(types), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("wtoks")))),
          x => x.getField("wtoks"))).as("uni_text"),
        sum(col("n_p")).as("n_pieces"))
      .orderBy(col("doc_id"))
  }

  def tokenizeUnigram(spark: SparkSession, dir: String): DataFrame =
    tokenizeUnigramOf(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      unigramTrainCached(spark, dir))

  // ---- deterministic-regime gates (planted morpheme corpus) ----

  private[graft] val UnigramAlphabet = "abcdefghijklmnopqrstuvwxyz0123"

  /** Planted corpus where the unigram trainer's converged result is
    * PROVABLE: 10 disjoint-charset 3-char morphemes (word i<140 = morpheme
    * i%10 repeated 1+i%3 times), five docs of the CONCATENATION
    * "abcdef" (EM must resolve it to [abc][def] — the likelihood
    * redistribution that is the point of unigram training), and one
    * singleton "axd" (survives EM with usage 1, then falls to the final
    * vocab prune, so its application segmentation exercises the
    * character fallback). Converged vocab = the 10 morphemes (usage =
    * occurrence counts, +5 for morphemes 0/1 from the concat docs) +
    * the 30 characters at usage 0 — which the oracle synthesizes from
    * the same generative formulas. */
  private[graft] def writeUnigramDocs(spark: SparkSession, d: String): Unit = {
    val rows = (0 until 146).map { i =>
      val text =
        if (i < 140) {
          val m = UnigramAlphabet.substring((i % 10) * 3, (i % 10) * 3 + 3)
          Seq.fill(1 + i % 3)(m).mkString(" ")
        } else if (i < 145) "abcdef"
        else "axd"
      (i.toLong, text, "en", "unigram", text.length.toLong)
    }
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
  }

  private val unigramDirRef =
    new java.util.concurrent.atomic.AtomicReference[String]()
  private[graft] def unigramDocsDir(spark: SparkSession): String = {
    val got = unigramDirRef.get()
    if (got != null) got
    else unigramDirRef.synchronized {
      val again = unigramDirRef.get()
      if (again != null) again
      else {
        val d = graft.tools.TempDirs.createFastForJvm("graft-uniclust")
        writeUnigramDocs(spark, d)
        unigramDirRef.set(d)
        d
      }
    }
  }

  /** Unigram TRAINING through the HASH GATE on the planted corpus: the
    * full pipeline (seed substrings → 2 hard-EM rounds → usage prune to
    * 40) must converge to exactly the 10 morphemes + 30 characters with
    * the synthesized usage counts — a seed bug that miscounts a
    * substring, an E-step that splits a morpheme or fails to resolve
    * the concatenation, or a prune that keeps the singleton breaks the
    * hash. `dir` unused (regime, not scale). */
  def unigramClustered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    unigramTrainUncached(spark,
      Tables.documents(spark, unigramDocsDir(spark)), vocabSize = 40)
      .toDF("piece", "usage")
      .orderBy(col("usage").desc, col("piece"))
  }

  val unigramClusteredSql: String =
    s"""WITH f AS (
       |  SELECT i % 10 AS c, COUNT(*) + SUM(i % 3) AS cnt
       |  FROM range(0, 140) t(i) GROUP BY i % 10),
       |m AS (
       |  SELECT substr('$UnigramAlphabet', CAST(c * 3 + 1 AS INT), 3) AS piece,
       |    CAST(cnt + CASE WHEN c IN (0, 1) THEN 5 ELSE 0 END AS BIGINT) AS usage
       |  FROM f),
       |ch AS (
       |  SELECT substr('$UnigramAlphabet', CAST(i + 1 AS INT), 1) AS piece,
       |    CAST(0 AS BIGINT) AS usage
       |  FROM range(0, 30) t(i))
       |SELECT piece, usage FROM (SELECT * FROM m UNION ALL SELECT * FROM ch)
       |ORDER BY usage DESC, piece""".stripMargin

  /** Unigram APPLICATION through the HASH GATE: segmentation under the
    * converged vocabulary — morpheme repeats stay single pieces, the
    * concatenation splits into its two morphemes, and the pruned
    * singleton falls back to characters. */
  def tokenizeUnigramClustered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cdir = unigramDocsDir(spark)
    val vocabDf = unigramTrainUncached(spark,
      Tables.documents(spark, cdir), vocabSize = 40).toDF("piece", "usage")
    tokenizeUnigramOf(
      Tables.documents(spark, cdir).select(col("doc_id"), col("text")),
      vocabDf)
  }

  val tokenizeUnigramClusteredSql: String =
    s"""WITH d AS (SELECT CAST(i AS BIGINT) AS doc_id, i FROM range(0, 146) t(i))
       |SELECT doc_id,
       |  CASE
       |    WHEN i < 140 THEN rtrim(repeat(
       |      substr('$UnigramAlphabet', CAST((i % 10) * 3 + 1 AS INT), 3) || ' ',
       |      CAST(1 + i % 3 AS INT)))
       |    WHEN i < 145 THEN 'abc def'
       |    ELSE 'a x d' END AS uni_text,
       |  CAST(CASE WHEN i < 140 THEN 1 + i % 3
       |            WHEN i < 145 THEN 2 ELSE 3 END AS BIGINT) AS n_pieces
       |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // WordPiece tokenizer trainer (Schuster & Nakajima 2012; the BERT
  // convention: no </w> marker, '##' continuation prefix, merge argmax
  // by likelihood gain count(l,r)/(count(l)·count(r)) instead of raw
  // pair count)
  // ---------------------------------------------------------------------

  val WordpieceMerges = 10

  /** The WordPiece selection key, integer-exact in BOTH engines: the
    * likelihood-gain score c/(cl·cr) quantized by floor(c·10¹⁸ /
    * (cl·cr)). Products stay under DECIMAL(38)/HUGEINT range (c ≤ 10⁹
    * tokens ⇒ numerator ≤ 10²⁷), and ties break (pair count DESC, l, r
    * UTF-8 ASC) — a documented 10⁻¹⁸-quantization deviation from the
    * real-valued argmax, TIGHTER than the f64 scores production
    * trainers compare with. */
  private val WpScale = BigInt("1000000000000000000")

  private def wpFloorScore(c: Long, cl: Long, cr: Long): BigInt =
    BigInt(c) * WpScale / (BigInt(cl) * BigInt(cr))

  /** WordPiece merged symbol: the continuation marker of the right
    * piece folds away (`a` + `##b` → `ab`, `ab` + `##c` → `abc`).
    * Within-word adjacency means r is always a continuation piece. */
  private def wpMerged(l: String, r: String): String =
    l + (if (r.startsWith("##")) r.substring(2) else r)

  /** In-memory WordPiece training over the collected type table — the
    * [[bpeTrainLocalArrays]] architecture (incremental pair-count
    * maintenance, affected-word rewrite) plus an incrementally
    * maintained SYMBOL-count table, because the WordPiece score's
    * denominators change with every rewrite (which is also why the BPE
    * commuting-batch theory does NOT port: merging one pair moves every
    * other pair's score through the shared symbol counts — selection is
    * inherently sequential in this objective). Returns
    * (round, l, r, merged, pair_count, left_count, right_count). */
  private[graft] def wordpieceTrainLocalArrays(
      types: Array[(Array[String], Long)], merges: Int)
      : (Seq[(Int, String, String, String, Long, Long, Long)],
         Array[Array[String]]) = {
    val syms = types.map(_._1)
    val cnts = types.map(_._2)
    val pairCount = scala.collection.mutable.HashMap[(String, String), Long]()
    val pairWords = scala.collection.mutable.HashMap[(String, String),
      scala.collection.mutable.HashSet[Int]]()
    val symCount = scala.collection.mutable.HashMap[String, Long]()
    def addPairs(wid: Int, s: Array[String], sign: Long): Unit = {
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * cnts(wid)
        if (c == 0L) pairCount.remove(p) else pairCount.update(p, c)
        if (sign > 0)
          pairWords.getOrElseUpdate(p,
            scala.collection.mutable.HashSet[Int]()) += wid
        i += 1
      }
    }
    def addSyms(wid: Int, s: Array[String], sign: Long): Unit = {
      var i = 0
      while (i < s.length) {
        val c = symCount.getOrElse(s(i), 0L) + sign * cnts(wid)
        if (c == 0L) symCount.remove(s(i)) else symCount.update(s(i), c)
        i += 1
      }
    }
    syms.indices.foreach { w => addPairs(w, syms(w), 1L); addSyms(w, syms(w), 1L) }
    val learned = scala.collection.mutable
      .ArrayBuffer[(Int, String, String, String, Long, Long, Long)]()
    var round = 1
    var exhausted = false
    while (round <= merges && !exhausted) {
      var best: ((String, String), Long, Long, Long) = null
      var bestScore: BigInt = null
      pairCount.foreach { case (p, c) =>
        val cl = symCount(p._1); val cr = symCount(p._2)
        val sc = wpFloorScore(c, cl, cr)
        val better = best == null || sc > bestScore ||
          (sc == bestScore && (c > best._2 || (c == best._2 && {
            val dl = utf8Compare(p._1, best._1._1)
            dl < 0 || (dl == 0 && utf8Compare(p._2, best._1._2) < 0)
          })))
        if (better) { best = (p, c, cl, cr); bestScore = sc }
      }
      if (best == null) exhausted = true
      else {
        val ((l, r), c, cl, cr) = best
        val m = wpMerged(l, r)
        learned += ((round, l, r, m, c, cl, cr))
        val affected = pairWords.remove((l, r))
          .getOrElse(scala.collection.mutable.HashSet[Int]())
        affected.foreach { wid =>
          val s = syms(wid)
          var has = false
          var i = 0
          while (!has && i < s.length - 1) {
            has = s(i) == l && s(i + 1) == r; i += 1
          }
          if (has) {
            addPairs(wid, s, -1L); addSyms(wid, s, -1L)
            val ns = greedyMergeSym(s.toSeq, l, r, m).toArray
            syms(wid) = ns
            addPairs(wid, ns, 1L); addSyms(wid, ns, 1L)
          }
        }
        round += 1
      }
    }
    (learned.toSeq, syms)
  }

  /** [[greedyMerge]] with an explicit merged symbol (WordPiece's folds
    * the '##' marker, so l+r is not the merged string). */
  private[graft] def greedyMergeSym(syms: Seq[String], l: String,
                                    r: String, m: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    syms.foreach { x =>
      if (out.nonEmpty && out.last == l && x == r) {
        out.remove(out.length - 1); out += m
      } else out += x
    }
    out.toSeq
  }

  /** One deterministic WordPiece training run: word types weighted by
    * count, initial pieces = first character plain + '##'-prefixed
    * continuations (the BERT representation), `merges` rules of
    * (pair counts + symbol counts → floor-score argmax → greedy
    * rewrite). Vocabulary fits the driver (the SentencePiece posture —
    * training input is vocabulary-sized by design): O(1) driver-blocking
    * Spark actions. Over-budget: one distributed round per merge — the
    * floor score is a COMPUTABLE COLUMN (DECIMAL(38,0) floor division),
    * so the distributed argmax is an exact orderBy+limit(1), but rounds
    * cannot batch (every merge moves every score through the shared
    * symbol counts — see [[wordpieceTrainLocalArrays]]). */
  private[graft] def wordpieceTrainUncached(spark: SparkSession, dir: String,
                                            merges: Int,
                                            localTypeBudget: Long = 1000000L)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    var words = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      // slice length must be computed (start+length overflows Int at a
      // MaxValue sentinel and silently yields an EMPTY slice)
      .withColumn("syms", expr(
        """concat(slice(split(word, ''), 1, 1),
          |  transform(
          |    slice(split(word, ''), 2, greatest(size(split(word, '')) - 1, 0)),
          |    c -> concat('##', c)))""".stripMargin))
      .stage()
    val nTypes = words.count()
    if (nTypes > 0 && nTypes <= localTypeBudget) {
      val rows = words.select(col("word"), col("cnt"), col("syms"))
        .collect().map { r =>
          (r.getString(0), r.getLong(1), r.getSeq[String](2).toArray)
        }
      val (learned, finals) =
        wordpieceTrainLocalArrays(rows.map(r => (r._3, r._2)), merges)
      graft.tools.RoutingMetrics.add("wp_spark_rounds", 2L)
      val mtDf = learned
        .toDF("round", "l", "r", "merged", "pair_count", "left_count",
          "right_count")
      val wordsDf = rows.zip(finals)
        .map { case ((wd, c, _), fs) => (wd, c, fs.toSeq) }.toSeq
        .toDF("word", "cnt", "syms")
      return (mtDf, wordsDf)
    }
    val learned = scala.collection.mutable
      .ArrayBuffer[(Int, String, String, String, Long, Long, Long)]()
    var round = 1
    var exhausted = false
    while (round <= merges && !exhausted) {
      val w = Window.partitionBy(col("word")).orderBy(col("pos"))
      val pos = words
        .select(col("word"), col("cnt"),
          posexplode(col("syms")).as(Seq("pos", "s")))
        .stage()
      val sc = pos.groupBy(col("s").as("sym"))
        .agg(sum(col("cnt")).as("sc"))
      val top = pos
        .withColumn("r", lead(col("s"), 1).over(w))
        .filter(col("r").isNotNull)
        .groupBy(col("s").as("l"), col("r"))
        .agg(sum(col("cnt")).as("c"))
        .join(sc.select(col("sym").as("l"), col("sc").as("cl")), Seq("l"))
        .join(sc.select(col("sym").as("r"), col("sc").as("cr")), Seq("r"))
        .withColumn("score",
          (col("c").cast("decimal(38,0)") *
            lit(WpScale.toString).cast("decimal(38,0)")) /
            (col("cl").cast("decimal(38,0)") * col("cr").cast("decimal(38,0)")))
        .withColumn("score", expr("CAST(FLOOR(score) AS DECIMAL(38,0))"))
        .orderBy(col("score").desc, col("c").desc, col("l"), col("r"))
        .limit(1)
        .select(col("l"), col("r"), col("c"), col("cl"), col("cr"))
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val t = top.head
        val (l, r, c) = (t.getString(0), t.getString(1), t.getLong(2))
        val (cl, cr) = (t.getLong(3), t.getLong(4))
        val m = wpMerged(l, r)
        learned += ((round, l, r, m, c, cl, cr))
        val mergeUdf = udf((syms: Seq[String]) => greedyMergeSym(syms, l, r, m))
        words = words.withColumn("syms", mergeUdf(col("syms")))
          .stage()
        round += 1
      }
    }
    graft.tools.RoutingMetrics.add("wp_spark_rounds", round.toLong * 2)
    (learned.toSeq.toDF("round", "l", "r", "merged", "pair_count",
      "left_count", "right_count"), words)
  }

  private def wordpieceTrainCached(spark: SparkSession,
                                   dir: String): (DataFrame, DataFrame) = {
    val mt = graft.tools.ArtifactCache.parquet(spark, dir,
      s"wp_merges_m$WordpieceMerges") { p =>
      val (m, w) = wordpieceTrainUncached(spark, dir, WordpieceMerges)
      m.write.mode("overwrite").parquet(p)
      w.select(col("word"), col("cnt"), col("syms"))
        .write.mode("overwrite").parquet(p + "_words")
    }
    val wordsPath = graft.tools.ArtifactCache.pathOf(dir,
      s"wp_merges_m$WordpieceMerges").get + "_words"
    (mt, spark.read.parquet(wordsPath))
  }

  /** The learned WordPiece merge table — the gate query: the floor
    * score's inputs (pair count AND both symbol counts at pick time)
    * ride in the hash, so a maintenance bug in either table breaks the
    * gate, not just a selection bug. */
  def wordpieceMerges(spark: SparkSession, dir: String): DataFrame =
    wordpieceTrainCached(spark, dir)._1.orderBy(col("round"))

  /** Tokenizer APPLICATION: every document rewritten as its words'
    * trained WordPiece sequences ('##' continuations preserved) — one
    * broadcast join on the word type, the [[tokenizeBpe]] discipline. */
  def tokenizeWordpiece(spark: SparkSession, dir: String): DataFrame = {
    val wt = wordpieceTrainCached(spark, dir)._2
      .select(col("word"), array_join(col("syms"), " ").as("wtoks"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "word")))
      .join(broadcast(wt), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("wtoks")))),
          x => x.getField("wtoks"))).as("wp_text"),
        count(lit(1)).as("n_words"))
      .orderBy(col("doc_id"))
  }

  // Stage CTEs are AS MATERIALIZED: each stage references its
  // predecessor three times (symbol counts, pair counts, rewrite), so
  // default CTE inlining expands 3^M scans of the documents parquet —
  // measured as an fd-exhaustion failure at M=10 (BPE's 2-reference
  // stages stayed under the limit; this oracle would not).
  private def wpStagesSql(merges: Int): String = {
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT word, cnt,
         |    string_split(word, '')[1:1] ||
         |      list_transform(string_split(word, '')[2:], c -> '##' || c)
         |      AS s
         |  FROM (
         |    SELECT word, COUNT(*) AS cnt FROM (
         |      SELECT unnest($tokensSql) AS word FROM documents)
         |    GROUP BY word))""".stripMargin
    val stages = (1 to merges).map { k =>
      s"""y$k AS MATERIALIZED (
         |  SELECT x AS sym, CAST(SUM(cnt) AS BIGINT) AS sc
         |  FROM w${k - 1}, unnest(s) AS t(x)
         |  GROUP BY x),
         |p$k AS MATERIALIZED (
         |  SELECT l, r, c, yl.sc AS cl, yr.sc AS cr,
         |    l || r[3:] AS m
         |  FROM (
         |    SELECT s[i] AS l, s[i + 1] AS r, SUM(cnt) AS c
         |    FROM w${k - 1}, unnest(range(1, len(s))) AS t(i)
         |    GROUP BY 1, 2) pc
         |  JOIN y$k yl ON yl.sym = pc.l
         |  JOIN y$k yr ON yr.sym = pc.r
         |  ORDER BY CAST(c AS HUGEINT) * 1000000000000000000
         |             / (CAST(yl.sc AS HUGEINT) * yr.sc) DESC,
         |           c DESC, l, r
         |  LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT word, cnt,
         |    list_reduce(list_transform(s, x -> [x]),
         |      (acc, x) -> CASE WHEN acc[-1] = l AND x[1] = r
         |                  THEN acc[1:len(acc) - 1] || [m]
         |                  ELSE acc || x END) AS s
         |  FROM w${k - 1} LEFT JOIN p$k ON TRUE)""".stripMargin
    }
    (w0 +: stages).mkString(",\n")
  }

  val wordpieceMergesSql: String = {
    val arms = (1 to WordpieceMerges).map { k =>
      s"""SELECT $k AS round, l, r, m AS merged, CAST(c AS BIGINT) AS pair_count,
         |  cl AS left_count, cr AS right_count FROM p$k""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH ${wpStagesSql(WordpieceMerges)}
       |SELECT * FROM (
       |  $arms)
       |ORDER BY round""".stripMargin
  }

  val tokenizeWordpieceSql: String =
    s"""WITH ${wpStagesSql(WordpieceMerges)},
       |wt AS (SELECT word, array_to_string(s, ' ') AS wtoks FROM w$WordpieceMerges),
       |parts AS (SELECT doc_id, $tokensSql AS parts FROM documents),
       |t AS (
       |  SELECT doc_id, pos, parts[pos] AS word FROM (
       |    SELECT doc_id, unnest(generate_series(1, len(parts))) AS pos, parts
       |    FROM parts))
       |SELECT t.doc_id,
       |  string_agg(wt.wtoks, ' ' ORDER BY t.pos) AS wp_text,
       |  COUNT(*) AS n_words
       |FROM t JOIN wt USING (word)
       |GROUP BY t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_shards"    -> (shardsPipeline _),
    "corpus_pack"        -> ((s: SparkSession, d: String) => packSequences(s, d)),
    "corpus_pack_stream" -> ((s: SparkSession, d: String) => packSequencesStream(s, d)),
    "corpus_budget"      -> ((s: SparkSession, d: String) => budgetSelect(s, d)),
    "corpus_budget_stream" -> ((s: SparkSession, d: String) => budgetSelectStream(s, d)),
    "corpus_budget_stream_late" -> ((s: SparkSession, d: String) => budgetSelectStreamLate(s, d)),
    "corpus_pack_stream_late" -> ((s: SparkSession, d: String) => packSequencesStreamLate(s, d)),
    "corpus_balance"     -> ((s: SparkSession, d: String) => balanceByLang(s, d)),
    "corpus_balance_stream" -> ((s: SparkSession, d: String) => balanceByLangStream(s, d)),
    "corpus_shard"       -> ((s: SparkSession, d: String) => shardShuffle(s, d)),
    "corpus_vocab_prune" -> ((s: SparkSession, d: String) => vocabPrune(s, d)),
    "corpus_split"       -> ((s: SparkSession, d: String) => splitTrainValTest(s, d)),
    "corpus_mix"         -> ((s: SparkSession, d: String) => mixWeights(s, d)),
    "corpus_shuffle_shards" -> ((s: SparkSession, d: String) => shuffleShards(s, d)),
    "corpus_shuffle_epochs" -> ((s: SparkSession, d: String) => shuffleShardsEpochs(s, d)),
    "corpus_curriculum" -> ((s: SparkSession, d: String) => curriculumOrder(s, d)),
    "corpus_sample_stratified" -> (sampleStratified _),
    "corpus_mix_temperature" -> ((s: SparkSession, d: String) => mixTemperature(s, d)),
    "pipeline_dataloader" -> ((s: SparkSession, d: String) => dataloaderPipeline(s, d)),
    "pipeline_dataloader_resume" -> ((s: SparkSession, d: String) => dataloaderResume(s, d)),
    "pipeline_dataloader_resume_epochs" -> ((s: SparkSession, d: String) => dataloaderResumeEpochs(s, d)),
    "pipeline_dataloader_curriculum" -> ((s: SparkSession, d: String) => dataloaderCurriculum(s, d)),
    "pipeline_dataloader_curriculum_resume" -> ((s: SparkSession, d: String) => dataloaderCurriculumResume(s, d)),
    "corpus_chunk"       -> ((s: SparkSession, d: String) => chunkDocs(s, d)),
    "corpus_pack_padded" -> ((s: SparkSession, d: String) => packPadded(s, d)),
    "corpus_bpe"         -> (bpeMerges _),
    "corpus_pack_bpe"    -> ((s: SparkSession, d: String) => packSequencesBpe(s, d)),
    "corpus_tokenize_bpe" -> (tokenizeBpe _),
    "corpus_unigram"     -> (unigramVocab _),
    "corpus_tokenize_unigram" -> (tokenizeUnigram _),
    "corpus_unigram_clustered" -> (unigramClustered _),
    "corpus_tokenize_unigram_clustered" -> (tokenizeUnigramClustered _),
    "corpus_wordpiece"   -> (wordpieceMerges _),
    "corpus_tokenize_wordpiece" -> (tokenizeWordpiece _),
  )

  val oracles: Map[String, String] = Map(
    "pipeline_shards"    -> shardsPipelineSql,
    "corpus_pack"        -> packSequencesSql,
    // streaming twin: prefix-closed slot assignment, same oracle
    "corpus_pack_stream" -> packSequencesSql,
    "corpus_budget"      -> budgetSelectSql,
    // streaming twin under id-ordered arrival: prefix-closed keep rule,
    // same oracle
    "corpus_budget_stream" -> budgetSelectSql,
    "corpus_budget_stream_late" -> budgetSelectStreamLateSql,
    "corpus_pack_stream_late" -> packSequencesStreamLateSql,
    "corpus_balance"     -> balanceByLangSql,
    // streaming twin: TopKStream displacement fold, same oracle
    "corpus_balance_stream" -> balanceByLangSql,
    "corpus_shard"       -> shardShuffleSql,
    "corpus_vocab_prune" -> vocabPruneSql,
    "corpus_split"       -> splitTrainValTestSql,
    "corpus_mix"         -> mixWeightsSql,
    "corpus_shuffle_shards" -> shuffleShardsSql,
    "corpus_shuffle_epochs" -> shuffleShardsEpochsSql,
    "corpus_curriculum" -> curriculumSql,
    "corpus_sample_stratified" -> sampleStratifiedSql,
    "corpus_mix_temperature" -> mixTemperatureSql,
    "pipeline_dataloader" -> dataloaderPipelineSql,
    "pipeline_dataloader_resume" -> dataloaderResumeSql,
    "pipeline_dataloader_resume_epochs" -> dataloaderResumeEpochsSql,
    "pipeline_dataloader_curriculum" -> dataloaderCurriculumSql,
    "pipeline_dataloader_curriculum_resume" -> dataloaderCurriculumResumeSql,
    "corpus_chunk" -> chunkDocsSql,
    "corpus_pack_padded" -> packPaddedSql,
    "corpus_bpe"         -> bpeMergesSql,
    "corpus_pack_bpe"    -> packSequencesBpeSql,
    "corpus_tokenize_bpe" -> tokenizeBpeSql,
    // fixture unigram entries are rows-only (float-internal EM, §5.5);
    // the clustered gates carry the hash check
    "corpus_unigram_clustered" -> unigramClusteredSql,
    "corpus_tokenize_unigram_clustered" -> tokenizeUnigramClusteredSql,
    "corpus_wordpiece"   -> wordpieceMergesSql,
    "corpus_tokenize_wordpiece" -> tokenizeWordpieceSql,
  )
}
