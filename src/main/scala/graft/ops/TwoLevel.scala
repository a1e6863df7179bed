package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level (bucketed) prefix sums and ranks — the scale form of
  * `Window.partitionBy(stratum).orderBy(key)` running aggregates.
  *
  * The naive per-stratum window is one task per stratum. Strata in a
  * corpus are low-cardinality and SKEWED — a 100 TB corpus that is 80%
  * English puts 80 TB through a single window task: a full sort of the
  * dominant stratum into one partition. The standard fix (the classic
  * parallel scan decomposition — the fold is associative) splits each
  * stratum into order-aligned BUCKETS:
  *
  *  1. bucket-local exclusive running sums via
  *     `Window.partitionBy(stratum, bucket)` — parallelism is
  *     |strata| × |buckets| tasks, each sorting only its bucket;
  *  2. per-bucket totals (a groupBy on the SAME keys — planned on the
  *     window's exchange output, so no second shuffle, and the repeated
  *     subtree reuses the exchange);
  *  3. the exclusive prefix sum of bucket totals over the ≤
  *     |strata| × |buckets| row offsets table (a window over a tiny
  *     frame) broadcast back: `global_cum = bucket_offset + local_cum`.
  *
  * The result is bit-identical to the single-window form — same oracle,
  * same hashes — only the plan changes: the dominant stratum's sort
  * fans out across its buckets instead of serializing on one task.
  *
  * Bucket expressions must be ORDER-ALIGNED with the window's sort key
  * (row a before row b in the stratum ⇒ bucket(a) <= bucket(b)) and
  * bounded in cardinality (the offsets table broadcasts). Two are
  * provided: a hex prefix of an md5 sort key, and a per-stratum
  * min/max-scaled id range split. Both are deterministic, so results
  * remain pure functions of stable ids (the reproducibility contract of
  * balanceByLang / text_det_split is untouched).
  */
object TwoLevel {

  /** Hex chars of the md5 sort key used as the bucket id: 2 → up to 256
    * buckets per stratum. At 100 TB raise to 3 (4096 buckets ≈ 20 GB per
    * task on an 80 TB stratum); the offsets table stays broadcast-sized
    * either way. A prefix of the sort key is order-aligned by
    * construction (hex chars compare in binary order). */
  val Md5PrefixChars = 2

  /** Buckets for id-range splitting (doc_id-ordered windows). Fixture
    * ids span hundreds, so 16 buckets still exercises multi-bucket
    * offset merging; at 100 TB raise with the stratum size. */
  val IdBuckets = 16

  /** Adds `out` = the exclusive prefix sum of `valueCol` over rows
    * ordered by `ord` within each stratum — identical to
    * `sum(value).over(Window.partitionBy(strata).orderBy(ord)
    * .rowsBetween(unboundedPreceding, -1))` with nulls as 0 — computed
    * in the two-level form. `bucketCol` must already be present on `df`
    * (see [[withMd5Bucket]] / [[withIdRangeBucket]]) and order-aligned
    * with `ord`. With `stratumTotalOut` set, also adds the per-stratum
    * total of `valueCol` (the `count(*) over (partition by stratum)`
    * analogue when value is 1), derived from the same bucket totals —
    * no extra pass over the data. */
  def cumBefore(df: DataFrame, strata: Seq[String], bucketCol: String,
                ord: Seq[Column], valueCol: String, out: String,
                stratumTotalOut: Option[String] = None): DataFrame = {
    val keyCols = (strata :+ bucketCol).map(col)
    val wLocal = Window.partitionBy(keyCols: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = df.withColumn("__tl_local",
      coalesce(sum(col(valueCol)).over(wLocal), lit(0L)))
    // Planned downstream of the window so the (strata, bucket) exchange
    // satisfies the groupBy distribution — the offsets branch re-walks
    // the subtree but reuses the shuffle (ReusedExchange), never
    // re-scanning the source.
    val totals = local.groupBy(keyCols: _*)
      .agg(sum(col(valueCol)).as("__tl_btot"))
    val wOffsets = Window.partitionBy(strata.map(col): _*)
      .orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__tl_boff",
        coalesce(sum(col("__tl_btot")).over(wOffsets), lit(0L)))
      .select(keyCols :+ col("__tl_boff"): _*)
    val joined = local
      .join(broadcast(offsets), strata :+ bucketCol)
      .withColumn(out, col("__tl_boff") + col("__tl_local"))
      .drop("__tl_local", "__tl_boff")
    stratumTotalOut match {
      case None => joined
      case Some(n) =>
        val st = totals.groupBy(strata.map(col): _*)
          .agg(sum(col("__tl_btot")).as(n))
        joined.join(broadcast(st), strata)
    }
  }

  /** Rank form: adds `out` = `row_number()` over the same window (long).
    * A rank is the prefix COUNT plus one — same decomposition with
    * value 1. `ord` must be a total order within the stratum (callers
    * pass a unique tiebreaker, as the window forms already did). */
  def rank(df: DataFrame, strata: Seq[String], bucketCol: String,
           ord: Seq[Column], out: String,
           stratumTotalOut: Option[String] = None): DataFrame =
    cumBefore(df.withColumn("__tl_one", lit(1L)), strata, bucketCol, ord,
        "__tl_one", out, stratumTotalOut)
      .withColumn(out, col(out) + lit(1L))
      .drop("__tl_one")

  /** Materializes an md5 sort key and its order-aligned bucket (the
    * first [[Md5PrefixChars]] hex chars). Order by (`ordOut`, tiebreak)
    * afterwards — the bucket is a lexicographic prefix, so bucket order
    * agrees with key order. */
  def withMd5Bucket(df: DataFrame, key: Column,
                    ordOut: String, bucketOut: String): DataFrame =
    df.withColumn(ordOut, md5(key))
      .withColumn(bucketOut, substring(col(ordOut), 1, Md5PrefixChars))

  /** Order-aligned bucket for a NUMERIC id order: per-stratum min/max
    * (a tiny broadcast aggregate — Catalyst prunes every other column
    * from that branch, so it scans just (stratum, id)) scale the id into
    * at most [[IdBuckets]] equal-width ranges. Equal-width, not
    * equal-depth: a skewed id DISTRIBUTION within a stratum can still
    * imbalance buckets, but ids here are dense synthetic keys, and the
    * failure mode the two-level form exists for — stratum-count skew —
    * is handled regardless of id spacing. */
  def withIdRangeBucket(df: DataFrame, stratum: String, idCol: String,
                        bucketOut: String): DataFrame = {
    val stats = df.groupBy(col(stratum)).agg(
      min(col(idCol)).cast("long").as("__tl_idmin"),
      max(col(idCol)).cast("long").as("__tl_idmax"))
    df.join(broadcast(stats), Seq(stratum))
      .withColumn(bucketOut, expr(
        s"($idCol - __tl_idmin) div " +
          s"(((__tl_idmax - __tl_idmin) div $IdBuckets) + 1)"))
      .drop("__tl_idmin", "__tl_idmax")
  }
}
