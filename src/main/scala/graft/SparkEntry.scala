package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, Corpus, Dedup, EtlPipeline, Graph, KMeans, Layout, Multimodal, Relational, Relational2, Scale, Similarity, Temporal, TextAnalysis, Typed, UrlCuration}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory entries (SURVEY.md §2 + mandated
  * extensions) to DataFrame plans over an sfDir of fixture parquet;
  * `oracleSql` holds the DuckDB-equivalent ANSI SQL for each hash-checkable
  * query (non-SQL-expressible ops are present in `queries` only → the
  * driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's end-to-end combine step (union → dedup →
    * conditional transform → aggregate; `flows/etl.py:289-311`). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Temporal.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ EtlPipeline.queries ++ KMeans.queries ++ Corpus.queries ++
      Graph.queries ++ Analytics.queries ++ Layout.queries ++ Scale.queries ++ Typed.queries ++ UrlCuration.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Temporal.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ EtlPipeline.oracles ++ KMeans.oracles ++ Corpus.oracles ++
      Graph.oracles ++ Analytics.oracles ++ Layout.oracles ++ Scale.oracles ++ Typed.oracles ++ UrlCuration.oracles
}
