package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with the decode / feature-extract step structured as a per-partition
  * batch operator.
  *
  * The image/audio codecs aren't available in this environment, so
  * `decodeStub` is a clearly-marked deterministic fake — but everything
  * Spark-side is real and load-bearing: the binary column representation,
  * the metadata struct schema, the `mapPartitions` batch shape (one
  * decoder init per partition, not per row — the same pattern as the
  * reference's one-geolocator-per-DataFrame, `flows/etl.py:198`), and the
  * partitioning/pushdown behavior around an opaque column.
  *
  * At 100 TB: binary payloads dominate bytes, so the plan must prune the
  * payload column until the decode stage (Parquet column pruning does this
  * for free when metadata-only queries don't touch `payload`), and decode
  * parallelism follows file-split partitioning — no shuffle at all.
  */
object Multimodal {

  /** Synthesize a multimodal table from `documents`: payload = UTF-8 bytes
    * (stand-in for image bytes), metadata = (format, width, height) struct
    * derived deterministically from doc_id. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, lit("png"))
          .when(col("doc_id") % 3 === 1, lit("jpeg"))
          .otherwise(lit("webp")).as("format"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height")).as("meta"))

  /** Metadata-only scan: never touches `payload` — check `.explain` shows
    * ReadSchema without the binary column. Oracle-checked. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("media_id"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      length(col("payload")).as("n_bytes"))
      .orderBy(col("media_id"))

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg'
      |       ELSE 'webp' END AS format,
      |  CAST(doc_id % 640 + 1 AS INT) AS width,
      |  CAST(doc_id % 480 + 1 AS INT) AS height,
      |  octet_length(encode(text)) AS n_bytes
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Output row of the decode/feature-extract stage. */
  case class MediaFeatures(media_id: Long, format: String,
                           n_bytes: Int, feature: Array[Double])

  /** STUB — deterministic fake decoder. A real deployment replaces the
    * body with the actual codec (e.g. javax.imageio / ffmpeg JNI) WITHOUT
    * touching the surrounding dataflow: the signature (bytes → features)
    * and the per-partition batching are what matter. */
  private[ops] def decodeStub(format: String, payload: Array[Byte]): Array[Double] = {
    val n = payload.length
    Array(
      n.toDouble,
      if (n == 0) 0.0 else payload.iterator.map(b => (b & 0xff).toDouble).sum / n,
      format.length.toDouble,
    )
  }

  /** Decode / feature-extract over the payload column as a per-partition
    * batch operator: decoder state is initialized once per partition (the
    * `val decoder = ...` line), rows stream through an iterator — no
    * materialization of the whole partition, no shuffle. */
  def extractFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
    media
      .select(col("media_id"), col("meta.format").as("format"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // one decoder per partition — swap for the real codec init here
        val decoder: (String, Array[Byte]) => Array[Double] = decodeStub
        rows.map { case (id, fmt, bytes) =>
          MediaFeatures(id, fmt, bytes.length, decoder(fmt, bytes))
        }
      }
      .toDF()
      .select(col("media_id"), col("format"), col("n_bytes"),
        round(element_at(col("feature"), 2), 4).as("mean_byte"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta"     -> (mediaMeta _),
    "mm_features" -> (extractFeatures _),
  )

  /** mm_features exercises the mapPartitions stub → rows-only check. */
  val oracles: Map[String, String] = Map(
    "mm_meta" -> mediaMetaSql,
  )
}
