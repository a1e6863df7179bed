package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Train-once / read-many parquet artifacts (IVF quantizers, near-dup pair
  * graphs): the first call per (key, kind) runs `build` to persist the
  * artifact — recording the build duration as a bench phase — and every
  * later call reads it back. Build outputs must be deterministic so a
  * cached artifact equals a rebuilt one. Keys are corpus directory paths,
  * which assumes the data under them is immutable (true for the fixture
  * dirs); a mutable corpus would key on a content fingerprint instead. */
object ArtifactCache {
  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-artifacts").toString
  private val paths =
    scala.collection.concurrent.TrieMap[(String, String), String]()

  def parquet(spark: SparkSession, key: String, kind: String)
             (build: String => Unit): DataFrame = {
    val path = paths.getOrElseUpdate((key, kind), {
      val p = s"$root/${key.replaceAll("[^A-Za-z0-9]", "_")}/$kind"
      val t0 = System.nanoTime()
      build(p)
      PhaseTiming.record(s"$kind.build", (System.nanoTime() - t0) / 1e9)
      p
    })
    spark.read.parquet(path)
  }

  /** The registered path of an already-built artifact — for builders
    * that persist SIDE outputs next to the primary path (e.g. BPE's
    * final word table beside its merge table). None until the artifact's
    * first build this session. */
  def pathOf(key: String, kind: String): Option[String] =
    paths.get((key, kind))
}
