package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import graft.tools.Stage
import graft.tools.Stage._

/** The materialization discipline ([[graft.tools.Stage]]).
  *
  * Two contracts: (1) no operator bypasses the helper — every
  * `localCheckpoint` in `src/main` lives inside Stage.scala, so the
  * cluster-survivable switch really governs the whole fleet; (2) the
  * switch is semantics-free — one gated query per heavy family
  * (curation composition, streaming dedup, BM25) produces bitwise-equal
  * results in `local` and `reliable` modes.
  */
class StageSpec extends SparkSpec {

  private def walk(root: Path): Iterator[Path] =
    Files.walk(root).iterator().asScala.filter(_.toString.endsWith(".scala"))

  test("grep invariant: no raw localCheckpoint outside Stage.scala") {
    val offenders = walk(Paths.get("src/main"))
      .filterNot(_.getFileName.toString == "Stage.scala")
      .flatMap { p =>
        Files.readString(p).linesIterator.zipWithIndex.collect {
          case (line, i) if line.contains(".localCheckpoint(") => s"$p:${i + 1}"
        }
      }.toList
    assert(offenders.isEmpty, s"raw localCheckpoint sites: $offenders")
  }

  private def underMode[A](mode: String)(body: => A): A = {
    val prev = spark.conf.get(Stage.ModeKey, "local")
    spark.conf.set(Stage.ModeKey, mode)
    try body finally spark.conf.set(Stage.ModeKey, prev)
  }

  private def snapshot(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("stage modes materialize identical content on a shuffled frame") {
    import spark.implicits._
    val base = (1 to 500).toDF("n")
      .groupBy(($"n" % 7).as("k")).count()
    val expect = snapshot(base)
    for (m <- Seq("local", "reliable", "persist")) {
      underMode(m) { assert(snapshot(base.stage()) == expect, s"mode=$m") }
      underMode(m) {
        val lz = base.stageLazy()
        assert(snapshot(lz) == expect, s"lazy mode=$m")
      }
    }
  }

  test("reliable mode survives without a pre-set checkpoint dir") {
    // Stage must self-initialize the checkpoint dir (cluster deployments
    // override it; the default must not throw).
    import spark.implicits._
    underMode("reliable") {
      assert(Seq(1, 2, 3).toDF("x").stage().count() == 3L)
      assert(spark.sparkContext.getCheckpointDir.nonEmpty)
    }
  }

  /** One gated query per heavy family, bitwise-equal across modes. */
  private val families = Seq("pipeline_curation", "dedup_stream_minhash", "text_bm25")

  for (q <- families)
    test(s"mode equivalence: $q local == reliable") {
      val fn = SparkEntry.queries(q)
      val localRows = underMode("local") { snapshot(fn(spark, sf)) }
      val reliableRows = underMode("reliable") { snapshot(fn(spark, sf)) }
      assert(localRows.nonEmpty)
      assert(localRows == reliableRows)
    }
}
