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
}
