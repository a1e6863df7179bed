package graft

import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Corpus where neighbor ranking is known by construction: vectors along
    * a few fixed directions with decreasing alignment to e0. */
  private def embDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sim").toString
    def unit(theta: Double): Array[Float] = {
      val v = new Array[Float](64)
      v(0) = math.cos(theta).toFloat
      v(1) = math.sin(theta).toFloat
      v
    }
    // vec 0 = query (angle 0); others at increasing angles → known ranking
    val rows = (0 to 9).map { i => (i.toLong, unit(i * 0.15), i % 2) }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("brute-force top-k ranks by true cosine (known geometry)") {
    val dir = embDir()
    val got = Similarity.bruteForceTopK(spark, dir)
      .filter("q_id = 0").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L)) // increasing angle = decreasing cosine
  }

  test("IVF top-k returns exact ranking when probing enough cells") {
    val dir = embDir()
    val got = Similarity.ivfTopK(spark, dir, nprobe = 2)
      .filter("q_id = 0").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L)) // 2 probes cover both labels
  }

  test("LSH top-k returns a correctly-ordered subset of the true ranking") {
    val dir = embDir()
    val brute = Similarity.bruteForceTopK(spark, dir)
      .filter("q_id = 0").collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val got = Similarity.lshTopK(spark, dir)
      .filter("q_id = 0").collect().map(r => (r.getLong(2), r.getDouble(3)))
    // every returned cosine matches the exact cosine for that neighbor
    got.foreach { case (id, cos) =>
      if (brute.contains(id)) assert(math.abs(brute(id) - cos) < 1e-12)
    }
    // ranks are ordered by cosine desc
    assert(got.map(_._2).toSeq == got.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }
}
