package graft

import org.apache.spark.sql.functions._

import graft.ops.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** Three tight, well-separated direction clusters. */
  private def corpus(): org.apache.spark.sql.DataFrame = {
    def unit(axis: Int, jitter: Double, id: Int): Array[Float] = {
      val v = new Array[Float](8)
      v(axis) = 1.0f
      v((axis + 1) % 8) = jitter.toFloat * (1 + id % 3)
      v
    }
    (0 until 30).map { i =>
      (i.toLong, unit(i % 3 * 2, 0.05, i), i % 3)
    }.toDF("vec_id", "embedding", "label")
  }

  test("k-means recovers well-separated clusters") {
    val c = corpus()
    val centroids = KMeans.fit(spark, c, k = 3, iterations = 4)
    assert(centroids.count() == 3)
    val vecs = c.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val assigned = KMeans.assign(vecs, centroids)
      .select(col("vec_id"), col("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // all members of a true group land in the same learned cluster
    (0 until 3).foreach { g =>
      val ids = (0 until 30).filter(_ % 3 == g).map(_.toLong)
      assert(ids.map(assigned).toSet.size == 1,
        s"group $g split across clusters")
    }
    // and the three groups land in three distinct clusters
    assert((0 until 3).map(g => assigned(g.toLong)).toSet.size == 3)
  }

  test("IVF with the trained quantizer reaches recall >= 0.8 vs brute force") {
    import graft.ops.Similarity
    val brute = Similarity.bruteForceTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    info(f"IVF recall vs brute = $recall%.3f (${ivf.size} rows)")
    assert(recall >= 0.8, f"IVF recall $recall%.3f below floor 0.8")
  }

  test("assignment is deterministic across runs") {
    val dir = sf
    val a = KMeans.clusterStats(spark, dir, k = 4, iterations = 2)
      .collect().map(_.toSeq).toSeq
    val b = KMeans.clusterStats(spark, dir, k = 4, iterations = 2)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("index save/load round-trips and the cached index answers queries") {
    import graft.ops.Similarity
    val centroids = KMeans.fit(spark, corpus(), k = 3, iterations = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-idx").toString + "/ivf"
    KMeans.saveIndex(centroids, path)
    val loaded = KMeans.loadIndex(spark, path)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val orig = centroids
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(loaded == orig)
    // second ivfTopK call hits the persisted-index cache (no retrain) and
    // returns the identical result — train-once/search-many is lossless
    val first = Similarity.ivfTopK(spark, sf).collect().map(_.toSeq).toSeq
    val second = Similarity.ivfTopK(spark, sf).collect().map(_.toSeq).toSeq
    assert(first == second)
  }

  test("pickK handles IVF-production k (256) from a large pool in seconds") {
    // O(pool·k·dim) with the incremental min-distance array; the previous
    // O(pool·k²·dim) form would take minutes-to-hours at production k.
    val rnd = new scala.util.Random(11)
    val pool = Vector.fill(3000)(Seq.fill(64)(rnd.nextGaussian()))
    val weights = Array.fill(3000)(1L + rnd.nextInt(100).toLong)
    val t0 = System.nanoTime()
    val centers = KMeans.pickK(pool, weights, 256)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"pickK(pool=3000, k=256, dim=64) took $sec%.2f s")
    assert(centers.size == 256)
    assert(centers.distinct.size == 256, "picked duplicate centers")
    assert(sec < 20.0, f"pickK took $sec%.1f s — complexity regression")
  }

  test("clustered gate: k=10 training converges to the planted partition " +
      "(assignments = vec_id % 10, every cluster 20 members)") {
    import org.apache.spark.sql.functions.{col, expr}
    import graft.ops.Similarity
    val cdir = Similarity.clusteredCorpusDir(spark)
    val corpus = graft.Tables.embeddings(spark, cdir)
    val centroids = KMeans.fit(spark, corpus, k = 10, iterations = 2)
    assert(centroids.count() == 10)
    val vecs = corpus.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val assigned = KMeans.assign(vecs, centroids)
      .select(col("vec_id"), col("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the trained clustering must BE the planted one: members of a
    // direction all share a cluster_id, and distinct directions get
    // distinct cluster_ids (the id↔direction mapping itself is pick-order)
    val byDir = assigned.groupBy { case (id, _) => id % 10 }
      .map { case (d, m) => d -> m.values.toSet }
    assert(byDir.values.forall(_.size == 1),
      s"a planted direction split across clusters: $byDir")
    assert(byDir.values.map(_.head).toSet.size == 10,
      "two planted directions merged into one cluster")
    // gate shape: 640 rows, one per (direction, component), 20 members each
    val gate = KMeans.kmeansClustered(spark, "")
    assert(gate.count() == 640)
    assert(gate.select(col("n_members")).distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(20L))
  }
}
