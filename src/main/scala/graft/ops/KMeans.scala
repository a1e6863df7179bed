package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed k-means over the embedding corpus — the coarse quantizer a
  * real IVF index trains, expressed as pure DataFrame iterations:
  *
  *  - init: deterministic greedy farthest-point from a min-hash seed
  *    (no RNG, so plans are reproducible and retries are safe);
  *  - assign: broadcast the k centroids, per-row argmin of cosine distance
  *    (native CosineSimilarity expression — codegen'd loop);
  *  - update: per-cluster element-wise mean via posexplode + two hash
  *    aggregations (partial aggregation does the heavy lifting map-side;
  *    shuffle volume is O(k·dim), independent of corpus size).
  *
  * Each iteration is one broadcast + one narrow pass + one O(k·dim)
  * shuffle — the canonical scalable k-means loop. The driver only ever
  * holds k centroids (collected for the broadcast), never data rows.
  */
object KMeans {

  /** Train k centroids; returns (cluster_id, centroid: array<double>).
    *
    * Init is greedy farthest-point (k-center): seed = the min-hash vector,
    * then k-1 rounds each picking the vector least similar to every chosen
    * centroid — deterministic, and robust against the all-seeds-in-one-
    * cluster collapse a hash-ordered sample can produce. Each round scans
    * once and collects ONE row to the driver (k·dim doubles total — the
    * only driver-side data in the trainer). Empty clusters retain their
    * previous centroid, so k stays constant. */
  def fit(spark: SparkSession, corpus: DataFrame, k: Int,
          iterations: Int): DataFrame = {
    import spark.implicits._
    val vecs = corpus.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

    var chosen = Vector(
      vecs.withColumn("h", xxhash64(col("vec_id")))
        .orderBy(col("h"), col("vec_id")).limit(1)
        .select(col("v")).collect().head.getSeq[Double](0).toSeq)
    while (chosen.size < k) {
      // farthest point = the vector whose NEAREST chosen centroid is
      // farthest, i.e. argmin over vectors of max-similarity-to-chosen
      val maxSim = chosen
        .map(c => graft.functions.CosineSimilarity.cosine_sim(col("v"), typedLit(c)))
        .reduce(greatest(_, _))
      chosen = chosen :+ vecs.withColumn("ms", maxSim)
        .orderBy(col("ms").asc, col("vec_id")).limit(1)
        .select(col("v")).collect().head.getSeq[Double](0).toSeq
    }
    var centroids = chosen.zipWithIndex
      .map { case (c, i) => (i, c) }
      .toDF("cluster_id", "centroid")

    for (_ <- 1 to iterations) {
      val assigned = assign(vecs, centroids)
      val updated = assigned
        .select(col("cluster_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster_id"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cluster_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
        .select(col("cluster_id"),
          expr("transform(pairs, p -> p.m)").as("new_centroid"))
      // empty clusters keep their previous centroid. localCheckpoint cuts
      // the logical lineage — each iteration references `centroids` twice,
      // so without truncation the analyzed plan doubles per iteration
      // (see Dedup.components for the measured blowup).
      centroids = centroids
        .join(updated, Seq("cluster_id"), "left")
        .select(col("cluster_id"),
          coalesce(col("new_centroid"), col("centroid")).as("centroid"))
        .localCheckpoint()
    }
    centroids
  }

  /** Nearest-centroid assignment (broadcast k centroids, per-row argmin
    * over cosine similarity). */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = vecs.join(broadcast(centroids), lit(true))
      .withColumn("sim",
        graft.functions.CosineSimilarity.cosine_sim(col("v"), col("centroid")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cluster_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cluster_id"), col("sim"))
  }

  /** Query surface: cluster sizes + intra-cluster mean similarity after a
    * short training run — deterministic but hash-family-specific
    * (rows-only check; KMeansSpec asserts the semantics). */
  def clusterStats(spark: SparkSession, dir: String, k: Int = 4,
                   iterations: Int = 2): DataFrame = {
    val corpus = Tables.embeddings(spark, dir)
    val centroids = fit(spark, corpus, k, iterations)
    val vecs = corpus.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    assign(vecs, centroids)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        round(avg(col("sim")), 4).as("mean_sim"))
      .orderBy(col("cluster_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kmeans_clusters" -> ((s: SparkSession, d: String) => clusterStats(s, d)),
  )
}
