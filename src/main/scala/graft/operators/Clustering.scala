package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-class distributed k-means (the corpus-organization step of a
  * training pipeline: topic bucketing, mixture analysis, ANN coarse
  * quantizers). The Lloyd machinery is the IVF index build
  * ([[Similarity.buildIvfIndex]] — deterministic hash-seeded init, one
  * hash-agg shuffle per iteration, centroids as driver-side plan
  * literals); this surface re-exposes it with clustering semantics:
  * named assignments, per-row squared distance, and the WCSS
  * convergence metric.
  */
object Clustering {

  /** Fitted model: k centroids, per-row (id, cluster, dist2), and the
    * within-cluster sum of squares (the Lloyd objective). The
    * assignments are backed by the persisted index frame — call
    * [[KMeansModel.unpersist]] when done (a hyperparameter sweep that
    * never releases pins one cached corpus copy per fit).
    */
  final case class KMeansModel(centroids: Array[Array[Double]],
                               assignments: DataFrame,
                               wcss: Double,
                               private val index: Similarity.IvfIndex) {
    def k: Int = centroids.length
    def unpersist(): Unit = index.unpersist()
  }

  /** Fit k-means with `iters` Lloyd steps. Deterministic for a given
    * (data, k, iters) — initialization is the k rows with smallest
    * xxhash64(id), no RNG. Each step is one shuffle of (cell, pos,
    * partial sums); assignment and distance are map-side expressions
    * against the centroid literals.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
             k: Int = 8, iters: Int = 4): KMeansModel = {
    val idx = Similarity.buildIvfIndex(df, idCol, vecCol, nlist = k, iters = iters)
    val withD = idx.cells.withColumn("__d2",
      element_at(idx.dists(col("cv")), col("cell") + 1))
    val wcss = withD.agg(sum(col("__d2"))).head().getDouble(0)
    val assignments = withD.select(
      col("neighbor_id").as(idCol),
      col("cell").as("cluster"),
      round(col("__d2"), 6).as("dist2"))
    KMeansModel(idx.centroids, assignments, wcss, idx)
  }
}
