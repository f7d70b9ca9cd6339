package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus, rank per query. Scan is O(|corpus|·|queries|)
  * but embarrassingly parallel: queries broadcast, corpus never
  * shuffled, and the per-query top-k runs through
  * `TakeOrderedAndProject`-style window pruning.
  *
  * Scale path: sign-LSH bucketing — corpus and queries keyed by a
  * deterministic random-hyperplane bucket; candidates are bucket-local
  * (single co-partitioned join), multi-probe over neighboring buckets
  * recovers recall.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query row.
    * Output: (query_id, neighbor_id, rank, cosine).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.plans.GraftExtensions.registerAll(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", call_function("graft_cosine", col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** LSH-bucketed ANN: candidates share a sign-LSH bucket (with
    * multi-probe: query also probes buckets at Hamming distance ≤ 2),
    * then exact cosine re-rank within candidates. One shuffle on the
    * bucket key; corpus bucketing is a map-side column.
    *
    * Sizing: 2^nPlanes buckets should be ≈ corpus/64 so each probe set
    * covers a meaningful candidate pool; for weakly-clustered (random)
    * embeddings prefer `ivfTopK`.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 5, dim: Int = 64): DataFrame = {
    graft.plans.GraftExtensions.registerAll(corpus.sparkSession)
    val cB = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      signLshBucket(col(vecCol), nPlanes, dim).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signLshBucket(col(vecCol), nPlanes, dim).as("b0"))
    // multi-probe: own bucket + all buckets at Hamming distance 1 and 2
    val h1 = (0 until nPlanes).map(p => col("b0").bitwiseXOR(lit(1L << p)))
    val h2 = for (p <- 0 until nPlanes; q <- (p + 1) until nPlanes)
      yield col("b0").bitwiseXOR(lit((1L << p) | (1L << q)))
    val probes = qBase.select(col("query_id"), col("qv"),
      explode(array(col("b0") +: (h1 ++ h2): _*)).as("bucket"))
    val scored = probes.join(cB, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .distinct()
      .withColumn("cos", call_function("graft_cosine", col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** IVF-Flat ANN: coarse quantizer (k-means, `iters` Lloyd steps)
    * partitions the corpus into `nlist` cells; a query probes its
    * `nprobe` nearest cells and exact-reranks inside.
    *
    * Scale shape: centroids (nlist×dim doubles) live on the DRIVER
    * between steps and enter the plan as an array literal, so cell
    * assignment is a pure MAP-SIDE argmin — no crossJoin, no window,
    * no shuffle of the corpus, ever. Each Lloyd step costs exactly one
    * hash-agg shuffle of (cell, pos, partial-sums); probing joins the
    * (small, broadcast) query probes against corpus cells. At 100 TB
    * the corpus is additionally written `partitionBy(cell)` so probes
    * prune partitions at the source.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 2): DataFrame = {
    graft.plans.GraftExtensions.registerAll(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))

    // deterministic init: the nlist vectors with smallest xxhash64(id)
    var cents: Array[Array[Double]] = c
      .withColumn("h", xxhash64(col("neighbor_id")))
      .orderBy(col("h")).limit(nlist)
      .select(col("cv")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

    def centLit: Column =
      array(cents.map(ct => array(ct.map(lit): _*)): _*)
    // squared L2 to each centroid; argmin index = the cell id.
    def dists(v: Column): Column = transform(centLit, ct =>
      aggregate(zip_with(v, ct, (x, y) => {
        val d = x.cast("double") - y
        d * d
      }), lit(0.0), (acc, x) => acc + x))
    def cellOf(v: Column): Column = {
      val ds = dists(v)
      (array_position(ds, array_min(ds)) - 1).cast("int")
    }

    for (_ <- 0 until iters) {
      // one shuffle per step: (cell, pos) partial sums -> new means
      val sums = c.withColumn("cell", cellOf(col("cv")))
        .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getAs[Int]("cell"))
      cents = cents.indices.map { cell =>
        byCell.get(cell) match {
          case Some(rows) =>
            val dim = cents(cell).length
            val m = new Array[Double](dim)
            rows.foreach(r => m(r.getAs[Int]("pos")) =
              r.getAs[Double]("s") / r.getAs[Long]("n"))
            m
          case None => cents(cell) // empty cell keeps its centroid
        }
      }.toArray
    }

    val corpusCells = c.withColumn("cell", cellOf(col("cv")))
    // query probes: nprobe nearest cells via sorted (dist, cell) pairs
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probes = q.withColumn("__d", dists(col("qv")))
      .withColumn("probe", explode(slice(array_sort(
        zip_with(col("__d"), sequence(lit(0), lit(nlist - 1)),
          (d, i) => struct(d.as("d"), i.as("cell")))), 1, nprobe)))
      .select(col("query_id"), col("qv"), col("probe.cell").as("cell"))
    val scored = corpusCells.join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", call_function("graft_cosine", col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Per-label centroids: explode to (label, pos, value), average per
    * dimension — a single hash-agg shuffle, linear in rows×dim.
    * Output: (label, pos, centroid_val).
    */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("v").cast("double")), 6).as("centroid_val"))

  /** EXACT embedding-cosine near-duplicate pairs (all pairs ≥
    * threshold): id-ordered self-join with the native cosine kernel.
    * O(n²) — the verification/oracle baseline; use
    * [[cosineNearDupPairs]] (LSH-bucketed, linear shuffle) at scale.
    */
  def cosineNearDupPairsExact(df: DataFrame, idCol: String, vecCol: String,
                              threshold: Double): DataFrame = {
    graft.plans.GraftExtensions.registerAll(df.sparkSession)
    val v = df.select(col(idCol).as("doc"), col(vecCol).as("v"))
    val a = v.select(col("doc").as("doc_a"), col("v").as("va"))
    val b = v.select(col("doc").as("doc_b"), col("v").as("vb"))
    a.join(broadcast(b), col("doc_a") < col("doc_b"))
      .withColumn("cos", call_function("graft_cosine", col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("cos"), 6).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * LSH-bucketed (same single-shuffle shape as Dedup.minhashCandidates).
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val b = df.select(col(idCol).as("doc"), col(vecCol).as("v"),
      signLshBucket(col(vecCol), nPlanes, dim).as("bucket"))
    val a = b.as("a"); val c = b.as("b")
    a.join(c, col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .withColumn("cos", cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        round(col("cos"), 6).as("cosine"))
  }
}
