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
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
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
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** IVF-Flat ANN: coarse quantizer (k-means, `iters` Lloyd steps run
    * as DataFrame jobs) partitions the corpus into `nlist` cells; a
    * query probes its `nprobe` nearest cells and exact-reranks inside.
    *
    * Scale shape: centroids are tiny (nlist×dim) and broadcast; corpus
    * assignment is map-side; candidate fetch is a broadcast-join on
    * cell id, so the scan cost per query is ~nprobe/nlist of the
    * corpus. At 100 TB the corpus would additionally be written
    * partitioned by `cell` for partition pruning.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    // deterministic init: nlist rows with the smallest xxhash64(id)
    var centroids = c.withColumn("h", xxhash64(col("neighbor_id")))
      .orderBy(col("h")).limit(nlist)
      .select(monotonically_increasing_id().as("cell"),
        transform(col("cv"), x => x.cast("double")).as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = c.crossJoin(broadcast(centroids))
        .withColumn("dist", l2Dist(col("cv"), col("centroid")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("neighbor_id")).orderBy(col("dist"), col("cell"))))
        .filter(col("rk") === 1)
      centroids = assigned
        .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), s => s.getField("m")).as("centroid"))
    }
    val cellOf = (df: DataFrame, id: Column, v: Column, keep: Int) =>
      df.crossJoin(broadcast(centroids))
        .withColumn("dist", l2Dist(v, col("centroid")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(id).orderBy(col("dist"), col("cell"))))
        .filter(col("rk") <= keep)
    val corpusCells = cellOf(c, col("neighbor_id"), col("cv"), 1)
      .select(col("neighbor_id"), col("cv"), col("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val queryCells = cellOf(q, col("query_id"), col("qv"), nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    val scored = queryCells.join(corpusCells, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
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
