package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for the training-data pipeline: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash. All distributed-first:
  * signatures are computed map-side per row; candidate generation is a
  * single shuffle keyed on content hash / LSH bucket — never an
  * all-pairs cross join, so each stage scales linearly in rows (plus
  * bucket-local pair expansion, controlled by band width).
  */
object Dedup {

  /** Exact dedup on a canonical key: keep the lowest id per group.
    * One hash-aggregate shuffle on the (hashed) key.
    */
  def exactGroups(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(md5(key.cast("binary")).as("content_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup: retain one row per distinct key (lowest id wins). */
  def dropExactDuplicates(df: DataFrame, idCol: String, key: Column): DataFrame = {
    val keep = exactGroups(df, idCol, key).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** All pairs (a<b) whose word-n-gram Jaccard similarity ≥ threshold.
    * Plan: per-doc distinct shingles → explode → shuffle-join on the
    * shingle (co-partitioned equi-join, AQE handles skewed shingles) →
    * per-pair intersection counts → filter. Exact, but the shingle join
    * is quadratic within a shingle's posting list — at 100 TB use
    * `minhashCandidates` first and feed only candidates here.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double): DataFrame = {
    // 64-bit shingle hashes, not strings: ~4x smaller shuffles, and
    // the one-pass ngram kernel (chained token-hash mix, already
    // distinct) never materializes an n-gram string at all. Collisions
    // (~2^-64 per pair) are statistically invisible at any realistic
    // corpus size.
    graft.plans.GraftExtensions.registerAll(df.sparkSession)
    val sh = df.select(col(idCol).as("doc"),
      explode(call_function("graft_ngram_hashes",
        transform(tokens(col(textCol)), t => xxhash64(t)), lit(n))).as("s"))
    val counts = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    // posting-list expansion instead of a self-join: ONE shuffle of the
    // (doc, shingle) pairs builds per-shingle doc lists; pair fan-out
    // is then map-side generators. (A self-join shuffles the same data
    // twice and sorts both sides.) Bucket-size skew = hot shingles —
    // the sorted doc list keeps expansion deterministic.
    val inter = sh.groupBy(col("s"))
      .agg(array_sort(collect_list(col("doc"))).as("docs"))
      .filter(size(col("docs")) > 1)
      .select(posexplode(col("docs")).as(Seq("i", "doc_a")), col("docs"))
      .select(col("doc_a"), explode(slice(col("docs"), col("i") + 2,
        size(col("docs")))).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash+LSH candidate pairs: signature (k values) per doc map-side,
    * explode into `bands` bucket keys, shuffle once on the bucket, emit
    * distinct pairs sharing ≥1 bucket with their estimated Jaccard
    * (signature agreement fraction). Linear-scan friendly at scale:
    * no global pairwise comparison ever materializes.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                        minEstimate: Double = 0.0): DataFrame = {
    val rowsPerBand = k / bands
    graft.plans.GraftExtensions.registerAll(df.sparkSession)
    // Stage the signature through explicit projections (hash each
    // shingle once, then one native one-pass k-min kernel — a
    // codegen'd Catalyst expression, plans/TextKernels.scala) and
    // persist — the self-join would otherwise inline and recompute the
    // whole signature expression on both sides.
    val sigs = df.select(col(idCol).as("doc"),
        call_function("graft_ngram_hashes",
          transform(tokens(col(textCol)), t => xxhash64(t)), lit(shingleN)).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc"), call_function("graft_minhash_sig", col("hs"), lit(k)).as("sig"))
      .persist()
    // Candidate pairs carry ONLY ids through the bucket join + distinct;
    // signatures re-attach afterwards (two slim joins on doc id).
    val buckets = sigs.select(col("doc"),
      posexplode(lshBands(col("sig"), bands, rowsPerBand)).as(Seq("band", "bucket")))
    val a = buckets.as("a"); val b = buckets.as("b")
    val pairs = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    val scored = pairs
      .join(sigs.select(col("doc").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("n_match", aggregate(
        zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v))
      .withColumn("est_jaccard", round(col("n_match").cast("double") / lit(k.toDouble), 6))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .filter(col("est_jaccard") >= minEstimate)
    // Materialize the (small — dup pairs only) candidate list and
    // RELEASE the signature cache: the output is self-contained
    // (lineage-truncated), so the big per-doc signature frame never
    // outlives the operator. localCheckpoint blocks are context-cleaned
    // on GC, unlike persist entries which pin the cache manager forever
    // — across a 56-query session un-released persists were the
    // difference between a 15 s and a 52 s dedup pipeline (round-2
    // bench regression: accumulated cache pressure).
    // CLUSTER CAVEAT: localCheckpoint blocks are non-reliable executor
    // storage — under executor loss / dynamic allocation the truncated
    // lineage cannot recompute. On a real cluster set a checkpoint dir
    // and flip this (and the CC loop's) to reliable checkpoint(), or
    // disable dynamic allocation for the dedup stage.
    val out = scored.localCheckpoint(true)
    sigs.unpersist()
    out
  }

  /** Connected components over an undirected pair list (doc_a, doc_b)
    * by min-label propagation: each node repeatedly adopts the
    * smallest label among itself and its neighbors until fixpoint —
    * O(component diameter) rounds, one join + one hash-agg shuffle per
    * round. Near-dup components have tiny diameters (dup clusters are
    * near-cliques), so 2-3 rounds suffice in practice; for adversarial
    * long-chain graphs the large-star/small-star variant (O(log n)
    * rounds) is the drop-in upgrade.
    *
    * Driver sync is BATCHED: `checkEvery` propagation rounds run as one
    * pipelined job before each convergence check, and the check itself
    * is a cheap scalar — labels only ever decrease, so the label sum
    * (exact, as decimal) is stationary iff the labels are. This cuts
    * the blocking actions from one-per-round to one-per-batch, which at
    * cluster scale is the difference between N and N/3 job launches on
    * the critical path.
    * Output: (node, label) — label = min node id of the component.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 20, checkEvery: Int = 2,
                          driverThreshold: Int = 1 << 20): DataFrame = {
    // SCALE-ADAPTIVE: the near-dup pair list is the *filtered
    // survivors* of the LSH gate — usually minuscule next to the
    // corpus. When it fits on the driver (≤ driverThreshold edges,
    // probed with ONE take()), exact union-find locally replaces
    // O(diameter) distributed rounds of 2 shuffles + a blocking action
    // each; past the threshold the distributed loop takes over
    // unchanged. Same outcome either way: label = min node id.
    val probe = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .take(driverThreshold + 1)
    if (probe.length <= driverThreshold)
      return driverUnionFind(pairs.sparkSession, probe,
        pairs.schema(aCol).dataType)
    val sym = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .union(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
    // self-loops fold "keep own label" into the same neighbor-min agg,
    // so each round consumes the previous labels frame exactly ONCE —
    // a linear plan chain that can pipeline `checkEvery` rounds in one
    // job without exponential recompute of unmaterialized rounds
    val edges = sym
      .union(sym.select(col("a")).distinct().select(col("a"), col("a").as("b")))
      .persist()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).persist()

    def propagate(l: DataFrame): DataFrame =
      edges.join(l.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node")).agg(min(col("label")).as("label"))
    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head().getDecimal(0)

    var prevSum: java.math.BigDecimal = null
    var done = false
    var i = 0
    while (!done && i < maxIters) {
      var next = labels
      var j = 0
      while (j < checkEvery && i < maxIters) { next = propagate(next); j += 1; i += 1 }
      next.persist()
      val s = labelSum(next) // the ONE action per batch
      labels.unpersist()
      labels = next
      if (prevSum != null && s.compareTo(prevSum) == 0) done = true
      prevSum = s
    }
    // Hand back a self-contained (node,label) frame and release every
    // iteration cache — nothing from the loop outlives the call.
    val out = labels.localCheckpoint(true)
    labels.unpersist()
    edges.unpersist()
    out
  }

  /** Exact union-find over a collected edge list (union-by-min with
    * path compression): the component root IS the minimum node id, so
    * the output contract matches the distributed loop exactly.
    */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
                              edges: Array[org.apache.spark.sql.Row],
                              idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val lt: (Any, Any) => Boolean = (x, y) => (x, y) match {
      case (a: Long, b: Long)     => a < b
      case (a: Int, b: Int)       => a < b
      case (a: String, b: String) => a < b
      case (a: Number, b: Number) => a.doubleValue() < b.doubleValue()
      case other => throw new IllegalArgumentException(s"unorderable ids: $other")
    }
    val parent = new java.util.HashMap[Any, Any]()
    def find(x0: Any): Any = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp); x = gp; p = parent.getOrDefault(x, x)
      }
      x
    }
    edges.foreach { r =>
      val (ra, rb) = (find(r.get(0)), find(r.get(1)))
      if (ra != rb) {
        if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val nodes = new java.util.HashSet[Any]()
    edges.foreach { r => nodes.add(r.get(0)); nodes.add(r.get(1)) }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](nodes.size())
    nodes.forEach(n => rows.add(org.apache.spark.sql.Row(n, find(n))))
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", idType),
      org.apache.spark.sql.types.StructField("label", idType))))
  }

  /** End-to-end near-duplicate removal: MinHash+LSH candidates above
    * `minEstimate` → connected components → keep the smallest id per
    * component, drop the rest. The full pipeline is: map-side
    * signatures, one bucket shuffle, a few component rounds over the
    * (tiny) pair list, one anti-join back against the corpus.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                         minEstimate: Double = 0.7): DataFrame = {
    val pairs = minhashCandidates(df, idCol, textCol, shingleN, k, bands, minEstimate)
    val comps = connectedComponents(pairs, "doc_a", "doc_b")
    val doomed = comps.filter(col("node") =!= col("label"))
      .select(col("node").as(idCol))
    df.join(doomed, Seq(idCol), "left_anti")
  }

  /** SimHash near-dup pairs: 64-bit signature map-side; candidates share
    * one of four 16-bit bands (single shuffle on (band, key)); verified
    * by Hamming distance ≤ maxHamming.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 8): DataFrame = {
    graft.plans.GraftExtensions.registerAll(df.sparkSession)
    // one-pass codegen'd kernel over the token hashes (vs 64 HOF
    // traversals in TextFunctions.simhash64 — same semantics up to
    // the vote tie-break, cross-checked in DedupSpec).
    val sigs = df.select(col(idCol).as("doc"),
      call_function("graft_simhash64",
        transform(tokens(col(textCol)), t => xxhash64(t))).as("sig"))
    val banded = sigs.select(col("doc"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("band", "key")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", graft.functions.TextFunctions.hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
