package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("vector primitives: dot, norm, cosine") {
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      dot(col("a"), col("b")).as("d"),
      l2Norm(col("a")).as("n"),
      cosine(col("a"), col("b")).as("c"),
      l2Dist(col("a"), col("b")).as("e")).first()
    assert(r.getDouble(0) == 24.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 24.0 / 25.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(2.0)) < 1e-12)
  }

  test("graft_jl_project kernel == randomProjectMd5Q HOF bit-for-bit") {
    graft.plans.GraftExtensions.registerAll(spark)
    val e = Tables(spark, sf001, "embeddings").limit(50)
    def proj(c: org.apache.spark.sql.Column) =
      e.select(col("vec_id"), c.as("p")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = proj(randomProjectMd5Q(col("embedding"), 16, 64))
    val ker = proj(randomProjectMd5QKernel(col("embedding"), 16, 64))
    assert(hof.nonEmpty && hof == ker, "float-input kernel drifted from HOF")
    // double-input path: components pass through untouched on both
    val d = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    def projD(c: org.apache.spark.sql.Column) =
      d.select(col("vec_id"), c.as("p")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(projD(randomProjectMd5Q(col("embedding"), 8, 64)) ==
      projD(randomProjectMd5QKernel(col("embedding"), 8, 64)),
      "double-input kernel drifted from HOF")
    // non-numeric-array input refuses at analysis by kernel name
    val bad = Seq((1L, "x")).toDF("vec_id", "embedding")
    val err = intercept[Exception] {
      bad.select(randomProjectMd5QKernel(col("embedding"), 2, 1)).collect()
    }
    assert(err.getMessage.contains("graft_jl_project"))
  }

  test("vector kernels refuse non-float arrays at analysis time") {
    // the fused kernels read via getFloat: array<double> would misread
    // bytes into garbage numbers, so it must fail analysis by name
    graft.plans.GraftExtensions.registerAll(spark)
    val d = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b") // array<double>
    val e = intercept[Exception] {
      d.select(call_function("graft_cosine", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<float>"), e.getMessage)
  }

  test("centroid kernels refuse a vector/centroid dimension mismatch") {
    // min(dims) truncation would yield partial distances and a
    // plausible-but-wrong cell — the kernel must throw by name instead
    graft.plans.GraftExtensions.registerAll(spark)
    val d = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f))).toDF("v") // dim 3
    val cents = typedlit[Seq[Seq[Double]]](Seq(Seq(0.0, 0.0))) // dim 2
    val e = intercept[Exception] {
      d.select(call_function("graft_nearest_cell", col("v"), cents)).collect()
    }
    assert(e.getMessage.contains("graft_nearest_cell") ||
      e.getCause != null && e.getCause.getMessage.contains("graft_nearest_cell"),
      e.getMessage)
    val e2 = intercept[Exception] {
      d.select(call_function("graft_cell_dists", col("v"), cents)).collect()
    }
    assert(e2.getMessage.contains("graft_cell_dists") ||
      e2.getCause != null && e2.getCause.getMessage.contains("graft_cell_dists"),
      e2.getMessage)
  }

  test("graft_cosine refuses a dimension mismatch instead of scoring a prefix") {
    // a min-length dot loop would return a plausible-but-wrong
    // similarity on mismatched embeddings, silently corrupting ANN
    // rankings — the kernel must throw by name like its siblings
    graft.plans.GraftExtensions.registerAll(spark)
    val d = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      d.select(call_function("graft_cosine", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("dim mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dim mismatch"),
      e.getMessage)
  }

  test("cosine of zero vector is 0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(cosine(col("a"), col("b"))).first().getDouble(0) == 0.0)
  }

  test("bruteForceTopK returns k ranked neighbors, self excluded") {
    val e = Tables(spark, sf001, "embeddings")
    val res = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
    val rows = res.collect()
    assert(rows.length == 15)
    assert(!rows.exists(r => r.getLong(0) == r.getLong(1)))
    // ranks 1..5 per query, scores non-increasing
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshTopK recall vs brute force") {
    val e = Tables(spark, sf001, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val recall = brute.map { case (k, t) =>
      (t & lsh.getOrElse(k, Set.empty)).size.toDouble / t.size }.sum / brute.size
    assert(recall >= 0.5, s"lsh recall $recall")
    // the md5 gate kernel (q30's gate: static planes, complete
    // Hamming-2 ring) must hold the same recall floor — different
    // plane family, identical probe structure
    val gate = Similarity.lshTopKMd5(e, q, "vec_id", "embedding", 5, nPlanes = 6)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val gateRecall = brute.map { case (k, t) =>
      (t & gate.getOrElse(k, Set.empty)).size.toDouble / t.size }.sum / brute.size
    assert(gateRecall >= 0.5, s"md5 gate recall $gateRecall")
  }

  test("cosineNearDupPairs: LSH pairs are exact-verified; true dups always found") {
    // the in-repo oracle for the q37 gate, asserting both directions
    // of the LSH contract:
    //  - PRECISION 1.0: every reported pair appears in the exact O(n²)
    //    pair set at the same threshold (buckets only PROPOSE — the
    //    cosine check inside each bucket is exact)
    //  - RECALL on actual duplicates: an identical embedding lands in
    //    the identical sign-LSH bucket deterministically, so planted
    //    duplicate vectors (the dedup use case: same content embedded
    //    twice) are recovered with probability 1 — borderline
    //    (cos ≈ threshold) pairs are deliberately lossy, which is the
    //    documented cost of the linear-shuffle plan (SCALE.md)
    val e = Tables(spark, sf001, "embeddings")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val exact = Similarity.cosineNearDupPairsExact(e, "vec_id", "embedding",
      threshold = 0.4).select("doc_a", "doc_b").collect().map(key).toSet
    val lsh = Similarity.cosineNearDupPairs(e, "vec_id", "embedding",
      threshold = 0.4).select("doc_a", "doc_b").collect().map(key).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${(lsh -- exact).take(5)}")
    assert(exact.nonEmpty)
    // plant 20 exact-duplicate embeddings under new ids
    val planted = e.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    val withDups = e.unionByName(planted)
    val found = Similarity.cosineNearDupPairs(withDups, "vec_id", "embedding",
      threshold = 0.99).select("doc_a", "doc_b").collect().map(key).toSet
    (0L until 20L).foreach { id =>
      assert(found.contains((id, id + 1000000L)),
        s"planted duplicate of vec $id not recovered")
    }
  }

  test("semanticDedup: planted duplicates pruned to one survivor, both kernels") {
    // SemDeDup contract on a corpus with planted EXACT duplicates:
    // an identical embedding always lands in its twin's cluster (same
    // distances to every centroid, ties broken the same way), so
    // whatever else the two kernels' different clusterings do, each
    // planted pair must collapse to its lowest id — and nothing below
    // the threshold may be dropped without a similar lower-id row.
    val e = Tables(spark, sf001, "embeddings")
    val planted = e.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    val withDups = e.unionByName(planted)
    for (survivors <- Seq(
        graft.operators.Similarity.semanticDedup(
          withDups, "vec_id", "embedding", threshold = 0.99),
        graft.operators.Clustering.semanticDedupMd5(
          withDups, "vec_id", "embedding", threshold = 0.99))) {
      val ids = survivors.select("vec_id").collect().map(_.getLong(0)).toSet
      (0L until 20L).foreach { id =>
        assert(ids.contains(id), s"original vec $id wrongly dropped")
        assert(!ids.contains(id + 1000000L),
          s"planted duplicate of vec $id survived")
      }
      // survivors + their clusters are a partition of the corpus ids
      assert(ids.size == survivors.count())
    }
    // production and gate agree on the survivor COUNT within the
    // clustering difference (same rule, different cluster boundaries):
    // at a moderate threshold both prune a similar fraction
    val prod = graft.operators.Similarity.semanticDedup(
      e, "vec_id", "embedding", threshold = 0.3).count()
    val gate = graft.operators.Clustering.semanticDedupMd5(
      e, "vec_id", "embedding", threshold = 0.3).count()
    val n = e.count()
    assert(prod < n && gate < n, "thresholds too high to prune anything")
    assert(math.abs(prod - gate) <= n / 5,
      s"kernels diverged: prod=$prod gate=$gate of $n")
  }

  test("md5 gate kernel: precision 1.0, recall comparable to production") {
    val e = Tables(spark, sf001, "embeddings")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val exact = Similarity.cosineNearDupPairsExact(e, "vec_id", "embedding",
      threshold = 0.3).select("doc_a", "doc_b").collect().map(key).toSet
    val gate = Similarity.cosineNearDupPairsMd5(e, "vec_id", "embedding",
      threshold = 0.3, nPlanes = 6).select("doc_a", "doc_b").collect().map(key).toSet
    val prod = Similarity.cosineNearDupPairs(e, "vec_id", "embedding",
      threshold = 0.3, nPlanes = 6).select("doc_a", "doc_b").collect().map(key).toSet
    assert(gate.nonEmpty && gate.subsetOf(exact),
      s"gate false positives: ${(gate -- exact).take(5)}")
    // different plane family, same plane count: recall within 2x of
    // the production kernel's (both are lossy LSH samplings of the
    // same exact pair set)
    val gr = gate.size.toDouble / exact.size
    val pr = prod.size.toDouble / exact.size
    assert(gr >= pr / 2, s"gate recall $gr << production recall $pr")
  }

  test("lshTopK probe fan-out is capped: no Hamming-2 ring above 12 planes") {
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Explode}
    val e = Tables(spark, sf001, "embeddings")
    def probes(nPlanes: Int): Int = {
      val df = Similarity.lshTopK(e, e.limit(2), "vec_id", "embedding", 5,
        nPlanes = nPlanes)
      df.queryExecution.analyzed.collect {
        case g: Generate => g.generator
      }.collectFirst {
        case ex: Explode => ex.child match {
          case ca: CreateArray => ca.children.size
        }
      }.get
    }
    assert(probes(6) == 1 + 6 + 15)   // own + Hamming-1 + full Hamming-2 ring
    assert(probes(12) == 1 + 12 + 66) // full ring AT the knee
    // graded past the knee: ring truncated to its knee size, not
    // dropped — probes(13) is one MORE than probes(12), no cliff
    assert(probes(13) == 1 + 13 + 66)
    assert(probes(16) == 1 + 16 + 66)
    assert(probes(24) == 1 + 24 + 66) // 301 probes before the budget existed
  }

  test("recall just above the Hamming-2 knee stays near the knee's") {
    // the cliff ADVICE flagged: 12 -> 13 planes used to drop probes
    // 79 -> 14. With the budgeted ring both sides of the boundary
    // probe the same Hamming-2 set; recall@5 must not step.
    val e = Tables(spark, sf001, "embeddings")
    val queries = e.limit(8)
    val truth = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nPlanes: Int): Double = {
      val got = Similarity.lshTopK(e, queries, "vec_id", "embedding", 5,
          nPlanes = nPlanes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.count(got.contains).toDouble / truth.size
    }
    val atKnee = recall(12)
    val aboveKnee = recall(13)
    assert(aboveKnee >= atKnee - 0.15,
      s"recall cliff above the knee: 12 planes $atKnee -> 13 planes $aboveKnee")
  }

  test("autoPlanes: bucket count grows with corpus size (tuning contract)") {
    // the scale contract: plane count tracks log2(n/targetBucket) so
    // bucket occupancy stays ~constant as the corpus grows
    assert(Similarity.autoPlanes(100L) >= 1)
    assert(Similarity.autoPlanes(64L * 32) == 5)
    assert(Similarity.autoPlanes(64L * 32 * 1024) == 15)
    val sizes = Seq(1000L, 100000L, 10000000L, 1000000000L)
    val planes = sizes.map(Similarity.autoPlanes(_))
    assert(planes == planes.sorted && planes.distinct == planes,
      s"autoPlanes must strictly grow across decades: $planes")
    // 30x growth adds ~log2(30)≈5 planes — the regime ScaleProbe measured
    assert(Similarity.autoPlanes(60000L) - Similarity.autoPlanes(2000L) == 5)
    assert(Similarity.autoPlanes(Long.MaxValue) == 24) // clamped
  }

  test("ivfTopK recall vs brute force") {
    val e = Tables(spark, sf001, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val recall = brute.map { case (k, t) =>
      (t & ivf.getOrElse(k, Set.empty)).size.toDouble / t.size }.sum / brute.size
    assert(recall >= 0.4, s"ivf recall $recall")
  }

  test("PQ: codes compress, ADC+rerank recall vs brute force") {
    import graft.operators.Pq
    val e = Tables(spark, sf001, "embeddings")
    val cb = Pq.train(e, "vec_id", "embedding", m = 8, ksub = 16, iters = 6)
    assert(cb.dsub == 8 && cb.centers.length == 8)
    val enc = Pq.encode(e, "embedding", cb).persist()
    // codes are within range and one per subspace
    val codes = enc.select("pq_code").head().getSeq[Int](0)
    assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    val q = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val pq = Pq.topK(enc, q, "vec_id", "embedding", cb, k = 5,
      rerank = 50, rawCorpus = Some(e))
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val recall = brute.map { case (k, t) =>
      (t & pq.getOrElse(k, Set.empty)).size.toDouble / t.size }.sum / brute.size
    assert(recall >= 0.6, s"pq recall $recall")
    enc.unpersist()
  }

  test("IVF-PQ composition: pruned + compressed probe recall vs brute force") {
    import graft.operators.Pq
    val e = Tables(spark, sf001, "embeddings")
    val ivf = Similarity.buildIvfIndex(e, "vec_id", "embedding", nlist = 8)
    val cb = Pq.train(e, "vec_id", "embedding", m = 8, ksub = 16, iters = 6)
    val encCells = Pq.encode(ivf.cells, "cv", cb)
      .select(col("neighbor_id"), col("cell"), col("pq_code")).persist()
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
    val got = Pq.ivfPqTopK(ivf, cb, encCells, q, "neighbor_id", "embedding",
      k = 5, nprobe = 4, rerank = 50,
      rawCorpus = Some(e.select(col("vec_id").as("neighbor_id"), col("embedding"))))
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val brute = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10),
      "vec_id", "embedding", 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val recall = brute.map { case (k, t) =>
      (t & got.getOrElse(k, Set.empty)).size.toDouble / t.size }.sum / brute.size
    assert(recall >= 0.4, s"ivf-pq recall $recall")
    encCells.unpersist()
    ivf.unpersist()
  }

  test("labelCentroids: one row per (label, dim)") {
    val e = Tables(spark, sf001, "embeddings")
    val c = Similarity.labelCentroids(e, "label", "embedding")
    val nLabels = e.select("label").distinct().count()
    assert(c.count() == nLabels * 64)
  }

  test("ivfTopKMd5 gate: recall vs brute force on the embeddings fixture") {
    import graft.operators.Clustering
    val e = Tables(spark, sf001, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val got = Clustering.ivfTopKMd5(e, q, "vec_id", "embedding",
      k = 5, nlist = 8, iters = 2, nprobe = 4)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(got.values.forall(_.size == 5), "gate must return full top-5 lists")
    val recall = brute.map { case (k, t) =>
      (t & got.getOrElse(k, Set.empty)).size.toDouble / t.size }.sum / brute.size
    assert(recall >= 0.5, s"ivfTopKMd5 recall $recall")
  }

  test("pqTopKMd5 gate: recall vs brute force on the embeddings fixture") {
    import graft.operators.Clustering
    val e = Tables(spark, sf001, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    // same pool size as the production Pq.topK recall test above —
    // the gate's ADC pruning should reach comparable quality
    val got = Clustering.pqTopKMd5(e, q, "vec_id", "embedding", k = 5,
      m = 8, ksub = 16, iters = 2, rerank = 50)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert(got.values.forall(_.size == 5), "gate must return full top-5 lists")
    val recall = brute.map { case (k, t) =>
      (t & got.getOrElse(k, Set.empty)).size.toDouble / t.size }.sum / brute.size
    assert(recall >= 0.5, s"pqTopKMd5 recall $recall")
  }

  test("IVF index builds once, probes many query sets, survives IO roundtrip") {
    val e = Tables(spark, sf001, "embeddings")
    val idx = Similarity.buildIvfIndex(e, "vec_id", "embedding", nlist = 8, iters = 2)
    // two independent probe sets against the SAME built index
    val r1 = Similarity.ivfProbe(idx, e.filter(col("vec_id") < 5),
      "vec_id", "embedding", 5)
    val r2 = Similarity.ivfProbe(idx, e.filter(col("vec_id").between(10, 14)),
      "vec_id", "embedding", 5)
    assert(r1.count() == 25 && r2.count() == 25)
    // persisted index round-trip: probing the reopened index is identical
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.writeIvfIndex(idx, dir)
    val reopened = Similarity.openIvfIndex(spark, dir)
    assert(reopened.nlist == idx.nlist)
    val again = Similarity.ivfProbe(reopened, e.filter(col("vec_id") < 5),
      "vec_id", "embedding", 5)
    val k1 = r1.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val k2 = again.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(k1 == k2)
    idx.unpersist()
  }

  test("int8 codec: per-component error bound, cosine preserved, zero vector safe") {
    val e = Tables(spark, sf001, "embeddings")
      .withColumn("scale", int8Scale(col("embedding")))
      .withColumn("qvec", int8Quantize(col("embedding"), col("scale")))
      .withColumn("deq", int8Dequantize(col("qvec"), col("scale")))
    // every quantized component is a clamped int8 magnitude
    val rng = e.select(explode(col("qvec")).as("c"))
      .agg(min("c"), max("c")).first()
    assert(rng.getInt(0) >= -127 && rng.getInt(1) <= 127)
    // reconstruction error ≤ scale/2 per component (half-up rounding)
    val worst = e.select(max(aggregate(
      zip_with(col("embedding"), col("deq"), (x, d) =>
        abs(x.cast("double") - d) / col("scale")),
      lit(0.0), (a, v) => greatest(a, v)))).first().getDouble(0)
    assert(worst <= 0.5 + 1e-9, s"max |err|/scale = $worst")
    // the codec preserves direction: cosine(original, dequantized) ≈ 1
    val minCos = e.select(min(cosine(col("embedding"), col("deq"))))
      .first().getDouble(0)
    assert(minCos > 0.999, s"min cosine after int8 roundtrip = $minCos")
    // zero vector: scale 0, all-zero codes, no division by zero
    val z = Seq(Tuple1(Array(0.0f, 0.0f, 0.0f))).toDF("embedding")
      .withColumn("scale", int8Scale(col("embedding")))
      .withColumn("qvec", int8Quantize(col("embedding"), col("scale")))
      .first()
    assert(z.getDouble(1) == 0.0)
    assert(z.getSeq[Int](2) == Seq(0, 0, 0))
  }

  test("q107p prod twin digests the SAME codes the q107 gate oracles") {
    // the prod twin emits an md5 fingerprint of the code array (raw
    // arrays crash the harness comparator); this pins that fingerprint
    // to the gate query's, so the oracled math covers the prod surface
    val gate = SparkEntry.queries("q107_embed_int8")(spark, sf001)
      .select(col("vec_id"), col("qvec_fp"))
    val prod = SparkEntry.queries("q107p_embed_int8_prod")(spark, sf001)
      .select(col("vec_id"), col("qvec_fp").as("prod_fp"))
    val n = gate.join(prod, "vec_id")
      .filter(col("qvec_fp") =!= col("prod_fp")).count()
    assert(n == 0, s"$n vec_ids where prod digest != gate digest")
  }

  test("graft_cosine_int8: fused kernel == driver dequantize+cosine; dim mismatch refused") {
    import graft.functions.VectorFunctions.{int8Scale, int8Quantize}
    graft.plans.GraftExtensions.registerAll(spark)
    val e = Tables(spark, sf001, "embeddings").limit(100)
      .withColumn("scale", int8Scale(col("embedding")))
      .withColumn("qv8", int8Quantize(col("embedding"), col("scale")))
      .withColumn("ac", call_function("graft_cosine_int8",
        col("embedding"), col("qv8"), col("scale")))
    e.select(col("embedding"), col("scale"), col("qv8"), col("ac"))
      .collect().foreach { r =>
      val q = r.getSeq[Float](0)
      val s = r.getDouble(1)
      val codes = r.getSeq[Int](2)
      var d = 0.0; var qn = 0.0; var cn = 0.0
      q.indices.foreach { i =>
        val x = q(i).toDouble; val y = codes(i).toDouble * s
        d += x * y; qn += x * x; cn += y * y
      }
      val want = if (qn == 0.0 || cn == 0.0) 0.0 else d / (math.sqrt(qn) * math.sqrt(cn))
      assert(math.abs(r.getDouble(3) - want) < 1e-12)
      // roundtrip quality: the self-cosine of a vector against its own
      // int8 codes stays near 1
      assert(r.getDouble(3) > 0.999, s"self int8 cosine ${r.getDouble(3)}")
    }
    val boom = intercept[Exception] {
      Tables(spark, sf001, "embeddings").limit(1)
        .select(call_function("graft_cosine_int8", col("embedding"),
          array(lit(1), lit(2)), lit(1.0))).collect()
    }
    assert(boom.getMessage != null)
  }

  test("random projection: JL cosine preservation and gate-twin geometry agreement") {
    import graft.functions.VectorFunctions.{randomProject, randomProjectMd5Q}
    val outDim = 32
    val e = Tables(spark, sf001, "embeddings")
      .withColumn("proj", randomProject(col("embedding"), outDim, 64))
    // exact parallel pair preserved exactly: v vs 2·v have cosine 1
    val par = e.limit(1)
      .withColumn("proj2", randomProject(
        transform(col("embedding"), x => x * 2.0f), outDim, 64))
      .select(cosine(col("proj"), col("proj2"))).first().getDouble(0)
    assert(math.abs(par - 1.0) < 1e-9)
    // JL: cosine of random pairs preserved to O(1/sqrt(outDim)) ≈
    // 0.18 std at outDim 32. These 380 deterministic pairs measure
    // worst 0.494 (~2.8σ — one tail pair) and mean well under 1σ;
    // both pinned with margin
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"),
      col("proj").as("pa"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"),
      col("proj").as("pb"))
    val dist = a.join(b, col("ia") =!= col("ib") && col("ib") < 20 && col("ia") < 20)
      .select(abs(cosine(col("va"), col("vb")) - cosine(col("pa"), col("pb"))).as("d"))
    val Array(worst, mean) =
      dist.agg(max(col("d")), avg(col("d"))).first().toSeq.toArray.map(_.asInstanceOf[Double])
    assert(worst < 0.55, s"JL worst cosine distortion $worst")
    assert(mean < 0.15, s"JL mean cosine distortion $mean")
    // the integer gate twin spans the same construction: its
    // components, rescaled, correlate perfectly with a float
    // projection over the SAME md5 weight family (the twin is the
    // quantized form of that projection, to 2^-16 component error)
    val tw = Tables(spark, sf001, "embeddings").limit(50)
      .withColumn("q", randomProjectMd5Q(col("embedding"), 4, 64))
      .withColumn("f", array((0 until 4).map(p =>
        aggregate(zip_with(col("embedding"),
          graft.functions.VectorFunctions.hyperplaneMd5Int(p, 64),
          (x, w) => x.cast("double") * w.cast("double")),
          lit(0.0), (acc, t) => acc + t)): _*))
      .select(min(cosine(
        transform(col("q"), c => c.cast("double") / 65536.0), col("f"))))
      .first().getDouble(0)
    assert(tw > 0.999999, s"twin/float cosine $tw")
  }
}
