package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scaling probe: synthesizes a corpus N× the sf-dir documents
  * table (same vocabulary/length distribution; content rotated
  * per-copy so dedup/grouping keys stay realistic) OUTSIDE the
  * testdata tree, then times the heavy corpus operators at 1× and N×
  * to measure their empirical scaling exponent — the evidence behind
  * SCALE.md's linearity claims. Measures BOTH LSH regimes (fixed
  * bucket count vs the log₂-scaled tuning contract). Usage:
  * `ScaleProbe [factor] [outDir]`; data dir from SPARK_GRAFT_SF_DIR.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_scale_probe"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // rotate an array column by c positions MODULO its per-row length
    // — a plain `slice(arr, c+1, …)` is a silent NO-OP whenever c ≥
    // the row's length (short docs would replicate byte-identical and
    // feed the dedup timings exact duplicates)
    def rotated(arr: Column, c: Int): Column = {
      val r = pmod(lit(c), size(arr))
      concat(slice(arr, r + 1, lit(Int.MaxValue)), slice(arr, lit(1), r))
    }

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val big = (0 until factor).map { c =>
      base.select(
        (col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
        (if (c == 0) col("text")
         else concat_ws(" ", rotated(split(col("text"), " "), c))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    big.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val scaled = spark.read.parquet(s"$outDir/documents.parquet")
    println(s"corpus: ${base.count()} -> ${scaled.count()} docs")

    /** Warm 1× vs N× timing + empirical exponent (shared harness). */
    def time(name: String, small: DataFrame, bigD: DataFrame)
            (f: DataFrame => Long): Unit = {
      def once(d: DataFrame): Double = {
        val t0 = System.nanoTime(); val rows = f(d)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.err.println(s"  [$name] rows=$rows ${"%.2f".format(dt)}s"); dt
      }
      once(small); val t1 = once(small)
      once(bigD); val tN = once(bigD)
      val exponent = math.log(tN / t1) / math.log(factor.toDouble)
      println(f"$name%-26s 1x=${t1}%.2fs ${factor}x=${tN}%.2fs scaling-exponent=${exponent}%.2f")
    }

    import graft.operators.{CorpusStats, Dedup, Sampling, Similarity}
    time("topk_ngrams", base, scaled)(d => CorpusStats.topKNgrams(d, "text", 3, 20).count())
    time("repetition", base, scaled)(d => CorpusStats.repetitionStats(d, "doc_id", "text").count())
    time("chunk_dedup", base, scaled)(d => CorpusStats.chunkDedup(d, "doc_id", "text", 10).count())
    time("bigram_lm", base, scaled)(d => CorpusStats.bigramLmScore(d, "doc_id", "text").count())
    time("bm25", base, scaled)(d => CorpusStats.bm25TopK(d, "doc_id", "text",
      Seq("spark", "join", "window"), 10).count())
    time("pack_sequences", base, scaled)(d => Sampling.packSequences(
      d.select(col("doc_id"), graft.functions.TextFunctions.tokenCount(col("text")).as("n")),
      "doc_id", "n", 512L).count())
    time("minhash_dedup", base, scaled)(d => Dedup.dropNearDuplicates(d, "doc_id", "text",
      minEstimate = 0.5).count())

    // vector side: exact (the O(n²) oracle baseline) vs LSH in BOTH
    // regimes — fixed bucket count (the mis-tuned state) and the
    // documented tuning contract (nPlanes grows ~log₂ n so bucket
    // occupancy, and with it bucket-local pair expansion, stays flat).
    val ebase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ebig = (0 until factor).map { c =>
      ebase.select(
        (col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
        (if (c == 0) col("embedding")
         else rotated(col("embedding"), c).cast("array<float>")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    ebig.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val escaled = spark.read.parquet(s"$outDir/embeddings.parquet")
    println(s"embeddings: ${ebase.count()} -> ${escaled.count()} vectors")
    val extraPlanes = math.ceil(math.log(factor.toDouble) / math.log(2.0)).toInt
    time("cosine_lsh_fixed_planes", ebase, escaled)(d =>
      Similarity.cosineNearDupPairs(d, "vec_id", "embedding",
        threshold = 0.3, nPlanes = 8).count())
    time("cosine_lsh_scaled_planes", ebase, escaled)(d => {
      val planes = if (d eq ebase) 8 else 8 + extraPlanes
      Similarity.cosineNearDupPairs(d, "vec_id", "embedding",
        threshold = 0.3, nPlanes = planes).count()
    })
    // default-arg regime: nPlanes unset → the operator itself derives
    // the plane count from a corpus count (autoPlanes). This is the
    // gate that the tuning contract is wired into the DEFAULT, not
    // just available: its exponent must track the scaled regime, not
    // the fixed one.
    time("cosine_lsh_auto_planes", ebase, escaled)(d =>
      Similarity.cosineNearDupPairs(d, "vec_id", "embedding",
        threshold = 0.3).count())
    time("cosine_exact", ebase, escaled)(d =>
      Similarity.cosineNearDupPairsExact(d, "vec_id", "embedding", threshold = 0.4).count())
    spark.stop()
  }
}
