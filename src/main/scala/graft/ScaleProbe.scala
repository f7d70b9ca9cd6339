package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scaling probe: synthesizes a corpus N× the sf0.1 documents
  * table (same vocabulary/length distribution, deterministic seed via
  * id-derived hashing) OUTSIDE the testdata tree, then times the
  * heavy corpus operators at 1× and N× to measure their empirical
  * scaling exponent — the evidence behind SCALE.md's linearity
  * claims. Usage: `ScaleProbe [factor] [outDir]`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_scale_probe"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n0 = base.count()
    // N×: replicate with distinct ids and deterministically permuted
    // text (rotate tokens by copy index — preserves length/vocab
    // distribution, changes content so dedup/grouping keys stay
    // realistic rather than degenerate)
    val big = (0 until factor).map { c =>
      base.select(
        (col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
        (if (c == 0) col("text") else
          concat_ws(" ", concat(
            slice(split(col("text"), " "), c + 1, 100000),
            slice(split(col("text"), " "), 1, c)))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    big.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val scaled = spark.read.parquet(s"$outDir/documents.parquet")
    println(s"corpus: ${n0} -> ${scaled.count()} docs")

    def time(name: String, f: DataFrame => Long): Unit = {
      def once(d: DataFrame): Double = {
        val t0 = System.nanoTime(); val rows = f(d)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.err.println(s"  [$name] rows=$rows ${"%.2f".format(dt)}s"); dt
      }
      once(base); val t1 = once(base) // warm measurement at 1x
      once(scaled); val tN = once(scaled)
      val exponent = math.log(tN / t1) / math.log(factor.toDouble)
      println(f"$name%-22s 1x=${t1}%.2fs ${factor}x=${tN}%.2fs scaling-exponent=${exponent}%.2f")
    }

    import graft.operators.{CorpusStats, Dedup, Sampling}
    time("topk_ngrams", d => CorpusStats.topKNgrams(d, "text", 3, 20).count())
    time("repetition", d => CorpusStats.repetitionStats(d, "doc_id", "text").count())
    time("chunk_dedup", d => CorpusStats.chunkDedup(d, "doc_id", "text", 10).count())
    time("bigram_lm", d => CorpusStats.bigramLmScore(d, "doc_id", "text").count())
    time("bm25", d => CorpusStats.bm25TopK(d, "doc_id", "text",
      Seq("spark", "join", "window"), 10).count())
    time("pack_sequences", d => Sampling.packSequences(
      d.select(col("doc_id"), graft.functions.TextFunctions.tokenCount(col("text")).as("n")),
      "doc_id", "n", 512L).count())
    time("minhash_dedup", d => Dedup.dropNearDuplicates(d, "doc_id", "text",
      minEstimate = 0.5).count())

    // vector side: the documented contrast — exact cosine near-dup is
    // the O(n²) oracle baseline, the LSH path is the scale path. The
    // N× corpus element-rotates each vector per copy (keeps norm/
    // distribution, moves it in space so buckets stay realistic).
    val ebase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val ebig = (0 until factor).map { c =>
      ebase.select(
        (col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
        (if (c == 0) col("embedding") else
          concat(slice(col("embedding"), c + 1, 100000),
            slice(col("embedding"), 1, c)).cast("array<float>")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    ebig.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val escaled = spark.read.parquet(s"$outDir/embeddings.parquet")
    println(s"embeddings: ${ebase.count()} -> ${escaled.count()} vectors")
    import graft.operators.Similarity
    def timeVec(name: String, f: DataFrame => Long): Unit = {
      def once(d: DataFrame): Double = {
        val t0 = System.nanoTime(); val rows = f(d)
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.err.println(s"  [$name] rows=$rows ${"%.2f".format(dt)}s"); dt
      }
      once(ebase); val t1 = once(ebase)
      once(escaled); val tN = once(escaled)
      val exponent = math.log(tN / t1) / math.log(factor.toDouble)
      println(f"$name%-22s 1x=${t1}%.2fs ${factor}x=${tN}%.2fs scaling-exponent=${exponent}%.2f")
    }
    // the LSH tuning contract at scale: bucket count must grow with
    // the corpus (nPlanes ~ +log2(factor)) to hold bucket occupancy —
    // and so bucket-local pair expansion — constant per vector
    val extraPlanes = math.ceil(math.log(factor.toDouble) / math.log(2.0)).toInt
    timeVec("cosine_neardup_lsh", d => {
      val planes = if (d eq ebase) 8 else 8 + extraPlanes
      Similarity.cosineNearDupPairs(d, "vec_id", "embedding",
        threshold = 0.3, nPlanes = planes).count()
    })
    timeVec("cosine_neardup_exact", d =>
      Similarity.cosineNearDupPairsExact(d, "vec_id", "embedding", threshold = 0.4).count())
    spark.stop()
  }
}
