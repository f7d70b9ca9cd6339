package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 evidence tool: dumps the formatted plans of the INTERNAL
  * operator stages the optimization round rewired (the query-level
  * gates snapshot these frames eagerly, so `Explain` on the gate shows
  * a LogicalRDD leaf and hides the stage that changed).
  */
object PlanDumpR19 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the r18 aggregate form, reconstructed verbatim (same expressions
    // Md5KernelsSpec replays) so the before/after plan diff of the
    // snapshot-hidden signature stage is on record
    println("========== minhash_sigs_md5_r18form ==========")
    locally {
      val k = 32; val n = 3
      val w = split(col("text"), " ")
      val starts = when(size(w) >= n, sequence(lit(1), size(w) - (n - 1)))
        .otherwise(array())
      val shingles = array_distinct(transform(starts,
        i => concat_ws(" ", slice(w, i, lit(n)))))
      val sh = docs.select(col("doc_id").as("doc"), explode(shingles).as("s"))
        .select(col("doc"),
          conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("__hb"))
      val seedMins = (0 until k).map(i =>
        min((lit(graft.operators.DedupHashes.minhashA(i)) * col("__hb") +
          lit(graft.operators.DedupHashes.minhashB(i))) %
          lit(graft.operators.DedupHashes.MinhashP)).as(s"__h$i"))
      sh.groupBy(col("doc"))
        .agg(seedMins.head, seedMins.tail: _*)
        .select(col("doc"), array((0 until k).map(i => col(s"__h$i")): _*).as("sig"))
        .explain("formatted")
    }
    println("========== minhash_sigs_md5 ==========")
    graft.operators.Dedup.minhashSignaturesMd5(docs, "doc_id", "text", 3, 32)
      .explain("formatted")
    println("========== simhash_sigs_md5 ==========")
    graft.operators.Dedup.simhashSignaturesMd5(docs, "doc_id", "text")
      .explain("formatted")
    println("========== hash_embeddings_md5 ==========")
    graft.functions.TextFunctions.hashEmbeddingsMd5(docs, "doc_id", "text", 64)
      .explain("formatted")
    println("========== classifier_score ==========")
    graft.operators.Classifier.trainAndScore(docs, "doc_id", "text",
      col("lang") === "en", dim = 32, iters = 1, rate = 1.0)
      .explain("formatted")
    println("========== hashing_tfidf_md5 ==========")
    graft.operators.CorpusStats.hashingTfIdfMd5(docs, "doc_id", "text", 256)
      .explain("formatted")
    println("========== hashing_tfidf_prod ==========")
    graft.operators.CorpusStats.hashingTfIdf(docs, "doc_id", "text", 256)
      .explain("formatted")
    println("========== hash_embeddings_prod ==========")
    graft.functions.TextFunctions.hashEmbeddings(docs, "doc_id", "text", 64)
      .explain("formatted")
    spark.stop()
  }
}
