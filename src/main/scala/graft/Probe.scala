package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q28_embed_norm", "q33_ann_ivf", "q26_minhash_pairs", "q25_jaccard_pairs"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(s"$q run$i ${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
