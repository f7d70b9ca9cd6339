package graft
import org.apache.spark.sql.SparkSession

/** Dev per-query timing probe: `Probe [sfDir] [q1 q2 …]` — repeats
  * each named query (default: the bench heavy tail) on a fresh cache.
  */
object Probe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (a.length > 1) a.drop(1).toSeq
             else Seq("q35_dedup_pipeline", "q26_minhash_pairs",
               "q25_jaccard_pairs", "q56_struct_evaluate")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warmup
    for (q <- qs; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      spark.catalog.clearCache()
      println(s"$q run$i rows=$n ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
