package graft
import org.apache.spark.sql.SparkSession
object Probe35 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q35_dedup_pipeline")(spark, dir).count()
      spark.catalog.clearCache()
      println(s"q35 run$i rows=$n ${(System.nanoTime()-t0)/1e9}s")
    }
    spark.stop()
  }
}
