package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** File-source streaming pipelines: `readStream` over a growing
  * parquet directory → EventOps transforms → `writeStream` parquet
  * sink with checkpointing. This is the deployment shape for the
  * events firehose at scale (each micro-batch discovers newly landed
  * files; state bounded by the watermark; exactly-once via the
  * checkpoint + file-sink manifest).
  */
object StreamingPipelines {

  /** Continuous tumbling aggregation from a parquet directory into a
    * parquet sink. `schema` is required — streaming sources do not
    * infer. Returns the running query (caller stops it).
    */
  def tumblingToParquet(spark: SparkSession, inDir: String, schema: StructType,
                        outDir: String, checkpointDir: String,
                        size: String = "1 hour",
                        lateness: String = "30 minutes"): StreamingQuery = {
    val in = spark.readStream.schema(schema).parquet(inDir)
    EventOps.streamTumblingAgg(in, size, lateness)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }

  /** Continuous per-user sessionization into a parquet sink. */
  def sessionsToParquet(spark: SparkSession, inDir: String, schema: StructType,
                        outDir: String, checkpointDir: String,
                        gap: String = "30 minutes",
                        lateness: String = "30 minutes"): StreamingQuery = {
    val in = spark.readStream.schema(schema).parquet(inDir)
    EventOps.streamSessionAgg(in, gap, lateness)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }
}
