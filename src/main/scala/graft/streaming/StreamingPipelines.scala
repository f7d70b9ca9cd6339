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

  /** Streaming corpus ingest — the training-data firehose shape: the
    * quality gate and content fingerprint are the SAME codegen'd
    * column expressions the batch pipeline uses (one definition, both
    * engines), then content-dedup within the watermark horizon
    * (re-crawled/re-delivered documents collapse on fingerprint;
    * state is bounded by lateness, not corpus size), then tumbling
    * per-window document/token counts. Input schema: (doc_id LONG,
    * ts TIMESTAMP, text STRING).
    */
  def corpusIngest(docs: DataFrame, lateness: String = "30 minutes",
                   windowSize: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val gated = docs
      .filter(TextFunctions.passesQualityFilter(col("text")))
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
    // the watermark-bounded dedup is streaming-only (Spark refuses it
    // on batch frames), so a batch twin replays the same semantics.
    // The dedup key folds the WINDOW in alongside the fingerprint:
    // streaming keeps the first-ARRIVED copy and batch the min-ts copy,
    // so a bare-fp key diverges stream vs batch whenever an out-of-order
    // duplicate's copies fall in different windows (which copy survives
    // decides which window counts it). With (fp, window) as the key a
    // duplicate can only collapse within one window on both paths, and
    // the per-window counts are a pure function of the data, not of
    // arrival order. (Tradeoff, deliberate: a re-crawl landing in a
    // LATER window is counted again in that window.)
    // The key is the window START as a plain long — the window() struct
    // itself inherits ts's event-time metadata, and a stateful operator
    // refuses a plan with two event-time columns.
    val winKey = unix_timestamp(window(col("ts"), windowSize).getField("start"))
    val keyed =
      if (gated.isStreaming)
        gated.withWatermark("ts", lateness).withColumn("__wk", winKey)
      else gated.withColumn("__wk", winKey)
    val deduped =
      if (keyed.isStreaming)
        keyed.dropDuplicatesWithinWatermark("fp", "__wk")
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp"), col("__wk")).orderBy(col("ts").asc)
        keyed.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    deduped
      .groupBy(window(col("ts"), windowSize))
      // tokens counted over the TRIMMED text: the fingerprint equates
      // case/outer-whitespace variants, so the per-window sum must be
      // identical no matter WHICH variant survived the dedup ("a b "
      // raw-counts 3 tokens, "a b" counts 2 — streaming keeps the
      // first-arrived copy, batch the min-ts one, and a raw count
      // would diverge stream vs batch)
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(trim(col("text")))).as("n_tokens"))
      .select(unix_timestamp(col("window.start")).as("w_start"),
        col("n_docs"), col("n_tokens"))
  }

  /** Continuous distinct-value monitoring: HyperLogLog registers as a
    * plain streaming aggregation — `max(rho)` per (group, bucket) is
    * exactly the sketch's merge operator, so Spark's update-mode
    * state IS the running register table, bounded at 2^b rows per
    * group no matter how much data streams through. Feed the sink
    * table to [[graft.operators.CorpusStats.hllEstimate]] for the
    * current cardinality. StreamingSpec pins stream == batch
    * registers on staged batches.
    */
  def hllIngest(values: DataFrame, groupCols: Seq[String], valueCol: String,
                b: Int = 12): DataFrame =
    // the batch register builder is already a pure select + grouped
    // max — streaming-legal as-is, and delegating keeps ONE
    // definition of the (bucket, rho) derivation
    graft.operators.CorpusStats.hllRegisters(values, groupCols, valueCol, b)

  /** Continuous corpus ingest from a parquet document directory into
    * a parquet sink — the deployment shape of [[corpusIngest]]: each
    * micro-batch picks up newly landed document files, quality-gates
    * and content-dedups them within the watermark, and appends closed
    * per-window stats exactly once (checkpoint + file-sink manifest).
    */
  def corpusIngestToParquet(spark: SparkSession, inDir: String, schema: StructType,
                            outDir: String, checkpointDir: String,
                            lateness: String = "30 minutes",
                            window: String = "1 hour",
                            availableNow: Boolean = false,
                            statePartitions: Option[Int] = None): StreamingQuery = {
    // State partition count is a DEPLOYMENT-SIZING choice, pinned into
    // the checkpoint at first start: a streaming query's stateful
    // operators each open one state store per shuffle partition per
    // micro-batch, so a small ingest stream on a big-cluster default
    // (32+) pays dozens of store inits per batch for state that fits
    // in a few. Size it to the stream's key cardinality, not the
    // cluster's batch default (at 100 TB you'd raise it with load —
    // repartitioning state requires a new checkpoint either way).
    // The override lives in a CHILD session (own conf, shared
    // SparkContext) so the caller's session is never mutated and the
    // async micro-batch planner can't race a save/restore. newSession
    // starts from the initial SparkConf, NOT the caller's runtime
    // state — so the caller's session confs (session timezone, ANSI
    // mode, graft settings) are copied over first, or the stream
    // would silently run under different SQL semantics than the
    // session that started it. Static/core entries in getAll refuse
    // runtime set and are skipped (they are inherited via the shared
    // context anyway).
    val sess = statePartitions match {
      case Some(n) =>
        val s2 = spark.newSession()
        spark.conf.getAll.foreach { case (k, v) =>
          try s2.conf.set(k, v) catch { case _: Exception => () }
        }
        s2.conf.set("spark.sql.shuffle.partitions", n)
        s2
      case None => spark
    }
    val in = sess.readStream.schema(schema).parquet(inDir)
    val w = corpusIngest(in, lateness, window)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    // AvailableNow = the batch-drain deployment shape (and the q147
    // driver gate): process everything already landed — including the
    // no-data finalization batches that flush windows the last data
    // batch's watermark closed — then terminate.
    (if (availableNow)
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else w).start()
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
