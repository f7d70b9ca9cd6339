package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (builder prompt: "skewed keys → salting
  * or AQE skew-join"). AQE handles skewed SHUFFLE JOINS at runtime;
  * these helpers cover the two cases AQE does not: skewed aggregation
  * keys, and broadcast-side replication joins where one key dominates.
  */
object ScaleOps {

  /** Two-phase aggregation for skewed group keys: group on
    * (key, salt) first — spreading one hot key over `salts` reducers —
    * then combine partials per key. Works for algebraic aggregates
    * (sum/count/min/max; avg = sum+count combined at phase 2).
    *
    * Phase 1 shuffles (key, salt)-partials; phase 2 shuffles one row
    * per (key, salt) — negligible. The hot key's row stream is split
    * `salts` ways, so no single reducer sees it all.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int = 16): DataFrame = {
    val salted = df.groupBy(key.as("k"),
        pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).as("salt"))
      .agg(sum(value).as("s"), count(lit(1)).as("n"))
    salted.groupBy(col("k"))
      .agg(sum(col("s")).as("sum_value"), sum(col("n")).as("n_rows"))
  }

  /** Salted join for a skewed LEFT side against a small right side:
    * left rows get a random salt in [0, salts); the (broadcastable)
    * right side is replicated once per salt value, so the hot key's
    * rows land on `salts` different tasks instead of one.
    * Results are identical to `left.join(right, key)`.
    */
  def saltedBroadcastJoin(left: DataFrame, right: DataFrame,
                          key: String, salts: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLeft.join(broadcast(replicatedRight), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Key-frequency probe: top-n heaviest keys with their share — the
    * diagnostic that decides between AQE, salting, or key isolation.
    */
  def skewProfile(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 6))
      .orderBy(col("n").desc).limit(topN)
  }

  /** Persist a fact table bucketed + sorted by its join key: two
    * tables bucketed the same way join with NO exchange (the 100 TB
    * fix for fact-fact joins like orders⋈lineitem — SCALE.md). Uses
    * the session catalog; `path` keeps the data external.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
}
