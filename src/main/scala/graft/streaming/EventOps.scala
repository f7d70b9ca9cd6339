package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table (ts, user_id,
  * event_type, value, props).
  *
  * The reference has no streaming surface at all (SURVEY.md §2.10 —
  * its `iter_rows`/batch evaluation is chunked batch I/O), so this
  * module is greenfield Structured-Streaming-first design: every
  * transform is written against an unbounded DataFrame and works
  * identically on a bounded one. Batch queries (driver-verified vs
  * DuckDB) and streaming pipelines (spec-verified vs their own batch
  * run) share these definitions, which is the property that matters
  * at 100 TB: one logical plan, micro-batch or batch execution both
  * pick partial+final hash aggregation keyed on (window, group) — the
  * shuffle key includes the time bucket, so state is evenly spread
  * and watermarking bounds it.
  */
object EventOps {

  /** Window start as epoch seconds (long) — comparison-stable surface
    * for results (raw timestamps are never returned; see
    * queries/Relational.scala conventions).
    */
  private def startSeconds(w: Column): Column =
    unix_timestamp(w.getField("start")).as("bucket_s")

  /** Tumbling event-time window aggregate per event_type:
    * count + sum(value). One shuffle on (window, event_type).
    */
  def tumblingAgg(events: DataFrame, size: String): DataFrame =
    events.groupBy(window(col("ts"), size), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(startSeconds(col("window")), col("event_type"), col("n"), col("sum_value"))

  /** Sliding event-time window (size, slide) global counts. Each event
    * lands in size/slide windows — map-side fan-out, single shuffle.
    */
  def slidingAgg(events: DataFrame, size: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), size, slide))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
      .select(startSeconds(col("window")), col("n"), col("avg_value"))

  /** Per-user session windows with an inactivity gap: a session ends
    * when the next event is ≥ gap after the previous one. State per
    * (user, session) only — bounded by the watermark under streaming.
    */
  def sessionAgg(events: DataFrame, gap: String): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window").getField("start")).as("session_start_s"),
        col("n_events"), col("sum_value"))

  /** JSON props extraction (schema-on-read over the opaque props
    * string): pulls `$.k` as int. Codegen'd path (`get_json_object`).
    */
  def propsKey(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))

  /** Top event value per user per day (event-time grouped argmax).
    * The argmax key folds in event_id so equal values break ties
    * deterministically (cross-engine reproducible).
    *
    * Key domain: the value quantum rides the high bits (×2⁴⁰), so the
    * composite stays collision-free while `event_id < 2⁴⁰` (~1.1e12)
    * and `round(value·100) < 2²²` (value ≤ ~42k) — a narrower
    * multiplier would let a large event_id cross into the next value
    * quantum and return the type of a LOWER-valued event.
    */
  def dailyUserArgmax(events: DataFrame): DataFrame = {
    val key = round(col("value") * 100).cast("long") * lit(1099511627776L) +
      col("event_id")
    events.groupBy(window(col("ts"), "1 day"), col("user_id"))
      .agg(max_by(col("event_type"), key).as("top_type"),
        round(max(col("value")), 2).as("top_value"))
      .select(startSeconds(col("window")), col("user_id"), col("top_type"), col("top_value"))
  }

  // ---- Streaming entry points (unbounded input) --------------------

  /** Streaming tumbling aggregate with a watermark: late events beyond
    * `lateness` are dropped and window state is evicted — state size
    * is O(active windows × event types), not O(stream).
    */
  def streamTumblingAgg(stream: DataFrame, size: String, lateness: String): DataFrame =
    tumblingAgg(stream.withWatermark("ts", lateness), size)

  /** Streaming per-user sessionization with watermark-bounded state.
    * Delegates to the DuckDB-verified batch definition — one logical
    * plan for both executions (the module contract), so the batch and
    * streaming aggregates can never silently diverge.
    */
  def streamSessionAgg(stream: DataFrame, gap: String, lateness: String): DataFrame =
    sessionAgg(stream.withWatermark("ts", lateness), gap)

  /** AS-OF join — the time-series operator Spark lacks natively: each
    * left row matches the LATEST right row with right.ts ≤ left.ts per
    * key (rates, snapshots, most-recent-state lookups).
    *
    * Formulation: union-marker + running `last(ignoreNulls)` window —
    * ONE shuffle on the key, never a range join (Spark plans theta
    * joins as broadcast-nested-loop: O(|L|·|R|) at scale). Right rows
    * sort BEFORE left rows at equal timestamps, so the match is
    * inclusive. Unmatched left rows carry nulls (left-asof); filter
    * them for inner-asof semantics.
    *
    * `valueCols` are the right-side columns to attach, surfaced as
    * `<name>` on the output.
    *
    * The right side should be unique per (key, ts) — with duplicates
    * the window picks whichever sorts last among the equal
    * timestamps, which is not a defined order; pre-aggregate
    * duplicates (as q45 does) for determinism.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valueCols: Seq[String]): DataFrame = {
    // the attached columns ride ONE non-null struct marker per right
    // row (left rows carry a null struct): `last(ignoreNulls)` then
    // skips exactly the left placeholders — a genuine NULL inside a
    // matched right row attaches as NULL, instead of being skipped
    // over to a STALE older value (per-column ignoreNulls could not
    // tell "left placeholder" from "matched row whose value is null")
    val rAligned = right.select(
      (keys.map(col) :+ col(tsCol)) :+
        struct(valueCols.map(col): _*).as("__r"): _*)
      .withColumn("__is_r", lit(1))
    val lAligned = left.withColumn("__is_r", lit(0))
    val u = lAligned.unionByName(rAligned, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    valueCols.foldLeft(matched) { (d, c) =>
      d.withColumn(c, col("__m").getField(c))
    }.filter(col("__is_r") === 0)
      .drop("__is_r", "__r", "__m")
  }

  /** Interval (range-containment) join: left point rows matched to
    * right rows whose [start, end) contains the left timestamp, per
    * key. Spark would plan the raw theta join as a broadcast nested
    * loop — O(|L|·|R|) per key; here both sides BIN to fixed-width
    * time buckets (each interval explodes into the buckets it covers,
    * bounded by interval/bucket ratio), meet in an ordinary equi-join
    * on (key, bucket) — one shuffle, AQE-skew-splittable — and the
    * exact containment predicate trims the boundary bucket. An
    * interval covers a left row's bucket exactly once, so no dedup
    * pass is needed.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, startCol: String, endCol: String,
                   bucketSeconds: Long = 3600L): DataFrame = {
    // buckets computed from MICROSECONDS: `unix_timestamp` truncates
    // sub-second precision, so an interval ending at hh:00:00.5 would
    // miss its boundary bucket and silently drop matching rows there.
    // The last covered bucket is the one holding end − 1µs ([start,
    // end) is half-open). Empty/inverted intervals (end ≤ start) match
    // nothing by the exact predicate, so they are filtered before the
    // explode (a descending sequence() would throw).
    val bucketMicros = bucketSeconds * 1000000L
    val l = left.withColumn("__bkt",
      floor(unix_micros(col(tsCol)) / bucketMicros))
    val r = right.filter(col(startCol) < col(endCol))
      .withColumn("__bkt", explode(sequence(
        floor(unix_micros(col(startCol)) / bucketMicros),
        floor((unix_micros(col(endCol)) - lit(1)) / bucketMicros))))
    l.join(r, keys :+ "__bkt")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bkt")
  }

  /** Streaming deduplication — the ingest-side guard every
    * training-data feed needs (at-least-once sources redeliver):
    * exactly one row per `idCols` tuple survives, with state bounded
    * by the watermark (`dropDuplicatesWithinWatermark`): an id only
    * needs remembering until no late duplicate can still arrive.
    * Unbounded `dropDuplicates` state would grow with the stream; this
    * is O(ids within the lateness horizon).
    */
  def streamDedup(stream: DataFrame, lateness: String,
                  idCols: Seq[String] = Seq("event_id")): DataFrame =
    stream.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(idCols)

  /** Watermarked stream-stream interval join: events stream joined to
    * a stream of (key, w_start, w_end) windows. Here the raw
    * time-range condition IS the right form — Structured Streaming
    * uses it to bound both sides' state to the watermark horizon
    * (unlike the batch [[intervalJoin]], where bucketing avoids a
    * nested-loop plan; streaming state is keyed, so the range
    * condition prunes state instead).
    *
    * `maxWindow` declares the longest window the stream can carry
    * (w_end − w_start ≤ maxWindow) and is REQUIRED for state to be
    * bounded on BOTH sides: `e.ts ≥ w.w_start` alone stays
    * satisfiable by arbitrarily late events forever (w_end is not a
    * watermarked column), so without the derived upper bound
    * `e.ts ≤ w.w_start + maxWindow` the windows-side state would
    * grow with the stream until OOM. The bound never changes results
    * while the declaration holds — any joined row already has
    * e.ts < w.w_end ≤ w.w_start + maxWindow.
    */
  def streamIntervalJoin(events: DataFrame, windows: DataFrame,
                         lateness: String, maxWindow: String): DataFrame = {
    val e = events.withWatermark("ts", lateness).as("e")
    val w = windows.withWatermark("w_start", lateness).as("w")
    e.join(w, expr(
      s"""e.user_id = w.user_id AND
         e.ts >= w.w_start AND e.ts < w.w_end AND
         e.ts <= w.w_start + INTERVAL $maxWindow"""))
      .select(col("e.event_id"), col("e.user_id"),
        unix_timestamp(col("w.w_start")).as("w_start_s"))
  }

  /** Arbitrary stateful processing (`mapGroupsWithState` — the custom-
    * state escape hatch the windowed aggregates can't express):
    * running per-user totals that persist across micro-batches. Each
    * batch updates the user's state with its new events and emits the
    * current totals (Update output mode). State is one small struct
    * per user — O(users), partitioned by the group key.
    */
  def statefulUserTotals(stream: DataFrame): Dataset[UserTotals] = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val pairEnc: Encoder[(Long, Double)] = Encoders.product[(Long, Double)]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[UserTotals] = Encoders.product[UserTotals]
    stream.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val prior = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserTotals(uid, prior.n_events + batch.size,
            prior.sum_value + batch.map(_._2).sum)
          state.update(next)
          next
      }
  }
}

/** Running totals state/output record for [[EventOps.statefulUserTotals]]. */
case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)
