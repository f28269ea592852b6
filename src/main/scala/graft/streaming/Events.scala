package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event-stream analytics over the `events` table shape
  * (event_id, ts, user_id, event_type, value): tumbling-window
  * aggregation and gap-based sessionization. Each operator has ONE
  * definition usable in both batch and streaming; the batch form is
  * DuckDB-oracle-checked (q_event_windows / q_sessionize) and the
  * streaming forms are asserted equal to their batch twins over the same
  * inputs (StreamingSpec). The reference has no stream processing
  * (SURVEY §2.8); these extend the engine for the training-data-pipeline
  * surface the builder prompt requires. */
object Events {

  /** Tumbling-window counts/sums per event type. On a streaming input
    * call `withWatermark` first (see [[streamingWindowedCounts]]); on a
    * batch input this is a plain two-key aggregation. Epoch-aligned
    * windows so a SQL oracle (`time_bucket`) reproduces the boundaries. */
  def windowedCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    aggWindows(project(events), width)

  /** Streaming form: event-time watermark bounds state; late rows beyond
    * the watermark are dropped, in-order feeds (as in the spec) match the
    * batch result exactly. The aggregation runs DIRECTLY on the
    * watermarked projection — re-projecting `cast(ts)` after
    * withWatermark builds a fresh attribute whose metadata (the
    * watermark tag) is dropped, silently unbounding state in update mode
    * and refusing to start in append mode (code-review r05); the
    * append-mode StreamingSpec test pins this. */
  def streamingWindowedCounts(stream: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    aggWindows(project(stream).withWatermark("ts", watermark), width)

  private def project(events: DataFrame): DataFrame =
    events.select(col("ts").cast("timestamp").as("ts"),
      col("event_type"), col("value"))

  private def aggWindows(src: DataFrame, width: String): DataFrame =
    src
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 5).as("total_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Gap-based sessionization (batch): a user's events split into
    * sessions wherever the gap to the previous event exceeds `gapMin`
    * minutes. Deterministic order (ts, event_id). One shuffle (window by
    * user); at web scale user_id is the natural partition key. */
  def sessionize(events: DataFrame, gapMin: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    events
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"), col("value"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("news",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > gapMin * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session", sum("news").over(wRun))
      .groupBy("user_id", "session")
      .agg(unix_micros(min("ts")).as("session_start_us"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 5).as("total_value"))
      .select(col("user_id"), col("session"), col("session_start_us"),
        col("n_events"), col("total_value"))
  }

  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Custom streaming state (KeyValueGroupedDataset.mapGroupsWithState):
    * running per-user totals across micro-batches — the arbitrary-state
    * API surface (§2.8/§2.9). Emits the updated total per user per
    * micro-batch (Update output mode). */
  def runningUserTotals(events: DataFrame): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) => {
          var (n, s) = state.getOption.getOrElse((0L, 0.0))
          it.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          UserTotal(uid, n, s)
        })
  }
}
