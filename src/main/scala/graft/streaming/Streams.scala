package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface — net-new relative to the reference (a
  * strictly monthly batch, SURVEY §2.9); preserves its semantics of
  * idempotent incremental windows and late-data tolerance via watermarks.
  *
  * The same transform functions run in batch mode (DataQueries.t10 is the
  * batch twin of [[hourlyRollup]]) — write once, run either way.
  */
object Streams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Event schema variant for sources written with TIMESTAMP(NANOS): the
    * reader surfaces ts as a nanos long (spark.sql.legacy.parquet
    * .nanosAsLong) and we convert back to a timestamp. */
  val eventSchemaNanos: StructType = StructType(
    eventSchema.map(f => if (f.name == "ts") f.copy(dataType = LongType) else f))

  /** File-source stream over a directory of event parquet files. The
    * default glob targets fixture layouts where `events.parquet` is a
    * single file among sibling tables; point `glob` at `*.parquet` for a
    * dedicated directory of part files. Set `nanosTs` when the files carry
    * TIMESTAMP(NANOS) (e.g. the driver fixtures). */
  def eventsStream(spark: SparkSession, dir: String,
                   glob: String = "events*.parquet",
                   nanosTs: Boolean = false): DataFrame = {
    val raw = spark.readStream
      .schema(if (nanosTs) eventSchemaNanos else eventSchema)
      .option("pathGlobFilter", glob)
      .parquet(dir)
    if (nanosTs) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** At-least-once ingest dedup: drop event_id replays while BOUNDING the
    * dedup state with the watermark — a replay arriving within the
    * watermark horizon is suppressed, and state for ids older than the
    * watermark is evicted (`dropDuplicatesWithinWatermark`), so state size
    * tracks the horizon instead of growing with the stream. Batch frames
    * take the plain exact dedup on the same key. */
  def dedupEvents(events: DataFrame,
                  watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Tumbling 1-hour rollup with a late-data watermark; in append mode a
    * window finalizes once the watermark passes window end. Works on both
    * streaming and batch frames. */
  def hourlyRollup(events: DataFrame,
                   watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Sliding-window per-user activity (10 min windows every 5 min). */
  def slidingUserActivity(events: DataFrame,
                          watermark: String = "30 minutes"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("user_id"),
        col("n_events"))
  }

  /** Session-window rollup — 30-min inactivity gap, native
    * `session_window` (dynamic gap windows merge as events arrive; batch
    * and streaming share the plan). Output bounds as epoch micros: exact
    * cross-engine values, no timestamp comparison pitfalls. */
  def sessionRollup(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))
  }

  /** One closed user session from the custom-state sessionizer. */
  case class UserSession(user_id: Long, session_start_us: Long,
                         session_end_us: Long, n_events: Long)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * KeyValueGroupedDataset state API for semantics `session_window` can't
    * express (per-session open state, explicit event-time timeouts).
    * Sessions close when a later event arrives past the gap, or when the
    * watermark passes last-event + gap (EventTimeTimeout); the open tail
    * session stays in state until then. Emits end = last + gap, matching
    * session_window bounds. */
  def sessionizeWithState(events: DataFrame, gapMs: Long = 30L * 60 * 1000,
                          watermark: String = "2 hours")
      : org.apache.spark.sql.Dataset[UserSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // open session state: (startMs, lastMs, n)
    def flush(uid: Long, st: (Long, Long, Long)): UserSession =
      UserSession(uid, st._1 * 1000L, (st._2 + gapMs) * 1000L, st._3)
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[(Long, Long, Long)]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap: the open session is final
            val out = state.getOption.map(flush(uid, _)).toList
            state.remove()
            out.iterator
          } else {
            // one microbatch's events for this user, oldest first; close a
            // session whenever the next event starts past the gap
            val ts = rows.map(_._2.getTime).toArray.sorted
            var closed = List.empty[UserSession]
            var st = state.getOption.getOrElse((ts.head, ts.head, 0L))
            ts.foreach { t =>
              st = if (t - st._2 >= gapMs) {
                closed ::= flush(uid, st); (t, t, 1L)
              } else (st._1, math.max(st._2, t), st._3 + 1)
            }
            state.update(st)
            state.setTimeoutTimestamp(st._2 + gapMs)
            closed.reverse.iterator
          }
      }
  }

  /** Run the hourly rollup as a one-shot (availableNow) stream into an
    * in-memory table; returns the populated result. Demonstrates the full
    * readStream -> agg -> writeStream path on bounded input. */
  def runHourlyOnce(spark: SparkSession, dir: String,
                    sinkName: String = "hourly_rollup",
                    glob: String = "events*.parquet",
                    nanosTs: Boolean = false): DataFrame = {
    val q = hourlyRollup(eventsStream(spark, dir, glob, nanosTs))
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName)
  }
}
