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
