package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables

/** Structured Streaming surface of the engine (SURVEY.md §7 extension —
  * the reference is batch-only, so this is the scale-native upgrade of
  * its scheduled-rerun model): the same tumbling-window aggregation as
  * [[graft.operators.EventOps.q30EventsTumbling]], expressed as
  * `readStream → watermark → windowed agg → memory sink`.
  *
  * Scale notes: event-time windows + watermark bound state size; the
  * aggregation state lives in the state store keyed by
  * (window, event_type) — at 1000 executors this partitions by the
  * group key exactly like the batch shuffle. `availableNow` trigger
  * drains the backlog and stops, which is also how the batch-parity
  * test works locally.
  */
object EventStream {

  /** Run the streaming tumbling aggregation over the parquet events dir
    * until all available data is processed, then return the result as a
    * batch DataFrame (from the in-memory sink). Output matches
    * `EventOps.q30EventsTumbling` row-for-row. */
  def tumblingCounts(spark: SparkSession, sfDir: String): DataFrame = {
    // the raw file stores ts as INT64 nanos (see Tables.events); stream
    // it as long and convert to a micros timestamp in the plan
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.types._
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val name = "evt_" + UUID.randomUUID().toString.replace("-", "")
    val stream = spark.readStream
      .schema(rawSchema)
      // the file-stream source wants a directory: stream the sf dir,
      // glob-filtered to the events table file
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(floor($"ts" / 1000L).cast("long")))
      .withWatermark("ts", "1 hour")
      .groupBy(
        window($"ts", "1 hour").as("win"),
        $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        (sum(floor($"value" * 100.0 + 0.5)) / 100.0).as("sum_value"),
        approx_count_distinct($"user_id").as("approx_users"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(
        date_format($"win.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
        $"event_type", $"n_events", $"sum_value", $"approx_users")
      .orderBy($"window_start", $"event_type")
  }

  private implicit class Interp(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
}
