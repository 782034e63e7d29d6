package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.EventStream

/** Structured Streaming operators against their batch twins: tumbling
  * aggregation (oracled as q33), watermarked stream dedup, and
  * mapGroupsWithState per-key state. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("streaming dedup count equals batch distinct event count") {
    val streaming = EventStream.dedupCount(spark, d)
    val batch = Tables.events(spark, d).select($"event_id").distinct().count()
    assert(streaming === batch)
  }

  test("mapGroupsWithState final per-user counts equal batch group counts") {
    val stateful = EventStream.statefulUserCounts(spark, d)
      .select($"user_id", $"n_events").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, d).groupBy($"user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stateful === batch)
  }

  test("streaming tumbling agg matches the batch query row-for-row") {
    val streaming = EventStream.tumblingCounts(spark, d)
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.EventOps.q30EventsTumbling(spark, d)
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .collect().map(_.toSeq).toSet
    assert(streaming === batch)
  }

  test("GraftExtensions registers the native functions without error") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e) // builder-injection path; must not throw
  }
}
