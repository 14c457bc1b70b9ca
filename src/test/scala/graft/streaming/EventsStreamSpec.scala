package graft.streaming

import graft.{SparkSpec, Tables}

/** Structured Streaming parity: the streaming flavor of the windowed event
  * aggregation must produce the same result as the batch flavor over the
  * same files (the shared-transform contract in EventsStream).
  */
class EventsStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming windowed stats over the events file equal the batch result") {
    val events = Tables.load(spark, dir, "events")
    val schema = events.schema

    // stream from a copy of the parquet as a file source with the same schema
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    events.write.mode("overwrite").parquet(tmp)

    val q = EventsStream.stream(spark, tmp, spark.read.parquet(tmp).schema, "1 day")
      .format("memory").queryName("win_stats").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_stats")
      .orderBy("window_start", "event_type").collect()
    val batch = EventsStream.windowedStats(events, "1 day")
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
  }

  test("perUserDaily aggregates per user and day") {
    val events = Tables.load(spark, dir, "events")
    val out = EventsStream.perUserDaily(events)
    assert(out.count() > 0)
    val total = out.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(total == events.count())
  }
}
