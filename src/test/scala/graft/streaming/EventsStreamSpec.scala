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

    // Complete mode explicitly: this test snapshots the FULL table from the
    // memory sink, which only Complete guarantees — the production default
    // (Update) re-emits changed windows per micro-batch, so a multi-trigger
    // run would append duplicate window rows and break the equality below.
    val q = EventsStream.stream(spark, tmp, spark.read.parquet(tmp).schema, "1 day",
        org.apache.spark.sql.streaming.OutputMode.Complete())
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

  test("sessionStats merges events within the gap and splits across it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(25), 3.0), // one session (gaps < 30)
      (1L, ts(70), 4.0),                                       // new session (45-min gap)
      (2L, ts(5), 5.0)).toDF("user_id", "ts", "value")
    val out = EventsStream.sessionStats(df, "30 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 3L && approx(out(0).getAs[Double]("sum_value"), 6.0))
    assert(out(1).getAs[Long]("n_events") == 1L)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("streamingDedup drops duplicate ids within the watermark") {
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, dir, "events")
    // duplicate the stream: same ids twice -> dedup must halve it
    val doubled = events.unionByName(events)
    val tmp = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    doubled.write.mode("overwrite").parquet(tmp)
    val src = spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp)
    val q = EventsStream.streamingDedup(src, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_stream").count() == events.count())
  }

  test("stateful sessionization runs in STREAMING mode: GroupState + event-time timeout") {
    val events = Tables.load(spark, dir, "events")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sess_stream").toString
    events.write.mode("overwrite").parquet(tmp)
    val src = spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp)
      .withWatermark("ts", "10 minutes")
    val q = EventsStream.sessionStatsStateful(src, 30)
      .writeStream.format("memory").queryName("sess_stateful")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_stateful").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = EventsStream.sessionStats(events, "30 minutes").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // the final watermark stops at max(ts) - delay, so sessions still open
    // at end-of-stream never time out and don't emit: streamed ⊆ batch,
    // and every emitted session matches the batch computation exactly.
    assert(streamed.nonEmpty, "no sessions emitted — timeout path never fired")
    streamed.foreach { case (k, (n, s)) =>
      assert(batch.contains(k), s"streamed session $k not in batch result")
      val (bn, bs) = batch(k)
      assert(n == bn && approx(s, bs, 1e-6), s"session $k: ($n,$s) vs ($bn,$bs)")
    }
  }

  test("stream-stream join equals the batch range join over the same events") {
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, dir, "events")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    events.write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    def src() = spark.readStream.schema(schema).parquet(tmp)
    val sClicks = src().where(col("event_type") === "click")
      .withWatermark("ts", "10 minutes")
    val sPurch = src().where(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
    val q = EventsStream.clickPurchaseJoin(sClicks, sPurch, 20)
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssj")
      .orderBy("click_id", "user_id", "purchase_value").collect().toSeq
    val batch = EventsStream.clickPurchaseJoin(
      events.where(col("event_type") === "click"),
      events.where(col("event_type") === "purchase"), 20)
      .orderBy("click_id", "user_id", "purchase_value").collect().toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("foreachBatch sink: per-microbatch parquet appends reassemble the input") {
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, dir, "events").select("event_id", "user_id", "value")
    val src = java.nio.file.Files.createTempDirectory("graft_fb_src").toString
    val out = java.nio.file.Files.createTempDirectory("graft_fb_out").toString
    events.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    // foreachBatch = the arbitrary-sink escape hatch: each micro-batch is a
    // normal DataFrame; appends keyed by batchId are idempotent on retry
    // when the target supports overwrite-by-batch (plain append here).
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(out)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val written = spark.read.parquet(out)
    assert(written.count() == events.count())
    assert(written.select("event_id").except(events.select("event_id")).isEmpty)
  }

  test("funnel counts are ordered-stage-qualified and non-increasing") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(9)), // full funnel
      (2L, "view", ts(0)), (2L, "click", ts(3)),                          // no purchase
      (3L, "click", ts(0)), (3L, "view", ts(5)),                          // click BEFORE view
      (4L, "purchase", ts(0))                                             // purchase only
    ).toDF("user_id", "event_type", "ts")
    val out = EventsStream.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).orderBy("stage").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L))
    // user 3's click precedes their first view -> not stage-2 qualified
  }

  test("perUserDaily aggregates per user and day") {
    val events = Tables.load(spark, dir, "events")
    val out = EventsStream.perUserDaily(events)
    assert(out.count() > 0)
    val total = out.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(total == events.count())
  }

  test("stream-static enrichment join equals the batch join") {
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, dir, "events")
    val dim = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_enrich").toString
    events.write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val q = EventsStream.enrichWithDim(
        spark.readStream.schema(schema).parquet(tmp), dim, "user_id", "c_custkey")
      .select("event_id", "c_mktsegment")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enriched").orderBy("event_id").collect().toSeq
    val batch = EventsStream.enrichWithDim(events, dim, "user_id", "c_custkey")
      .select("event_id", "c_mktsegment").orderBy("event_id").collect().toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("watermark drops events later than the delay (append-mode window agg)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = mem.toDF.toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes")).agg(sum(col("v")).as("s"))
    val q = agg.writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    mem.addData((t(0), 1L), (t(5), 2L))
    q.processAllAvailable()
    mem.addData((t(40), 10L)) // watermark -> 10:30, closes [10:00, 10:10)
    q.processAllAvailable()
    mem.addData((t(1), 100L)) // later than the watermark: must be dropped
    q.processAllAvailable()
    q.stop()
    val sums = spark.table("late_drop").select("s").collect().map(_.getLong(0)).toSet
    assert(sums.contains(3L), s"expected the closed window sum 3 in $sums")
    assert(!sums.contains(103L) && !sums.contains(100L),
      s"late event leaked into $sums")
  }

  test("upsertSink maintains a last-write-wins snapshot across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val updates = mem.toDF.toDF("k", "v", "seq")
    @volatile var last: Option[Array[(Long, String)]] = None
    val q = EventsStream.upsertSink(updates, Seq("k"), "seq") { snap =>
      last = Some(snap.select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1))
    }
    mem.addData((1L, "a", 1L), (2L, "b", 1L))
    q.processAllAvailable()
    assert(last.get.toSeq == Seq((1L, "a"), (2L, "b")))
    // batch 2: key 1 updated (two in-batch writes -> seq 3 wins), key 3 new
    mem.addData((1L, "stale", 2L), (1L, "c", 3L), (3L, "d", 1L))
    q.processAllAvailable()
    q.stop()
    assert(last.get.toSeq == Seq((1L, "c"), (2L, "b"), (3L, "d")))
  }

  test("upsertSink re-seeds from `initial` after a restart (documented recovery path)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // phase 1: accumulate a snapshot, persist it like a real sink would
    val mem1 = MemoryStream[(Long, String, Long)]
    @volatile var saved: Option[Array[(Long, String, Long)]] = None
    val q1 = EventsStream.upsertSink(mem1.toDF.toDF("k", "v", "seq"), Seq("k"), "seq") { s =>
      saved = Some(s.select("k", "v", "seq").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))))
    }
    mem1.addData((1L, "a", 1L), (2L, "b", 1L))
    q1.processAllAvailable(); q1.stop()
    // phase 2: "restart" — a fresh query seeded with the persisted snapshot
    val seed = saved.get.toSeq.toDF("k", "v", "seq")
    val mem2 = MemoryStream[(Long, String, Long)]
    @volatile var last: Option[Seq[(Long, String)]] = None
    val q2 = EventsStream.upsertSink(mem2.toDF.toDF("k", "v", "seq"), Seq("k"), "seq",
      initial = Some(seed)) { s =>
      last = Some(s.select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq)
    }
    mem2.addData((2L, "updated", 2L), (3L, "c", 1L))
    q2.processAllAvailable(); q2.stop()
    // pre-restart key 1 survives; key 2 updated; key 3 new
    assert(last.get == Seq((1L, "a"), (2L, "updated"), (3L, "c")))
  }

  test("upsertSink tie-breaks equal orderCol values deterministically via tieBreakCols") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    @volatile var last: Option[Seq[(Long, String)]] = None
    val q = EventsStream.upsertSink(mem.toDF.toDF("k", "v", "seq"), Seq("k"),
      "seq", tieBreakCols = Seq("v")) { s =>
      last = Some(s.select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq)
    }
    // same key, SAME seq: tie broken on v desc -> "z" wins regardless of
    // arrival order within the batch
    mem.addData((1L, "a", 5L), (1L, "z", 5L), (1L, "m", 5L))
    q.processAllAvailable(); q.stop()
    assert(last.get == Seq((1L, "z")))
  }

  test("windowedDistinctUsers: batch equals stream (dedup-then-count pattern)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    // user 1 twice in window A (must count once), users 1+2 in window B
    val rows = Seq((t(0), 1L), (t(3), 1L), (t(6), 2L),
      (t(12), 1L), (t(14), 2L), (t(17), 2L))
    val batchDf = rows.toDF("ts", "user_id")
    val batch = EventsStream.windowedDistinctUsers(batchDf, "10 minutes")
      .orderBy("window_start").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val q = EventsStream.windowedDistinctUsers(
        mem.toDF.toDF("ts", "user_id").withWatermark("ts", "10 minutes"),
        "10 minutes")
      .writeStream.format("memory").queryName("wdu").outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("wdu").orderBy("window_start")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batch.nonEmpty && streamed == batch,
      s"batch $batch != stream $streamed")
    assert(batch.map(_._2) == Seq(2L, 2L)) // 2 distinct users per window
  }
  test("stationaryDistribution recovers the analytic steady state of a 2-state chain") {
    // a->b always; b->a 1/3, b->b 2/3  =>  stationary (1/4, 3/4)
    val seq = Seq("a", "b", "b", "b", "a", "b", "b", "b", "a")
    val t0 = java.sql.Timestamp.valueOf("2026-01-05 10:00:00")
    import spark.implicits._
    val rows = seq.zipWithIndex.map { case (t, i) =>
      (1L, new java.sql.Timestamp(t0.getTime + i * 60000L), t, i.toLong)
    }
    val df = rows.toDF("user_id", "ts", "event_type", "event_id")
    val out = EventsStream.stationaryDistribution(df, "user_id", "ts",
        "event_type", Seq("event_id"), iters = 60)
      .orderBy("event_type").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(approx(out(0).getDouble(1), 0.25, 1e-4), s"pi_a = ${out(0).getDouble(1)}")
    assert(approx(out(1).getDouble(1), 0.75, 1e-4))
  }

}
