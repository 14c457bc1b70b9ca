package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RunningAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:${min / 60}%02d:${min % 60}%02d")

  // two users: steady value 10.00 with one wild spike late in each
  // history (after minPrior events of history the spike must flag)
  private def fixture: Seq[(Long, java.sql.Timestamp, Long, Double)] = {
    def user(uid: Long, base: Double, spikeAt: Int) =
      (0 until 30).map { i =>
        val v = if (i == spikeAt) base * 40
          else base + (i % 3) * 0.01 // tiny jitter so sigma > 0
        (uid, ts(i), uid * 100 + i, v)
      }
    user(1L, 10.0, 25) ++ user(2L, 5.0, 28)
  }

  private def df = fixture.toDF("user_id", "ts", "event_id", "value")

  test("batch window tier flags exactly the injected spikes") {
    val out = EventsStream.runningAnomaly(df, minPrior = 10, kSigma = 3.0)
      .collect()
    assert(out.map(r => r.getLong(1)).toSet === Set(125L, 228L),
      s"flagged ${out.toSeq}")
    assert(out.forall(_.getAs[Double]("z") > 3.0))
  }

  test("stateful batch mode equals the window tier exactly") {
    val win = EventsStream.runningAnomaly(df, 10, 3.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    val st = EventsStream.runningAnomalyStateful(df, 10, 3.0)
      .collect().map(a => (a.user_id, a.event_id, a.value, a.z)).toSet
    assert(st === win)
  }

  test("streaming across micro-batches carries state and matches batch exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val src = mem.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = EventsStream.runningAnomalyStateful(src, 10, 3.0)
      .writeStream.format("memory").queryName("run_anom")
      .outputMode("append").start()
    // three micro-batches in event order: state must survive the cuts
    val rows = fixture.sortBy(_._2.getTime)
    mem.addData(rows.take(20)); q.processAllAvailable()
    mem.addData(rows.slice(20, 40)); q.processAllAvailable()
    mem.addData(rows.drop(40)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("run_anom").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val batch = EventsStream.runningAnomaly(df, 10, 3.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(streamed === batch, s"stream $streamed vs batch $batch")
  }

  test("no flags without enough prior history") {
    val shortDf = fixture.filter(_._4 < 100).take(8)
      .toDF("user_id", "ts", "event_id", "value")
    assert(EventsStream.runningAnomaly(shortDf, 10, 3.0).count() === 0L)
  }
}
