package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class FreshnessSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("lag is exact seconds behind the global newest; staleness at the threshold") {
    val rows = Seq(
      ("a", ts(1000000)), ("a", ts(1000500)), // newest overall
      ("b", ts(1000500 - 90000)),             // 90000 s behind -> stale at 1d
      ("c", ts(1000500 - 86400)),             // exactly the threshold: NOT stale
      ("d", null.asInstanceOf[java.sql.Timestamp])) // null ts rows drop
    val out = Quality.freshness(rows.toDF("k", "t"), "k", "t", 86400L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("lag_sec"),
          r.getAs[Boolean]("is_stale")))).toMap
    assert(out("a") === ((2L, 0L, false)))
    assert(out("b") === ((1L, 90000L, true)))
    assert(out("c") === ((1L, 86400L, false))) // strict > threshold
    assert(!out.contains("d"))
  }

  test("sub-second lags floor toward zero seconds") {
    val rows = Seq(("a", new java.sql.Timestamp(1000L)), // 1.000 s
      ("b", new java.sql.Timestamp(250L)))               // 0.75 s behind
    val out = Quality.freshness(rows.toDF("k", "t"), "k", "t", 10L)
      .where(col("k") === "b").head()
    assert(out.getAs[Long]("lag_sec") === 0L)
  }
}
