package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "spark spark spark join filter"),
    (2L, "join filter window window window window"),
    (3L, "spark merge")).toDF("doc_id", "text")

  test("cms cells: total mass per row equals the token count") {
    val cells = Sketches.countMinCells(df, "text", depth = 4, width = 16)
      .collect()
    val perRow = cells.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perRow.toMap == Map(0L -> 13L, 1L -> 13L, 2L -> 13L, 3L -> 13L))
  }

  test("cms cells stream with bounded state and equal the batch sketch") {
    // the sketch is a plain (r, bucket) aggregation, so it runs as a
    // streaming query with state bounded by depth x width regardless of
    // vocabulary — the streaming heavy-hitter substrate
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val cells = Sketches.countMinCells(
      mem.toDF.toDF("doc_id", "text"), "text", depth = 4, width = 16)
    val q = cells.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    mem.addData((1L, "spark spark spark join filter"),
      (2L, "join filter window window window window"))
    q.processAllAvailable()
    mem.addData((3L, "spark merge"))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cms_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Sketches.countMinCells(df, "text", depth = 4, width = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("hll registers merge by max: sketch(A ∪ B) = max(sketch(A), sketch(B))") {
    val a = Seq((1L, "spark join filter window"), (2L, "merge sort scan")).toDF("doc_id", "text")
    val b = Seq((3L, "spark window shuffle exchange broadcast")).toDF("doc_id", "text")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "text").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = (regs(a).toSeq ++ regs(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(regs(a.union(b)) == merged)
  }

  test("hll estimate lands within the published error regime on real vocabulary") {
    // m=64 -> theoretical relative std error 1.04/sqrt(64) = 13%; allow 3 sigma
    val docs = (0 until 400).map(i => (i.toLong,
      s"word${i} word${i * 7 % 997} common the and token${i % 31}")).toDF("doc_id", "text")
    val row = Sketches.hllEstimate(docs, "text").head()
    val (n, est, rel) = (row.getLong(1), row.getDouble(2), row.getDouble(3))
    assert(n > 400, s"fixture should have a real vocabulary, got $n")
    assert(rel < 0.40, s"estimate $est vs exact $n: rel error $rel exceeds 3 sigma")
  }

  test("hll registers stream (complete mode) and equal the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq((1L, "spark join filter"), (2L, "window merge spark"))
    val mem = MemoryStream[(Long, String)]
    val q = Sketches.hllRegisters(mem.toDF.toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    mem.addData(rows.head); q.processAllAvailable()
    mem.addData(rows(1)); q.processAllAvailable(); q.stop()
    val streamed = spark.table("hll_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Sketches.hllRegisters(rows.toDF("doc_id", "text"), "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("cms estimates: one-sided error — never below the exact count") {
    // width 4 forces collisions so the overcount column is exercised
    val est = Sketches.countMinEstimates(df, "text", depth = 4, width = 4)
      .collect()
    assert(est.length == 5) // spark join filter window merge
    for (r <- est) {
      assert(r.getLong(2) >= r.getLong(1), s"estimate below exact: $r")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // with a wide sketch the estimates are exact for this tiny corpus
    val wide = Sketches.countMinEstimates(df, "text", depth = 4, width = 1024)
      .collect()
    assert(wide.forall(r => r.getLong(3) == 0L))
  }
}
