package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinSizeSketchSpec extends SparkSpec {
  import spark.implicits._

  // skewed key multiset: key 1 hot on both sides -> join size dominated
  // by the hot cell (strong F2 signal, so the estimator concentrates)
  private val left = ((1 to 60).map(_ => 1L) ++ (2L to 21L)).toDF("k")
  private val right = ((1 to 40).map(_ => 1L) ++ (10L to 29L)).toDF("k")
  private val exactSize = 60L * 40L + 12L // keys 10..21 shared once each

  test("estimate carries the exact size and lands within the AGMS envelope") {
    val out = Joins.joinSizeEstimate(left, right, "k", "k", sketches = 64)
      .collect().head
    assert(out.getAs[Long]("exact_join_size") === exactSize)
    val est = out.getAs[Double]("est_join_size")
    // median-of-means over 8 groups: generous 3x envelope on a fixture
    // whose join size is dominated by one cell
    assert(est > exactSize / 3.0 && est < exactSize * 3.0,
      s"estimate $est vs exact $exactSize")
    assert(out.getAs[Int]("sketches") === 64)
  }

  test("sketches are mergeable: sum of shard sketches equals the whole-table sketch") {
    val shard1 = left.where(col("k") <= 10L)
    val shard2 = left.where(col("k") > 10L)
    val whole = Joins.joinSizeSketch(left, "k", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Joins.joinSizeSketch(shard1, "k", 16)
      .unionByName(Joins.joinSizeSketch(shard2, "k", 16))
      .groupBy("i").agg(sum("s").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === whole)
  }

  test("estimate is invariant to input partitioning") {
    val a = Joins.joinSizeEstimate(left.repartition(7), right.coalesce(1),
      "k", "k", 64).collect().head.getAs[Double]("est_join_size")
    val b = Joins.joinSizeEstimate(left.coalesce(1), right.repartition(5),
      "k", "k", 64).collect().head.getAs[Double]("est_join_size")
    assert(a === b)
  }
}
