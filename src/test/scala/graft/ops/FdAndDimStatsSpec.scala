package graft.ops

import graft.SparkSpec
import graft.ext.Similarity

class FdAndDimStatsSpec extends SparkSpec {
  import spark.implicits._

  test("FD check: key holds, reverse violates, null determinants excluded") {
    val df = Seq(
      (Some(1L), "a"), (Some(2L), "a"), (Some(3L), "b"), (None, "c")
    ).toDF("k", "v")
    val out = Quality.functionalDependencies(df,
      Seq(("k", "v"), ("v", "k"))).collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val kv = byPair(("k", "v"))
    assert(kv.getAs[Long]("n_groups") === 3L)        // null k dropped
    assert(kv.getAs[Long]("n_violating") === 0L)
    assert(kv.getAs[Boolean]("holds"))
    val vk = byPair(("v", "k"))
    assert(vk.getAs[Long]("n_groups") === 3L)
    assert(vk.getAs[Long]("n_violating") === 1L)     // 'a' -> {1, 2}
    assert(!vk.getAs[Boolean]("holds"))
  }

  test("embedding dim stats: exact mean/std/min/max per dimension") {
    val df = Seq(Seq(1.0, -1.0), Seq(3.0, -1.0)).toDF("embedding")
    val out = Similarity.embeddingDimStats(df, "embedding", 2)
      .collect().map(r => r.getAs[Long]("dim") -> r).toMap
    val d0 = out(0L)
    assert(d0.getAs[Long]("n") === 2L)
    assert(d0.getAs[Double]("mean") === 2.0)
    assert(d0.getAs[Double]("std") === 1.0)
    assert(d0.getAs[Double]("min_v") === 1.0 && d0.getAs[Double]("max_v") === 3.0)
    val d1 = out(1L)
    assert(d1.getAs[Double]("mean") === -1.0)
    assert(d1.getAs[Double]("std") === 0.0)          // dead dimension
  }

  test("dim stats is a single aggregate pass (one scan, no explode)") {
    val df = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("embedding")
    val plan = Similarity.embeddingDimStats(df, "embedding", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate [explode"), s"plan:\n$plan")
  }
}
