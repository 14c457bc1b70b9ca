package graft.ops

import graft.SparkSpec

class BlockingAuditSpec extends SparkSpec {
  import spark.implicits._

  // 4 left, 4 right; blocks: A={1,2 | 10,20}, B={3 | 30}, right 40 in C
  private val cand = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
    (3L, 30L)).toDF("lid", "rid")
  private val truth = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
    .toDF("lid", "rid")
  private val left = Seq(1L, 2L, 3L, 4L).toDF("lid")
  private val right = Seq(10L, 20L, 30L, 40L).toDF("rid")

  test("reduction ratio and pairs completeness are exact") {
    val r = Harmonize.blockingAudit(cand, truth, left, right).collect().head
    assert(r.getAs[Long]("n_cand") === 5L)
    assert(r.getAs[Long]("n_true") === 4L)
    assert(r.getAs[Long]("n_found") === 3L)      // (4,40) never co-blocks
    assert(r.getAs[Double]("reduction_ratio") === 1.0 - 5.0 / 16.0)
    assert(r.getAs[Double]("pairs_completeness") === 0.75)
  }

  test("duplicate candidate pairs count once") {
    val dup = cand.union(cand)
    val r = Harmonize.blockingAudit(dup, truth, left, right).collect().head
    assert(r.getAs[Long]("n_cand") === 5L)
  }

  test("empty truth yields null completeness, not a division error") {
    val r = Harmonize.blockingAudit(cand, truth.limit(0), left, right)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("pairs_completeness")))
  }
}
