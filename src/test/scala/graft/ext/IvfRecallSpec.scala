package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfRecallSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    // 3 well-separated blobs on coordinate axes + per-id jitter
    (0 until 90).map { i =>
      val axis = i % 3
      val base = Array(0.0, 0.0, 0.0); base(axis) = 10.0
      base((axis + 1) % 3) = (i % 7) * 0.1
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "e")
  }

  private def cents =
    Seq((0L, Seq(10.0, 0.0, 0.0)), (1L, Seq(0.0, 10.0, 0.0)),
      (2L, Seq(0.0, 0.0, 10.0)))

  test("ivfRecallAudit reaches recall 1.0 when every centroid is probed") {
    val out = Similarity.ivfRecallAudit(vecs, "vec_id", "e", cents,
      col("vec_id") < 5, k = 10, nProbe = 3).collect()
    assert(out.length === 5)
    assert(out.forall(_.getDouble(2) === 1.0))
    assert(out.forall(_.getLong(1) === 10L))
  }

  test("ivfRecallAudit with one probe misses cross-cluster neighbors") {
    // k=30 exceeds any single blob's 30 members only via other clusters,
    // so nProbe=1 recall is capped at 30/30 ... use k=40 > blob size 30
    val out = Similarity.ivfRecallAudit(vecs, "vec_id", "e", cents,
      col("vec_id") === 0, k = 40, nProbe = 1).collect().head
    assert(out.getLong(1) <= 30L) // at most one blob's worth of hits
    assert(out.getDouble(2) < 1.0)
  }

  test("ivfRecallAudit validates arguments") {
    intercept[IllegalArgumentException] {
      Similarity.ivfRecallAudit(vecs, "vec_id", "e", Nil,
        col("vec_id") === 0, 10, 1)
    }
  }
}
