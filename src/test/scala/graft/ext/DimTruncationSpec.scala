package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DimTruncationSpec extends SparkSpec {
  import spark.implicits._

  test("zero tail beyond the kept dims gives perfect overlap") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.9, 0.1, 0.0)),
      (2L, Seq(0.5, 0.8, 0.0))
    ).toDF("id", "v")
    val r = Similarity.dimTruncationAudit(vecs, "id", "v",
      col("id") === 0, k = 2, dims = 2).collect().head
    assert(r.getAs[Long]("n_hits") === 2L)
    assert(r.getAs[Double]("overlap") === 1.0)
  }

  test("information in the dropped dims degrades overlap") {
    // full ranking: self, then 1 (cos .9939); truncated to 2 dims node 2
    // looks perfect (cos 1) and displaces node 1
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.9, 0.1, 0.0)),
      (2L, Seq(0.8, 0.0, 0.6))
    ).toDF("id", "v")
    val r = Similarity.dimTruncationAudit(vecs, "id", "v",
      col("id") === 0, k = 2, dims = 2).collect().head
    assert(r.getAs[Long]("n_hits") === 1L, s"row $r")
    assert(r.getAs[Double]("overlap") === 0.5)
    assert(r.getAs[Int]("dims") === 2)
  }
}
