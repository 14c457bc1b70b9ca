package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  // two tight blobs around (0,0) and (10,10)
  private val pts = ((1 to 10).map(i => (i.toLong, Seq(0.0 + i * 0.01, 0.0))) ++
    (11 to 20).map(i => (i.toLong, Seq(10.0, 10.0 + i * 0.01))))
    .toDF("vec_id", "e")
  private val cents = Seq((0L, Seq(0.05, 0.0)), (1L, Seq(10.0, 10.15)))

  test("clusterSilhouette: well-separated blobs score near 1") {
    val r = Similarity.clusterSilhouette(pts, "vec_id", "e", cents).collect()
    assert(r.length === 2)
    assert(r.map(_.getAs[Long]("n")).sum === 20L)
    assert(r.forall(_.getAs[Double]("mean_sil") > 0.95),
      s"expected near-1 silhouettes: ${r.mkString(", ")}")
  }

  test("clusterSilhouette: a point on its centroid scores exactly b/b = 1") {
    val one = Seq((1L, Seq(0.05, 0.0))).toDF("vec_id", "e")
    val r = Similarity.clusterSilhouette(one, "vec_id", "e", cents).head()
    assert(r.getAs[Long]("cluster_id") === 0L)
    assert(r.getAs[Double]("mean_sil") === 1.0)
  }

  test("clusterSilhouette: points midway between centroids score ~0") {
    val mid = Seq((1L, Seq(5.025, 5.075))).toDF("vec_id", "e")
    val r = Similarity.clusterSilhouette(mid, "vec_id", "e", cents).head()
    assert(math.abs(r.getAs[Double]("mean_sil")) < 0.01)
  }

  test("clusterSilhouette is partitioning-invariant") {
    val a = Similarity.clusterSilhouette(pts.repartition(1), "vec_id", "e",
      cents).collect().toSeq
    val b = Similarity.clusterSilhouette(pts.repartition(7), "vec_id", "e",
      cents).collect().toSeq
    assert(a === b)
  }
}
