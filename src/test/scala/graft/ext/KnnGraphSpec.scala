package graft.ext

import graft.SparkSpec

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated groups; centroids at the group axes
  private val vecs = Seq(
    (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.8, 0.2)),
    (10L, Seq(0.0, 1.0)), (11L, Seq(0.1, 0.9))
  ).toDF("id", "v")
  private val cents = IndexedSeq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0))

  test("edges stay within a cluster and rank by cosine desc") {
    val out = Similarity.knnGraph(vecs, "id", "v", cents, k = 2)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Int]("rn"),
        r.getAs[Long]("dst"), r.getAs[Double]("cos")))
    val groupA = Set(1L, 2L, 3L)
    assert(out.forall { case (s, _, d, _) =>
      groupA(s) == groupA(d) }, s"cross-cluster edge in ${out.toSeq}")
    // node 1's nearest neighbor is 2 (closer in angle than 3)
    val n1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(n1.map(_._3).toSeq === Seq(2L, 3L))
    assert(n1.head._4 > n1(1)._4)
    // the 2-node cluster yields exactly one neighbor each
    assert(out.count(_._1 == 10L) === 1 && out.count(_._1 == 11L) === 1)
  }

  test("k bounds the per-node degree") {
    val out = Similarity.knnGraph(vecs, "id", "v", cents, k = 1)
    val deg = out.groupBy("src").count().collect().map(_.getLong(1))
    assert(deg.forall(_ === 1L))
  }

  test("pair generation is an equi-join on the cluster id, never a cartesian") {
    val plan = Similarity.knnGraph(vecs, "id", "v", cents, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }
}
