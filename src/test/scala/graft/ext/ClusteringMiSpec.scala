package graft.ext

import graft.SparkSpec
import graft.ops.Eda

class ClusteringMiSpec extends SparkSpec {
  import spark.implicits._

  test("clustering coefficient: clique 1.0, star-center 0.0, leaf null-or-zero") {
    // triangle {1,2,3} + star center 4 -> leaves 5,6 (no edges among 5,6)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (4L, 6L))
      .toDF("src", "dst")
    val out = Graph.clusteringCoefficient(edges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(1L) === ((2L, 1L, Some(1.0))))   // in the triangle
    assert(out(2L) === ((2L, 1L, Some(1.0))))
    assert(out(4L) === ((2L, 0L, Some(0.0))))   // star center, open wedge
    assert(out(5L) === ((1L, 0L, None)))        // degree 1: undefined
  }

  test("mixed graph: bowtie center has coefficient 2/6") {
    // two triangles sharing node 0: deg(0)=4, t(0)=2 -> 2*2/(4*3)=1/3
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (0L, 4L),
      (3L, 4L)).toDF("src", "dst")
    val r = Graph.clusteringCoefficient(edges)
      .where($"id" === 0L).collect().head
    assert(r.getLong(2) === 2L)
    assert(r.getDouble(3) === BigDecimal(1.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("mutual information: independent columns 0, determined columns H(X)") {
    // independent: every (x,y) combo equally likely
    val ind = (for (x <- 0 until 2; y <- 0 until 2; _ <- 0 until 5)
      yield (s"x$x", s"y$y")).toDF("a", "b")
    val mi0 = Eda.mutualInformation(ind, "a", "b").collect().head
    assert(mi0.getAs[Double]("mi_nats") === 0.0)
    assert(mi0.getAs[Long]("n_cells") === 4L)
    // y = f(x), uniform over 2 values: MI = H(X) = ln 2
    val det = (for (x <- 0 until 2; _ <- 0 until 5)
      yield (s"x$x", s"y$x")).toDF("a", "b")
    val mi1 = Eda.mutualInformation(det, "a", "b")
      .collect().head.getAs[Double]("mi_nats")
    assert(math.abs(mi1 - math.log(2.0)) < 1e-5, s"mi = $mi1")
  }
}
