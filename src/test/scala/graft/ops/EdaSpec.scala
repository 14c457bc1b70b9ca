package graft.ops

import graft.SparkSpec

class EdaSpec extends SparkSpec {
  import spark.implicits._

  test("E1 histogram: numpy edge rule — max value lands in last bin, counts sum to n") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val bins = Eda.histogram(df, "v", 10).collect()
    assert(bins.map(_.getAs[Long]("cnt")).sum == 100L)
    assert(bins.map(_.getAs[Long]("bin")).max == 9L) // 100.0 clamped into bin 9
  }

  test("E1 histogram degenerate range (min == max) puts everything in bin 0") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val bins = Eda.histogram(df, "v", 10).collect()
    assert(bins.length == 1 && bins(0).getAs[Long]("bin") == 0L
      && bins(0).getAs[Long]("cnt") == 3L)
  }

  test("E4 histogram2d counts sum to non-null pair count") {
    val df = (1 to 50).map(i => (i.toDouble, (i * 2).toDouble)).toDF("x", "y")
    val g = Eda.histogram2d(df, "x", "y", 5).collect()
    assert(g.map(_.getAs[Long]("cnt")).sum == 50L)
  }

  test("E5 corr matrix: perfectly correlated pair gives r = 1, anti gives -1") {
    val df = (1 to 20).map(i => (i.toDouble, i * 2.0, -i * 3.0)).toDF("a", "b", "c")
    val m = Eda.corrMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(approx(m(("a", "b")), 1.0, 1e-6))
    assert(approx(m(("a", "c")), -1.0, 1e-6))
    assert(m.size == 3) // i<j pairs only
  }

  test("E2 boxStatsAll (ungrouped): reference whole-column shape, degenerate input safe") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val r = Eda.boxStatsAll(df, "v").head()
    assert(approx(r.getAs[Double]("q1"), 5.0) && approx(r.getAs[Double]("q3"), 5.0))
    assert(r.getAs[Long]("n_outliers") == 0L)
  }

  test("E2 boxStats: quartiles and fences on a known group") {
    val df = ((1 to 11).map(i => ("g", i.toDouble)) :+ (("g", 100.0))).toDF("k", "v")
    val r = Eda.boxStats(df, "v", "k").head()
    // 12 values: 1..11, 100 -> q1=3.75, med=6.5, q3=9.25, iqr=5.5
    assert(approx(r.getAs[Double]("q1"), 3.75))
    assert(approx(r.getAs[Double]("med"), 6.5))
    assert(approx(r.getAs[Double]("q3"), 9.25))
    assert(r.getAs[Long]("n_outliers") == 1L) // 100 beyond hi fence 17.5
  }
}
