package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("strictly increasing series: S = n_pairs, slope exact, Z positive") {
    // v = 3t + 1 over t = 0..8: every pair ascends, every slope is 3
    val s = (0L to 8L).map(t => (t, 3L * t + 1)).toDF("t", "v")
    val r = Eda.mannKendallTrend(s, "t", "v").collect().head
    assert(r.getAs[Long]("n_points") === 9L)
    assert(r.getAs[Long]("n_pairs") === 36L)
    assert(r.getAs[Long]("s_stat") === 36L)
    assert(r.getAs[Double]("slope") === 3.0)
    // no ties: Var = n(n-1)(2n+5)/18 = 9*8*23/18 = 92
    assert(r.getAs[Double]("var_s") === 92.0)
    val z = r.getAs[Double]("z")
    assert(math.abs(z - (36.0 - 1.0) / math.sqrt(92.0)) < 1e-6)
  }

  test("flat series: S = 0, Z = 0, tie correction zeroes the variance") {
    val s = (0L to 5L).map(t => (t, 7L)).toDF("t", "v")
    val r = Eda.mannKendallTrend(s, "t", "v").collect().head
    assert(r.getAs[Long]("s_stat") === 0L)
    assert(r.getAs[Double]("z") === 0.0)
    // one tie group of 6: correction removes the full untied variance
    assert(r.getAs[Double]("var_s") === 0.0)
    assert(r.getAs[Double]("slope") === 0.0)
  }

  test("median slope resists outliers (the Theil-Sen property)") {
    // linear v = 2t except one wild outlier at t=3
    val s = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 1000L), (4L, 8L),
      (5L, 10L), (6L, 12L)).toDF("t", "v")
    val slope = Eda.mannKendallTrend(s, "t", "v")
      .collect().head.getAs[Double]("slope")
    // OLS would be dragged far above 2; the pairwise median stays at 2
    assert(slope === 2.0, s"slope $slope")
  }

  test("Holt smoothing tracks a perfect linear series exactly") {
    // v = 4t + 2: init l=v1, b=4; recurrence preserves the line exactly
    // at alpha=beta=0.5 (forecast error is 0 at every step)
    val s = (0L to 9L).map(t => (t, 4.0 * t + 2.0)).toDF("t", "v")
    val r = Eda.holtSmooth(s, "t", "v").collect().head
    assert(r.getAs[Long]("n_points") === 10L)
    assert(r.getAs[Double]("level") === 38.0)   // v at t=9
    assert(r.getAs[Double]("trend") === 4.0)
    assert(r.getAs[Double]("forecast_1") === 42.0)
    assert(r.getAs[Double]("forecast_7") === 66.0)
  }

  test("Holt on a two-point series returns the init state") {
    val s = Seq((0L, 10.0), (1L, 13.0)).toDF("t", "v")
    val r = Eda.holtSmooth(s, "t", "v").collect().head
    // fold consumes v2 once from the init-consistent recurrence:
    // l = .5*13 + .5*(10+3) = 13, b = .5*(13-10) + .5*3 = 3
    assert(r.getAs[Double]("level") === 13.0)
    assert(r.getAs[Double]("trend") === 3.0)
  }

  test("seasonal decomposition recovers a pure weekly pattern exactly") {
    // v = 10 + (t mod 7): trend (7-MA) = 13 on every complete window,
    // seasonal_p = p - 3, residual identically 0
    val s = (0L to 20L).map(t => (t, 10L + t % 7)).toDF("t", "v")
    val out = Eda.seasonalDecompose(s, "t", "v", period = 7).collect()
    val mid = out.filter(r => !r.isNullAt(2))
    assert(mid.length === 15)                       // t = 3..17
    assert(mid.forall(_.getAs[Double]("trend") === 13.0))
    assert(mid.forall(_.getAs[Double]("resid") === 0.0))
    out.foreach { r =>
      val p = r.getAs[Long]("t") % 7
      assert(r.getAs[Double]("seasonal") === (p - 3).toDouble,
        s"t=${r.getAs[Long]("t")}")
    }
  }

  test("seasonal decomposition of a linear series: trend = the line, zero seasonal") {
    val s = (0L to 13L).map(t => (t, 2L * t)).toDF("t", "v")
    val out = Eda.seasonalDecompose(s, "t", "v", period = 7).collect()
    out.filter(r => !r.isNullAt(2)).foreach { r =>
      assert(r.getAs[Double]("trend") === 2.0 * r.getAs[Long]("t"))
      assert(r.getAs[Double]("seasonal") === 0.0)
      assert(r.getAs[Double]("resid") === 0.0)
    }
    // incomplete-window edges: trend and resid null, seasonal present
    val edge = out.filter(r => r.getAs[Long]("t") < 3)
    assert(edge.forall(r => r.isNullAt(2) && r.isNullAt(4) && !r.isNullAt(3)))
  }

  test("ACF of an alternating series: acf(1) = -0.9, acf(2) = +0.8 at n=10") {
    // v alternates 0/2 around mean 1: d_t = ±n; lag-1 products all -n^2
    // (9 pairs), den = 10*n^2 -> -0.9; lag-2 all +n^2 (8 pairs) -> 0.8
    val s = (0L to 9L).map(t => (t, if (t % 2 == 0) 0L else 2L)).toDF("t", "v")
    val r = Eda.autocorrelation(s, "t", "v", maxLag = 2)
      .collect().map(x => x.getAs[Long]("lag") ->
        ((x.getAs[Long]("n_pairs"), x.getAs[Double]("acf")))).toMap
    assert(r(1L) === ((9L, -0.9)))
    assert(r(2L) === ((8L, 0.8)))
  }

  test("ACF of a constant series is null (zero variance)") {
    val s = (0L to 5L).map((_, 7L)).toDF("t", "v")
    val r = Eda.autocorrelation(s, "t", "v", maxLag = 3).collect()
    assert(r.nonEmpty && r.forall(_.isNullAt(2)))
  }

  test("ACF pairs skip series gaps (time-unit lag contract)") {
    val s = Seq((0L, 1L), (1L, 5L), (3L, 9L)).toDF("t", "v")
    val r = Eda.autocorrelation(s, "t", "v", maxLag = 3)
      .collect().map(x => x.getAs[Long]("lag") -> x.getAs[Long]("n_pairs")).toMap
    assert(r(1L) === 1L)      // only (0,1) — 3 is not 1 after anything
    assert(r(2L) === 1L)      // (1,3)
    assert(r(3L) === 1L)      // (0,3)
  }

  test("CUSUM finds the exact mean-shift point with exact segment means") {
    // 10 @ level 5 then 6 @ level 50: split after t=9
    val s = ((0L to 9L).map((_, 5L)) ++ (10L to 15L).map((_, 50L))).toDF("t", "v")
    val r = Eda.cusumChangepoint(s, "t", "v").collect().head
    assert(r.getAs[Long]("cp_ord") === 9L)
    assert(r.getAs[Double]("mean_before") === 5.0)
    assert(r.getAs[Double]("mean_after") === 50.0)
    // scaled cusum at the split: n*prefix - r*total = 16*50 - 10*350
    assert(r.getAs[Long]("cusum_scaled") === 16L * 50L - 10L * 350L)
    assert(r.getAs[Long]("n_points") === 16L)
  }

  test("CUSUM on a constant series reports zero magnitude") {
    val s = (0L to 7L).map((_, 4L)).toDF("t", "v")
    val r = Eda.cusumChangepoint(s, "t", "v").collect().head
    assert(r.getAs[Long]("cusum_scaled") === 0L)
    // argmax ties broken by earliest t
    assert(r.getAs[Long]("cp_ord") === 0L)
  }

  /** Reference Holt-Winters additive fold with the engine's exact
    * arithmetic order and init (dyadic constants).
    */
  private def refHw(v: Seq[Double], m: Int, a: Double, b: Double,
      g: Double): Array[Double] = {
    val m1 = v.take(m).foldLeft(0.0)(_ + _) / m
    val m2 = v.slice(m, 2 * m).foldLeft(0.0)(_ + _) / m
    var st = Array(m1, (m2 - m1) / m) ++ v.take(m).map(_ - m1)
    for (x <- v.drop(m)) {
      val lN = a * (x - st(2)) + (1 - a) * (st(0) + st(1))
      val bN = b * (lN - st(0)) + (1 - b) * st(1)
      val sN = g * (x - lN) + (1 - g) * st(2)
      st = Array(lN, bN) ++ st.slice(3, 2 + m) ++ Array(sN)
    }
    st
  }
  private def r6d(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("holtWinters matches the reference fold; seasonal forecast indexes the queue") {
    // trend + strong period-3 cycle
    val vs = (0 until 12).map(t => 10.0 + 0.5 * t + Seq(3.0, -1.0, -2.0)(t % 3))
    val df = vs.zipWithIndex.map { case (v, t) => (t.toLong, v) }.toDF("t", "v")
    val r = Eda.holtWintersSmooth(df, "t", "v", period = 3).collect().head
    val st = refHw(vs, 3, 0.5, 0.25, 0.25)
    assert(r.getAs[Long]("n_points") === 12L)
    assert(r.getAs[Double]("level") === r6d(st(0)))
    assert(r.getAs[Double]("trend") === r6d(st(1)))
    assert(r.getAs[Double]("forecast_1") === r6d(st(0) + 1.0 * st(1) + st(2)))
    assert(r.getAs[Double]("forecast_p") === r6d(st(0) + 3.0 * st(1) + st(4)))
  }

  test("holtWinters: series shorter than two periods yields no row") {
    val df = (0 until 13).map(t => (t.toLong, 1.0)).toDF("t", "v")
    assert(Eda.holtWintersSmooth(df, "t", "v", period = 7).count() === 0L)
    intercept[IllegalArgumentException] {
      Eda.holtWintersSmooth(df, "t", "v", period = 1)
    }
  }

  test("even pair count averages the two middle slopes") {
    // 4 points -> 6 pairs (even); slopes chosen so the middle two differ
    val s = Seq((0L, 0L), (1L, 1L), (2L, 4L), (3L, 9L)).toDF("t", "v")
    val r = Eda.mannKendallTrend(s, "t", "v").collect().head
    // pairwise slopes: 1,2,3,3,4,5 -> median = (3+3)/2 = 3... use exact set
    val slopes = Seq((0, 1, 1.0), (0, 2, 2.0), (0, 3, 3.0),
      (1, 2, 3.0), (1, 3, 4.0), (2, 3, 5.0)).map(_._3).sorted
    val want = (slopes(2) + slopes(3)) / 2.0
    assert(r.getAs[Double]("slope") === want)
  }
}
