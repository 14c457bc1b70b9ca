package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MahalanobisSpec extends SparkSpec {
  import spark.implicits._

  // x,y strongly correlated; z independent; one point breaks the
  // correlation without being extreme in any single coordinate
  private val base = (1 to 50).map { i =>
    val x = (i % 10).toDouble
    (x, x + 0.1 * (i % 3), (i % 5).toDouble)
  }
  private val withOutlier = base :+ ((8.0, 0.0, 2.0)) // anti-correlated
  private val df = withOutlier.toDF("x", "y", "z")

  test("sum of scores equals n * dims (population-covariance trace identity)") {
    val total = Preprocess.mahalanobisScores(df, Seq("x", "y", "z"))
      .agg(sum("md2")).collect().head.getDouble(0)
    assert(math.abs(total - 3.0 * withOutlier.length) < 1e-3,
      s"sum md2 = $total, expected ${3 * withOutlier.length}")
  }

  test("the correlation-breaking point scores far above the sample") {
    val out = Preprocess.mahalanobisScores(df, Seq("x", "y", "z")).collect()
    val outlier = out.find(r => r.getAs[Double]("x") == 8.0 &&
      r.getAs[Double]("y") == 0.0).get
    val others = out.filter(r => !(r.getAs[Double]("x") == 8.0 &&
      r.getAs[Double]("y") == 0.0))
    assert(outlier.getAs[Boolean]("is_outlier"))
    assert(others.forall(r =>
      r.getAs[Double]("md2") < outlier.getAs[Double]("md2")))
  }

  test("stats broadcast back: no fact-table shuffle in the scoring plan") {
    val plan = Preprocess.mahalanobisScores(df, Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    // the only exchange is the single-row stats aggregate
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }
}
