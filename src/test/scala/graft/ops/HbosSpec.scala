package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class HbosSpec extends SparkSpec {
  import spark.implicits._

  test("the marginally-rare row scores lowest; rarity is the exact count product") {
    // 19 rows clustered at (1.0, 10.0) + one far outlier at (100.0, 1000.0):
    // the outlier sits alone in bin 15 of both features -> rarity 1*1 = 1;
    // cluster rows share bin 0 of both -> rarity 19*19 = 361
    val rows = (1 to 19).map(i => (i.toLong, 1.0, 10.0)) :+ ((99L, 100.0, 1000.0))
    val out = Preprocess.hbosTopK(rows.toDF("id", "x", "y"),
      Seq("x", "y"), Seq("id"), bins = 16, k = 3).collect()
    assert(out.head.getAs[Long]("id") === 99L)
    assert(out.head.getAs[Double]("rarity") === 1.0)
    assert(out(1).getAs[Double]("rarity") === 361.0)
  }

  test("null features are excluded; a constant feature collapses to one bin") {
    val rows = Seq((1L, 1.0, Some(5.0)), (2L, 2.0, Some(5.0)),
      (3L, 3.0, None), (4L, 50.0, Some(5.0)))
    val out = Preprocess.hbosTopK(rows.toDF("id", "x", "c"),
      Seq("x", "c"), Seq("id"), bins = 16, k = 10).collect()
    // row 3 (null c) is gone; constant c contributes count 3 to everyone
    assert(out.map(_.getAs[Long]("id")).toSet === Set(1L, 2L, 4L))
    val r4 = out.find(_.getAs[Long]("id") == 4L).get
    assert(r4.getAs[Double]("rarity") === 3.0) // 1 * 3
  }

  test("no row-identity shuffle: counts come back as broadcast joins") {
    val rows = (1 to 100).map(i => (i.toLong, i.toDouble, (i % 7).toDouble))
    val plan = Preprocess.hbosTopK(rows.toDF("id", "x", "y"),
      Seq("x", "y"), Seq("id"), bins = 8, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
    assert(plan.contains("TakeOrdered") || plan.contains("TakeOrderedAndProject"),
      s"top-k must be a TakeOrdered, not a global sort:\n$plan")
  }
}
