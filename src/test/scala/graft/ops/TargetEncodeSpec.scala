package graft.ops

import graft.SparkSpec

class TargetEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)
  ).toDF("cat", "y")

  test("LOO encoding excludes the row's own target and shrinks to the prior") {
    // global mean g = 16/4 = 4; prior = 1
    val out = Preprocess.targetEncode(df, "cat", "y", prior = 1.0)
      .orderBy("cat", "y").collect()
    // (a,1): (6-1 + 1*4)/(2+1) = 3 ; (a,2): 8/3 ; (a,3): 7/3
    assert(out(0).getAs[Double]("target_enc") === 3.0)
    assert(out(1).getAs[Double]("target_enc") === BigDecimal(8.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(2).getAs[Double]("target_enc") === BigDecimal(7.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("a singleton category encodes to exactly the global mean (no self-leak)") {
    val out = Preprocess.targetEncode(df, "cat", "y", prior = 1.0)
      .where($"cat" === "b").collect().head
    // (10-10 + 1*4)/(0+1) = g: the row's own label contributes nothing
    assert(out.getAs[Double]("target_enc") === 4.0)
  }

  test("larger prior pulls every encoding toward the global mean") {
    val small = Preprocess.targetEncode(df, "cat", "y", prior = 0.5)
      .where($"cat" === "a" && $"y" === 1.0).collect().head.getAs[Double]("target_enc")
    val big = Preprocess.targetEncode(df, "cat", "y", prior = 100.0)
      .where($"cat" === "a" && $"y" === 1.0).collect().head.getAs[Double]("target_enc")
    assert(math.abs(big - 4.0) < math.abs(small - 4.0))
  }

  test("category stats join back via broadcast (no fact-table shuffle)") {
    val plan = Preprocess.targetEncode(df, "cat", "y")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }
}
