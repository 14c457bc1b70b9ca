package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeqPoissonSpec extends SparkSpec {

  test("sequentialPoisson favors heavy weights (PPS behavior)") {
    import spark.implicits._
    // 1000 light rows (w=1) and 50 heavy rows (w=100): heavy rows should
    // be drastically over-represented relative to their 5% row share
    val df = ((1 to 1000).map(i => (i.toLong, 1.0)) ++
      (1001 to 1050).map(i => (i.toLong, 100.0))).toDF("id", "w")
    val kept = Sampling.sequentialPoisson(df, "id", "w", k = 100).collect()
    assert(kept.length === 100)
    val heavy = kept.count(_.getLong(0) > 1000)
    // heavy rows hold 5000/6000 of the total weight; expect the sample
    // dominated by them (vs 5 under uniform sampling)
    assert(heavy > 25, s"heavy rows sampled: $heavy")
  }

  test("sequentialPoisson is partitioning-invariant and excludes bad weights") {
    import spark.implicits._
    val base = (1 to 500).map(i =>
      (i.toLong, if (i % 7 == 0) -1.0 else i.toDouble / 3))
    val a = base.toDF("id", "w").repartition(3)
    val b = base.toDF("id", "w").repartition(13)
    val ka = Sampling.sequentialPoisson(a, "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    val kb = Sampling.sequentialPoisson(b, "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    assert(ka === kb)
    assert(ka.forall(_ % 7 != 0)) // negative weights never sampled
  }

  test("sequentialPoisson plans as TakeOrderedAndProject (no global sort)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, 1.0)).toDF("id", "w")
    val plan = Sampling.sequentialPoisson(df, "id", "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
