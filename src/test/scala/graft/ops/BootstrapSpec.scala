package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("bootstrapMeanCI: interval brackets the mean of a stable sample") {
    val df = (1 to 2000).map(i => (i.toString, 50.0 + (i % 21 - 10)))
      .toDF("id", "v")
    val r = Sampling.bootstrapMeanCI(df, "id", "v").head()
    assert(r.getAs[Long]("n") === 2000L)
    val m = r.getAs[Double]("mean")
    val lo = r.getAs[Double]("lo95"); val hi = r.getAs[Double]("hi95")
    assert(lo <= m && m <= hi, s"interval [$lo, $hi] misses mean $m")
    assert(hi - lo < 2.0, s"interval implausibly wide: [$lo, $hi]")
  }

  test("bootstrapMeanCI: constant values collapse the interval to a point") {
    val df = (1 to 500).map(i => (i.toString, 7.5)).toDF("id", "v")
    val r = Sampling.bootstrapMeanCI(df, "id", "v").head()
    assert(r.getAs[Double]("lo95") === 7.5)
    assert(r.getAs[Double]("hi95") === 7.5)
    assert(r.getAs[Double]("mean") === 7.5)
  }

  test("bootstrapMeanCI is partitioning-invariant (hash membership, not RNG)") {
    val df = (1 to 800).map(i => (i.toString, math.sin(i) * 10))
      .toDF("id", "v")
    val a = Sampling.bootstrapMeanCI(df.repartition(1), "id", "v").head()
    val b = Sampling.bootstrapMeanCI(df.repartition(11), "id", "v").head()
    assert(a === b)
  }
}
