package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 batch: language-temperature resampling and nucleus (top-p)
  * per-group selection.
  */
class Round7dOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mix(nA: Int, nB: Int) =
    ((1 to nA).map(i => ("a", i.toLong)) ++
      (1 to nB).map(i => ("b", (1000 + i).toLong))).toDF("lang", "id")

  test("temperatureResample: alpha=1 preserves the natural mix") {
    val df = mix(900, 100)
    val kept = Sampling.temperatureResample(df, "lang", "id", 1.0, 100L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") == 90L && kept("b") == 10L,
      s"alpha=1 keeps strata proportional, got $kept")
  }

  test("temperatureResample: small alpha boosts the low-resource stratum") {
    val df = mix(900, 100)
    val kept = Sampling.temperatureResample(df, "lang", "id", 0.3, 100L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // shares 900^.3 : 100^.3 = 7.69 : 3.98 -> b well above its 10% natural share
    assert(kept("b") > 25L && kept("b") < 50L,
      s"alpha=0.3 should lift b far above its 10% natural share, got $kept")
    assert(kept("a") + kept("b") <= 100L, "floor caps never exceed the target")
  }

  test("temperatureResample: deterministic across repartitioning") {
    val df = mix(300, 50)
    val a = Sampling.temperatureResample(df, "lang", "id", 0.5, 80L)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureResample(df.repartition(7), "lang", "id", 0.5, 80L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same rows in and out regardless of partitioning")
  }

  test("nucleusPerGroup: smallest top-score prefix reaching share p") {
    val df = Seq(("g", 1L, 5L), ("g", 2L, 3L), ("g", 3L, 1L), ("g", 4L, 1L))
      .toDF("g", "id", "score")
    val kept = Sampling.nucleusPerGroup(df, Seq("g"), "id", "score", 0.6)
      .select("id").collect().map(_.getLong(0)).toSet
    // total 10, p·total = 6: id1 (cb 0) and id2 (cb 5) keep; id3 (cb 8) drops
    assert(kept == Set(1L, 2L), s"expected ids {1,2}, got $kept")
  }

  test("nucleusPerGroup: p=1 keeps every positive-score row, zero rows drop") {
    val df = Seq(("g", 1L, 4L), ("g", 2L, 2L), ("g", 3L, 0L),
      ("h", 4L, 0L)).toDF("g", "id", "score")
    val kept = Sampling.nucleusPerGroup(df, Seq("g"), "id", "score", 1.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L),
      s"zero-mass rows carry no nucleus mass, got $kept")
  }

  test("nucleusPerGroup: ties at the boundary break by id, smallest first") {
    val df = Seq(("g", 9L, 2L), ("g", 1L, 2L), ("g", 5L, 2L))
      .toDF("g", "id", "score")
    // total 6, p=0.5 -> 3: id1 (cb 0) keeps, id5 (cb 2) keeps, id9 (cb 4) drops
    val kept = Sampling.nucleusPerGroup(df, Seq("g"), "id", "score", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L), s"expected ids {1,5}, got $kept")
  }
}
