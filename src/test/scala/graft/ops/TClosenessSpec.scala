package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TClosenessSpec extends SparkSpec {
  import spark.implicits._

  test("tCloseness: a class matching the global distribution scores 0") {
    // two classes with IDENTICAL value multisets -> each equals global
    val df = Seq(
      ("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g1", 4.0),
      ("g2", 1.0), ("g2", 2.0), ("g2", 3.0), ("g2", 4.0)
    ).toDF("g", "v")
    val r = Quality.tCloseness(df, Seq("g"), "v", bins = 4).collect()
    assert(r.length === 2)
    assert(r.forall(_.getAs[Double]("emd") === 0.0))
  }

  test("tCloseness: a fully skewed class scores the maximal EMD") {
    // g1 all at min, g2 all at max, 2 bins: each class's cum frac at the
    // single interior edge is 1 or 0 vs global 0.5 -> EMD = 0.5/(2-1)
    val df = Seq(("g1", 0.0), ("g1", 0.0), ("g2", 10.0), ("g2", 10.0))
      .toDF("g", "v")
    val r = Quality.tCloseness(df, Seq("g"), "v", bins = 2)
      .collect().map(x => x.getString(0) -> x.getAs[Double]("emd")).toMap
    assert(r("g1") === 0.5 && r("g2") === 0.5)
  }

  test("tCloseness: classes missing whole bins still get dense rows") {
    // g2 never hits the lower half of the range; n per class correct
    val df = Seq(("g1", 0.0), ("g1", 1.0), ("g1", 9.0),
      ("g2", 8.0), ("g2", 9.0)).toDF("g", "v")
    val r = Quality.tCloseness(df, Seq("g"), "v", bins = 5).collect()
    val byG = r.map(x => x.getString(0) -> x.getAs[Long]("n")).toMap
    assert(byG === Map("g1" -> 3L, "g2" -> 2L))
    assert(r.forall(x => x.getAs[Double]("emd") >= 0.0 &&
      x.getAs[Double]("emd") <= 1.0))
  }

  test("tCloseness is partitioning-invariant") {
    val df = (1 to 200).map(i => (s"g${i % 4}", (i * 13 % 97).toDouble))
      .toDF("g", "v")
    val a = Quality.tCloseness(df.repartition(1), Seq("g"), "v")
      .orderBy("g").collect().toSeq
    val b = Quality.tCloseness(df.repartition(11), Seq("g"), "v")
      .orderBy("g").collect().toSeq
    assert(a === b)
  }

  test("tCloseness: null sensitive values are excluded, null class kept") {
    val df = Seq((Some("g1"), Some(1.0)), (Some("g1"), None),
      (None, Some(2.0)), (None, Some(3.0))).toDF("g", "v")
    val r = Quality.tCloseness(df, Seq("g"), "v", bins = 2).collect()
    val byG = r.map(x => Option(x.getString(0)) -> x.getAs[Long]("n")).toMap
    assert(byG === Map(Some("g1") -> 1L, None -> 2L))
  }
}
