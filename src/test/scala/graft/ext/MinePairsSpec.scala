package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinePairsSpec extends SparkSpec {
  import spark.implicits._

  // 2-D vectors on known angles; labels split them into two classes.
  // Anchor = id 0 at angle 0. Same-label: ids 1 (10°), 2 (40°).
  // Other-label: ids 3 (5° — the hard negative), 4 (80°), 5 (170°).
  private def vec(deg: Double) = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }
  private val df = Seq(
    (0L, vec(0), 0), (1L, vec(10), 0), (2L, vec(40), 0),
    (3L, vec(5), 1), (4L, vec(80), 1), (5L, vec(170), 1)
  ).toDF("id", "emb", "label")

  test("positives are same-label by similarity; hard negatives lead the neg list") {
    val out = Similarity.minePairs(df, "id", "emb", "label",
        col("id") === 0L, posK = 2, negK = 2)
      .orderBy("role", "rank")
      .as[(Long, String, Long, Long, Double)].collect()
    val pos = out.filter(_._2 == "pos").map(t => (t._3, t._4))
    val neg = out.filter(_._2 == "neg").map(t => (t._3, t._4))
    assert(pos.toSeq === Seq((1L, 1L), (2L, 2L)))     // 10° then 40°
    assert(neg.toSeq === Seq((1L, 3L), (2L, 4L)))     // 5° (hard) then 80°
    // the anchor never pairs with itself
    assert(!out.exists(_._4 == 0L))
    // cosines are the rounded true angles
    assert(out.forall { case (_, _, _, cid, c) =>
      val want = BigDecimal(math.cos(math.toRadians(Map(
        1L -> 10.0, 2L -> 40.0, 3L -> 5.0, 4L -> 80.0, 5L -> 170.0)(cid))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.abs(c - want) <= 1e-6
    })
  }

  test("every anchor in the predicate emits, with bounded list sizes") {
    val out = Similarity.minePairs(df, "id", "emb", "label",
      col("id").isin(0L, 3L, 5L), posK = 1, negK = 2)
    val byAnchor = out.collect().groupBy(_.getLong(0))
    assert(byAnchor.keySet === Set(0L, 3L, 5L))
    byAnchor.values.foreach { rows =>
      assert(rows.count(_.getString(1) == "pos") <= 1)
      assert(rows.count(_.getString(1) == "neg") <= 2)
    }
  }
}
