package graft.ops

import graft.SparkSpec

class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("us", "gold"), ("us", "gold"), ("us", "gold"),
    ("us", "silver"), ("us", "silver"),
    ("de", "gold")).toDF("country", "tier")

  test("kAnonymityViolations reports only classes below k with risk") {
    val v = Quality.kAnonymityViolations(df, Seq("country", "tier"), k = 3)
      .orderBy("country", "tier").collect()
    assert(v.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("de", "gold", 1L), ("us", "silver", 2L)))
    assert(v.map(_.getDouble(3)).toSeq == Seq(1.0, 0.5))
  }

  test("kAnonymitySummary: achieved k, class counts, rows at risk") {
    val s = Quality.kAnonymitySummary(df, Seq("country", "tier"), k = 3).head()
    assert(s.getLong(0) == 1L) // achieved k
    assert(s.getLong(1) == 3L) // classes
    assert(s.getLong(2) == 2L) // violating classes
    assert(s.getLong(3) == 3L) // rows at risk
  }

  test("a k-anonymous table yields no violations") {
    val ok = df.where($"country" === "us" && $"tier" === "gold")
    assert(Quality.kAnonymityViolations(ok, Seq("country", "tier"), 3).count() == 0)
    val s = Quality.kAnonymitySummary(ok, Seq("country", "tier"), 3).head()
    assert(s.getLong(0) == 3L && s.getLong(2) == 0L)
  }
}
