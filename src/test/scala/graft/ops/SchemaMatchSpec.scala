package graft.ops

import graft.SparkSpec

class SchemaMatchSpec extends SparkSpec {

  test("contentSchemaMatch scores identical domains 1.0 and disjoint 0.0") {
    import spark.implicits._
    val left = (1 to 50).map(i => (i.toLong, s"cat_${i % 5}"))
      .toDF("id", "category")
    val right = (1 to 50).map(i => (i.toLong + 1000, s"cat_${i % 5}"))
      .toDF("key", "kind")
    val out = Harmonize.contentSchemaMatch(left, right, k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    assert(out(("category", "kind")) === ((5L, 1.0)))   // same 5 values
    assert(out(("id", "key"))._2 === 0.0)               // disjoint ranges
    assert(out(("id", "kind"))._2 === 0.0)
    assert(out.size === 4)
  }

  test("contentSchemaMatch bottom-k estimator bounds and domainMod filter") {
    import spark.implicits._
    // left domain {1..100}, right {51..150}: true J = 50/150 = 1/3
    val left = (1 to 100).map(_.toLong).toDF("a")
    val right = (51 to 150).map(_.toLong).toDF("b")
    val full = Harmonize.contentSchemaMatch(left, right, k = 1000)
      .collect().head
    // k >= |union| makes the estimate EXACT
    assert(full.getLong(2) === 50L && full.getLong(3) === 150L)
    assert(math.abs(full.getDouble(4) - 50.0 / 150) < 1e-6)
    // domainMod subsamples both sides identically: counts shrink, no crash
    val sub = Harmonize.contentSchemaMatch(left, right, k = 1000, domainMod = 4)
      .collect().head
    assert(sub.getLong(3) < 150L && sub.getLong(2) <= sub.getLong(3))
  }

  test("contentSchemaMatch ignores null values") {
    import spark.implicits._
    val left = Seq(Some("x"), None, Some("y")).toDF("c")
    val right = Seq(Some("x"), Some("y"), None).toDF("d")
    val out = Harmonize.contentSchemaMatch(left, right, k = 8).collect().head
    assert(out.getLong(2) === 2L && out.getLong(3) === 2L)
    assert(out.getDouble(4) === 1.0)
  }
}
