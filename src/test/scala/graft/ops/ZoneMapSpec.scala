package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  // 100 rows, values 0..99; 10 zones of 10 rows each when clustered
  private val rows = (0 until 100).map(i => (i.toLong, i.toDouble))
    .toDF("id", "v")

  test("a value-clustered layout prunes everything outside the band") {
    // zones = value deciles; predicate [25, 44] touches zones 2, 3, 4
    // (zone 2 holds 20..29, zone 4 holds 40..49 — both straddle)
    val r = Layout.zoneMapAudit(rows, floor(col("v") / 10).cast("long"),
        "v", 25.0, 44.0, "clustered").head()
    assert(r.getAs[Long]("zones_total") === 10L)
    assert(r.getAs[Long]("zones_pruned") === 7L)
    assert(r.getAs[Long]("rows_total") === 100L)
    assert(r.getAs[Long]("rows_skipped") === 70L)
    assert(approx(r.getAs[Double]("skip_rate"), 0.7))
  }

  test("a hash layout prunes nothing for a mid-range predicate") {
    val r = Layout.zoneMapAudit(rows, pmod(col("id"), lit(10L)),
        "v", 25.0, 44.0, "hash").head()
    // every zone spans ~[z, 90+z] -> all overlap the band
    assert(r.getAs[Long]("zones_pruned") === 0L)
    assert(r.getAs[Long]("rows_skipped") === 0L)
  }

  test("a predicate outside the data range prunes every zone") {
    val r = Layout.zoneMapAudit(rows, floor(col("v") / 10).cast("long"),
        "v", 1000.0, 2000.0, "clustered").head()
    assert(r.getAs[Long]("zones_pruned") === 10L)
    assert(approx(r.getAs[Double]("skip_rate"), 1.0))
  }

  test("nulls are ignored for pruning bounds") {
    val withNulls = rows.withColumn("v",
      when(col("id") % 3 === 0, lit(null).cast("double")).otherwise(col("v")))
    val r = Layout.zoneMapAudit(withNulls, floor(col("id") / 10).cast("long"),
        "v", 25.0, 44.0, "clustered").head()
    assert(r.getAs[Long]("rows_total") === 66L) // 100 - 34 nulls
  }

  test("argument validation") {
    intercept[IllegalArgumentException] {
      Layout.zoneMapAudit(rows, col("id"), "v", 10.0, 5.0, "bad")
    }
  }
}
