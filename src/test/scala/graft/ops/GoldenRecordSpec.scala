package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GoldenRecordSpec extends SparkSpec {
  import Harmonize.SurvivorRule._

  private def recs = {
    import spark.implicits._
    Seq(
      // cluster 1: name mode=alpha (2 of 3), latest bal is id 13's 30.0,
      // longest addr is "long street 99", min seg = A
      (1L, 11L, 1L, "alpha", "short st", 10.0, "B"),
      (1L, 12L, 2L, "beta", "long street 99", 20.0, "A"),
      (1L, 13L, 3L, "alpha", null, 30.0, "C"),
      // cluster 2: all-null address survives as null; name tie (gamma,
      // delta 1 each) -> lexicographically smallest wins (delta)
      (2L, 21L, 5L, "gamma", null, 5.5, "Z"),
      (2L, 22L, 4L, "delta", null, 7.5, "Y"))
      .toDF("cluster_id", "rec_id", "version", "name", "address", "bal", "seg")
  }

  test("goldenRecord applies each survivorship rule deterministically") {
    val out = Harmonize.goldenRecord(recs, "cluster_id", "rec_id", Seq(
        MostFrequent("name"), Longest("address"), Latest("bal", "version"),
        MinValue("seg")))
      .orderBy("cluster_id").collect()
    assert(out.length === 2)
    val c1 = out(0)
    assert(c1.getLong(0) === 1L && c1.getLong(1) === 3L)
    assert(c1.getString(2) === "alpha")        // mode 2-of-3
    assert(c1.getString(3) === "long street 99") // longest non-null
    assert(c1.getDouble(4) === 30.0)           // latest version
    assert(c1.getString(5) === "A")            // min
    val c2 = out(1)
    assert(c2.getLong(1) === 2L)
    assert(c2.getString(2) === "delta")        // tie -> lexicographic min
    assert(c2.isNullAt(3))                     // all-null stays null
    assert(c2.getDouble(4) === 5.5)            // version 5 beats 4
  }

  test("goldenRecord Latest ignores null values and ties break on id") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 9L, Option.empty[String]),
      (1L, 2L, 3L, Some("kept")),
      (1L, 3L, 3L, Some("kept2"))) // same version: higher rec_id wins
      .toDF("cluster_id", "rec_id", "version", "v")
    val out = Harmonize.goldenRecord(df, "cluster_id", "rec_id",
      Seq(Latest("v", "version"))).collect()
    assert(out.head.getString(2) === "kept2")
  }

  test("goldenRecord rejects reserved field names") {
    intercept[IllegalArgumentException] {
      Harmonize.goldenRecord(recs, "cluster_id", "rec_id",
        Seq(MaxValue("n_versions")))
    }
  }
}
