package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BottomKQuantileSpec extends SparkSpec {

  test("bottomKQuantiles is exact when k covers the whole input") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Sketches.bottomKQuantiles(df, "v", "id", k = 1000,
        qs = Seq(0.0, 0.5, 1.0))
      .orderBy("q").collect()
    assert(out.map(_.getDouble(1)).toSeq === Seq(1.0, 50.0, 100.0))
    assert(out.forall(_.getLong(2) === 100L))
  }

  test("bottomKQuantiles is partitioning-invariant and near the exact value") {
    import spark.implicits._
    val base = (1 to 10000).map(i => (i.toLong, i.toDouble))
    val a = base.toDF("id", "v").repartition(2)
    val b = base.toDF("id", "v").repartition(17)
    val qa = Sketches.bottomKQuantiles(a, "v", "id", 800, Seq(0.5)).collect().head
    val qb = Sketches.bottomKQuantiles(b, "v", "id", 800, Seq(0.5)).collect().head
    assert(qa.getDouble(1) === qb.getDouble(1)) // sample is hash-determined
    // O(1/sqrt(k)) rank error: p50 of 1..10000 within ~4 sigma of 5000
    assert(math.abs(qa.getDouble(1) - 5000.0) < 4 * 10000 / math.sqrt(800))
  }

  test("bottom-k sample is mergeable: sketch of union = merge of sketches") {
    import spark.implicits._
    val shard1 = (1 to 5000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val shard2 = (5001 to 10000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val k = 300
    def sample(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h", conv(substring(md5(col("id").cast("string")), 1, 15),
        16, 10).cast("long"))
      .orderBy("h", "id").limit(k).select("id", "v")
    val direct = sample(shard1.unionByName(shard2)).collect().map(_.getDouble(1)).toSet
    val merged = sample(sample(shard1).unionByName(sample(shard2)))
      .collect().map(_.getDouble(1)).toSet
    assert(direct === merged)
  }

  test("mergeBottomK over the public API equals the global build, even with skewed shards") {
    import spark.implicits._
    val all = (1 to 8000).map(i => (i.toLong, (i * 37 % 9001).toDouble)).toDF("id", "v")
    val k = 250
    // deliberately skewed shards: one holds ~87% of the rows, one is tiny
    val shards = Seq(
      all.where(col("id") % 8 === 0),            // ~12.5%
      all.where(col("id") % 8 === 1),
      all.where(col("id") % 8 >= 2))             // ~75%
      .map(Sketches.bottomKSketch(_, "v", "id", k))
    val merged = Sketches.mergeBottomK(shards, k)
    val global = Sketches.bottomKSketch(all, "v", "id", k)
    assert(merged.select("i").collect().map(_.getString(0)).toSet ===
      global.select("i").collect().map(_.getString(0)).toSet)
    val qm = Sketches.quantilesFromBottomK(merged, Seq(0.25, 0.5, 0.75))
      .orderBy("q").collect().map(_.getDouble(1)).toSeq
    val qg = Sketches.quantilesFromBottomK(global, Seq(0.25, 0.5, 0.75))
      .orderBy("q").collect().map(_.getDouble(1)).toSeq
    assert(qm === qg)
  }

  test("bottomKQuantiles rejects out-of-range quantiles") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Sketches.bottomKQuantiles(df, "v", "id", 10, Seq(1.5))
    }
  }
}
