package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetractKcoreSpec extends SparkSpec {
  import spark.implicits._

  test("applySignedDeltas: maintained state equals direct recompute") {
    val rows = (1 to 200).map(i => (s"g${i % 4}", i.toDouble))
    val all = rows.toDF("g", "v")
    val base = all.where(col("v") <= 150)
      .groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(24,2)")).cast("decimal(28,2)").as("sum_v"))
    val deltas = all.where(col("v") > 150)
      .select(col("g"), lit(1).as("w"), col("v"))
      .unionByName(all.where(col("v") <= 50)
        .select(col("g"), lit(-1).as("w"), col("v")))
    val got = Merge.applySignedDeltas(base, deltas, Seq("g"), "w", "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSeq
    val want = all.where(col("v") > 50)
      .groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(24,2)")).cast("decimal(28,2)").as("sum_v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSeq
    assert(got === want)
  }

  test("applySignedDeltas: a fully-retracted group leaves the view") {
    val base = Seq(("a", 2L, BigDecimal("10.00")), ("b", 1L, BigDecimal("5.00")))
      .toDF("g", "n", "sum_v")
      .select(col("g"), col("n"), col("sum_v").cast("decimal(28,2)").as("sum_v"))
    val deltas = Seq(("b", -1, 5.0)).toDF("g", "w", "v")
    val got = Merge.applySignedDeltas(base, deltas, Seq("g"), "w", "v").collect()
    assert(got.length === 1 && got.head.getString(0) === "a")
  }

  test("kCore: a clique survives k = size-1, pendant chains are peeled") {
    // 4-clique (degree 3 each) + a chain 4-5-6 hanging off node 4
    val clique = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val e = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val r = graft.ext.Graph.kCore(e, k = 3, rounds = 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L), s"3-core should be the clique: $r")
    assert(r.values.forall(_ === 3L))
  }

  test("kCore: peeling cascades (chain removal re-exposes low degrees)") {
    // path 1-2-3-4: every 2-core round peels the endpoints until empty
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(graft.ext.Graph.kCore(e, k = 2, rounds = 4).count() === 0L)
  }

  test("kCore is partitioning-invariant") {
    val e = (1 to 200).map(i => ((i % 23).toLong, ((i * 7) % 19 + 40).toLong))
      .toDF("src", "dst")
    val a = graft.ext.Graph.kCore(e.repartition(1), 3).collect().toSeq
    val b = graft.ext.Graph.kCore(e.repartition(9), 3).collect().toSeq
    assert(a === b)
  }
}
