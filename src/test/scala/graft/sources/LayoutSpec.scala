package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Physical-layout features: partition pruning and bucketed (exchange-free)
  * joins — asserted at the PLAN level, since the point of each layout is
  * what the optimizer can skip.
  */
class LayoutSpec extends SparkSpec {

  test("partitioned write + filter prunes partitions at the scan") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sources.writePartitioned(events, tmp, Seq("event_type"))
    val back = spark.read.parquet(tmp).where(col("event_type") === "click")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    val expected = events.where(col("event_type") === "click").count()
    assert(back.count() == expected)
    // pruning is real: only the matching partition directory is listed
    val scanned = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("event_type=error"))
  }

  test("bucketed tables join without a shuffle exchange") {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders").limit(1000)
    val lineitem = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem").limit(4000)
    Sources.writeBucketed(orders.withColumnRenamed("o_orderkey", "k"), "orders_b", "k", 8)
    Sources.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "k"), "lineitem_b", "k", 8)
    val joined = spark.table("lineitem_b").join(spark.table("orders_b"), "k")
    // disable broadcast so the join must pick a shuffle strategy — bucketing
    // should satisfy the distribution requirement with zero Exchange nodes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
