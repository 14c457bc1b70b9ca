package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r19: the metadata tiers COMPOSE with the version log — aggregate
  * pushdown, partition pruning, and zone-map file skipping all operate
  * on the manifest-resolved file set (current or pinned), never on the
  * physical listing that still holds retained old versions.
  */
class AvroVersionedCompositionSpec extends SparkSpec {

  private val conf = new org.apache.hadoop.conf.Configuration()

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_vcomp").toString

  test("metadata aggregate pushdown answers from the post-COW manifest") {
    val dir = tempDir()
    AvroSink.write(spark.range(100)
      .select(col("id"), (col("id") % 4).as("v")).repartition(2), dir,
      overwrite = true)
    AvroVersions.enable(dir, conf)
    AvroSink.deleteWhere(spark, dir, col("v") === 1L) // v2: COW rewrite
    // physical dir still holds v1's originals (retained), but the
    // metadata-only count must answer 75 from v2's sidecars alone
    val agg = spark.read.format("graft-avro").load(dir).groupBy().count()
    assert(agg.queryExecution.executedPlan.toString.contains("metadata-only"),
      s"pushdown must survive versioning:\n${agg.queryExecution.executedPlan}")
    assert(agg.collect().head.getLong(0) === 75L)
    // and the PINNED snapshot's pushdown answers v1's 100
    val agg1 = spark.read.format("graft-avro")
      .option("graft.versionasof", "1").load(dir).groupBy().count()
    assert(agg1.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(agg1.collect().head.getLong(0) === 100L)
  }

  test("partition pruning and partition-grain delete through the manifest") {
    val dir = tempDir()
    AvroSink.writePartitioned(
      spark.range(90).select(col("id"),
        concat(lit("L"), (col("id") % 3).cast("string")).as("lang")),
      dir, Seq("lang"), overwrite = true)
    AvroVersions.enable(dir, conf)
    AvroSink.deleteWhere(spark, dir, col("lang") === "L1") // v2: manifest drop
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/lang=L1")),
      "versioned partition delete must RETAIN the directory for time travel")
    assert(spark.read.format("graft-avro").load(dir).count() === 60L)
    assert(spark.read.format("graft-avro").load(dir)
      .where(col("lang") === "L1").count() === 0L)
    // pinned snapshot still reads the dropped partition
    assert(spark.read.format("graft-avro")
      .option("graft.versionasof", "1").load(dir)
      .where(col("lang") === "L1").count() === 30L)
    // partition pruning on the pinned read plans only L1's file(s)
    val pinned = spark.read.format("graft-avro")
      .option("graft.versionasof", "1").load(dir)
      .where(col("lang") === "L1")
    pinned.collect()
    val scan = pinned.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.asInstanceOf[AvroScan]
    }.get
    assert(scan.lastPlanned._1 < scan.lastPlanned._2,
      s"partition pruning must fire on the pinned read: ${scan.lastPlanned}")
  }

  test("zone-map file skipping prunes within a pinned snapshot") {
    val dir = tempDir()
    val src = spark.range(1000).select(col("id"), (col("id") * 2).as("v"))
    src.write.format("graft-avro")
      .option("graft.schema", src.schema.json)
      .option("graft.sortby", "id").option("graft.range", "true")
      .option("graft.writepartitions", "4")
      .mode("overwrite").save(dir)
    AvroVersions.enable(dir, conf)
    AvroSink.write(spark.range(1000, 2000)
      .select(col("id"), (col("id") * 2).as("v")), dir) // v2 append
    // pinned at v1: a selective probe plans a strict file subset of
    // v1's 4 range-disjoint containers
    val probe = spark.read.format("graft-avro")
      .option("graft.versionasof", "1").load(dir)
      .where(col("id") >= 10 && col("id") <= 20)
    assert(probe.count() === 11L)
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.asInstanceOf[AvroScan]
    }.get
    assert(scan.lastPlanned._2 === 4 && scan.lastPlanned._1 === 1,
      s"zone maps must prune the pinned snapshot: ${scan.lastPlanned}")
  }
}
