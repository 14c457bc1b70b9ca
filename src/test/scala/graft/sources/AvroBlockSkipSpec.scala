package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r17: intra-file BLOCK zone maps — the writer forces a container sync
  * every `graft.blockrows` rows and records per-block min/max/nulls in
  * the sidecar; the scan plans split ranges covering only the blocks a
  * filter cannot rule out (row-group skipping on top of whole-file
  * pruning).
  */
class AvroBlockSkipSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_blk").toString

  private def scanOf(d: DataFrame): AvroScan =
    d.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[AvroScan]

  /** One sorted container of 4000 rows in 250-row blocks. */
  private def sortedFixture(dir: String): Unit =
    spark.range(4000).select(col("id"), (col("id") * 3).as("v"),
        concat(lit("k"), format_string("%05d", col("id"))).as("name"))
      .orderBy("id").coalesce(1)
      .write.format("graft-avro")
      .option("graft.schema", spark.range(1).select(col("id"),
        (col("id") * 3).as("v"),
        concat(lit("k"), format_string("%05d", col("id"))).as("name"))
        .schema.json)
      .option("graft.blockrows", "250")
      .mode("overwrite").save(dir)

  test("sidecar records per-block zone maps at forced sync boundaries") {
    val dir = tempDir()
    sortedFixture(dir)
    val sidecar = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".stats.json")).head
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(sidecar)
    val blocks = root.get("blocks")
    assert(blocks != null && blocks.size() === 16, s"got $blocks")
    assert((0 until blocks.size()).map(i => blocks.get(i).get("rows").asLong)
      .sum === 4000L)
    // per-block bounds are tight on the sorted data
    assert(blocks.get(0).get("cols").get("id").get("min").asLong === 0L)
    assert(blocks.get(0).get("cols").get("id").get("max").asLong === 249L)
    assert(blocks.get(15).get("cols").get("id").get("max").asLong === 3999L)
    // sync anchors strictly increase and stay inside the file
    val ends = (0 until blocks.size()).map(i => blocks.get(i).get("e").asLong)
    assert(ends === ends.sorted && ends.distinct.size === ends.size)
    val avroLen = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head.length
    assert(ends.last <= avroLen)
  }

  test("a selective range probe plans only the matching blocks — losslessly") {
    val dir = tempDir()
    sortedFixture(dir)
    val probe = spark.read.format("graft-avro").load(dir)
      .where(col("id") >= 1000 && col("id") <= 1100)
    assert(probe.select("id").as[Long].collect().sorted.toSeq ===
      (1000L to 1100L))
    val sc = scanOf(probe); sc.planInputPartitions()
    val (kept, total) = sc.lastPlannedBlocks
    assert(total === 16 && kept === 1,
      s"expected exactly the [1000, 1250) block, planned $kept of $total")
    // string-bound probe prunes too (UTF-8-collated block bounds)
    val sp = spark.read.format("graft-avro").load(dir)
      .where(col("name") === "k02000")
    assert(sp.select("id").as[Long].collect().toSeq === Seq(2000L))
    val sc2 = scanOf(sp); sc2.planInputPartitions()
    assert(sc2.lastPlannedBlocks._1 === 1, sc2.lastPlannedBlocks.toString)
    // a probe across a block boundary keeps both blocks, loses nothing
    val span = spark.read.format("graft-avro").load(dir)
      .where(col("id") >= 240 && col("id") <= 260)
    assert(span.select("id").as[Long].collect().sorted.toSeq ===
      (240L to 260L))
    val sc3 = scanOf(span); sc3.planInputPartitions()
    assert(sc3.lastPlannedBlocks._1 === 2, sc3.lastPlannedBlocks.toString)
    // an unfiltered read does not consult blocks at all
    val all = spark.read.format("graft-avro").load(dir)
    assert(all.count() === 4000L)
  }

  test("StringStartsWith prunes by the [prefix, succ(prefix)) range") {
    val dir = tempDir()
    sortedFixture(dir)
    // k0100x lives only in the [1000, 1250) block
    val pr = spark.read.format("graft-avro").load(dir)
      .where(col("name").startsWith("k0100"))
    assert(pr.select("id").as[Long].collect().sorted.toSeq ===
      (1000L to 1009L))
    val sc = scanOf(pr); sc.planInputPartitions()
    assert(sc.lastPlannedBlocks === ((1, 16)), sc.lastPlannedBlocks.toString)
    // a prefix above every value prunes everything — and loses nothing
    val none = spark.read.format("graft-avro").load(dir)
      .where(col("name").startsWith("z"))
    assert(none.count() === 0L)
    val sc2 = scanOf(none); sc2.planInputPartitions()
    assert(sc2.lastPlannedBlocks._1 === 0, sc2.lastPlannedBlocks.toString)
    // a prefix that IS a full value still matches it (s >= p inclusive)
    val exact = spark.read.format("graft-avro").load(dir)
      .where(col("name").startsWith("k02000"))
    assert(exact.select("id").as[Long].collect().toSeq === Seq(2000L))
  }

  test("NaN soundness carries into block pruning") {
    val dir = tempDir()
    // block 0: small values; block 1: a NaN hiding above every max
    spark.createDataFrame(
        (0 until 4).map(i => (i.toLong, i.toDouble)) ++
          Seq((4L, Double.NaN), (5L, 1.0), (6L, 2.0), (7L, 3.0)))
      .toDF("id", "v").orderBy("id").coalesce(1)
      .write.format("graft-avro")
      .option("graft.schema",
        Seq((1L, 1.0)).toDF("id", "v").schema.json)
      .option("graft.blockrows", "4")
      .mode("overwrite").save(dir)
    val hit = spark.read.format("graft-avro").load(dir)
      .where(col("v") > 1e300)
    assert(hit.count() === 1L, "the NaN row must survive block pruning")
    assert(hit.collect().head.getAs[Double]("v").isNaN)
  }

  test("blocks compose with partition pruning and survive merged-schema reads") {
    val dir = tempDir()
    spark.range(2000).select(col("id"),
        concat(lit("L"), (col("id") % 2).cast("string")).as("lang"))
      .orderBy("id")
      .write.format("graft-avro")
      .option("graft.schema", spark.range(1).select(col("id"),
        lit("x").as("lang")).schema.json)
      .option("graft.partitionby", "lang")
      .option("graft.blockrows", "100")
      .mode("overwrite").save(dir)
    val q = spark.read.format("graft-avro").load(dir)
      .where(col("lang") === "L0" && col("id") < 100)
    assert(q.select("id").as[Long].collect().sorted.toSeq ===
      (0L until 100L by 2))
    val sc = scanOf(q); sc.planInputPartitions()
    val (files, totalFiles) = sc.lastPlanned
    assert(files < totalFiles, "partition pruning still fires")
    val (kept, total) = sc.lastPlannedBlocks
    assert(total > 0 && kept < total,
      s"block pruning inside the surviving partition: $kept of $total")
  }
}
