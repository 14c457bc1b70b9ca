package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r18: column-level statistics to Catalyst — per-column NDV from the
  * sidecars' max-merged HLL register blocks, exact null counts, integral
  * min/max, all surfaced through the scan's V2 Statistics.columnStats so
  * the CBO estimates filter selectivity on graft-avro without ANALYZE.
  */
class AvroColumnStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_cst").toString

  private def scanOf(d: DataFrame): AvroScan =
    d.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[AvroScan]

  private def colStatsOf(dir: String)
      : Map[String, org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    val scan = scanOf(spark.read.format("graft-avro").load(dir))
    import scala.jdk.CollectionConverters._
    scan.estimateStatistics().columnStats().asScala.map { case (k, v) =>
      k.fieldNames().mkString(".") -> v
    }.toMap
  }

  test("NDV estimates from max-merged HLL registers are within tolerance") {
    val dir = tempDir()
    // 4 files; v repeats across ALL of them — the cross-file max-merge
    // must see ~50 distinct, not 4 x 50
    AvroSink.write(spark.range(20000).select(col("id"),
        (col("id") % 50).as("v"),
        when(col("id") % 10 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("n"), col("id"))).as("name"))
      .repartition(4), dir, overwrite = true)
    val cs = colStatsOf(dir)
    val ndvId = cs("id").distinctCount().getAsLong
    val ndvV = cs("v").distinctCount().getAsLong
    val ndvName = cs("name").distinctCount().getAsLong
    // HLL m=64 standard error is 1.04/sqrt(64) = 13%; assert 3 sigma
    assert(math.abs(ndvId - 20000.0) / 20000.0 < 0.4, s"ndv(id)=$ndvId")
    // 50 distinct sits in the linear-counting regime: tight
    assert(math.abs(ndvV - 50.0) / 50.0 < 0.2, s"ndv(v)=$ndvV")
    assert(math.abs(ndvName - 18000.0) / 18000.0 < 0.4, s"ndv(name)=$ndvName")
    // exact null counts and integral min/max ride along
    assert(cs("name").nullCount().getAsLong === 2000L)
    assert(cs("id").nullCount().getAsLong === 0L)
    assert(cs("id").min().get() === java.lang.Long.valueOf(0L))
    assert(cs("id").max().get() === java.lang.Long.valueOf(19999L))
  }

  test("decline paths: missing sidecar or register block drops stats, never guesses") {
    val dir = tempDir()
    AvroSink.write(spark.range(1000).select(col("id"), (col("id") % 7).as("v"))
      .repartition(2), dir, overwrite = true)
    assert(colStatsOf(dir).nonEmpty)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".stats.json")).sortBy(_.getName)
    // strip ONE column's hll from one sidecar: only that column declines
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(files.head)
    root.get("cols").get("v")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .remove("hll")
    java.nio.file.Files.write(files.head.toPath, om.writeValueAsBytes(root))
    val crc = new java.io.File(files.head.getParent, s".${files.head.getName}.crc")
    if (crc.exists) crc.delete() // raw rewrite invalidates the checksum shadow
    val cs1 = colStatsOf(dir)
    assert(cs1.contains("id") && !cs1.contains("v"),
      s"v must decline after its register block vanished: ${cs1.keySet}")
    // delete a whole sidecar: every column declines
    files.last.delete()
    val crc2 = new java.io.File(files.last.getParent, s".${files.last.getName}.crc")
    if (crc2.exists) crc2.delete()
    assert(colStatsOf(dir).isEmpty,
      "a sidecar-less file must decline ALL column stats")
  }

  test("a selective filter flips the join build side to broadcast without a hint") {
    val dir = tempDir()
    // dim: ~3x the broadcast threshold on disk, 20k rows, v has 50 values
    AvroSink.write(spark.range(20000).select(col("id"), (col("id") % 50).as("v"),
        concat(lit("name_padding_padding_padding_"), col("id")).as("name")),
      dir, overwrite = true)
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      val fact = spark.range(100000)
        .select(col("id").as("fid"), (col("id") % 20000).as("fk"))
      val dim = spark.read.format("graft-avro").load(dir)
      def kind(d: DataFrame): String = {
        val s = d.queryExecution.executedPlan.toString
        if (s.contains("BroadcastHashJoin")) "broadcast"
        else if (s.contains("SortMergeJoin")) "smj" else "other"
      }
      // unfiltered: the dim's 115 KB exceeds the 64 KB threshold -> SMJ
      assert(kind(fact.join(dim, col("fk") === col("id"))
        .groupBy().count()) === "smj")
      // v = 7 filters to ~1/50th: the CBO's equality selectivity over the
      // sidecar NDV shrinks the estimate below the threshold -> broadcast
      assert(kind(fact.join(dim.where(col("v") === 7L),
        col("fk") === col("id")).groupBy().count()) === "broadcast")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }
}
