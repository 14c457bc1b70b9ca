package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r16: SupportsReportStatistics (sidecar-accurate size/rows feed
  * Catalyst's join planning) and SupportsRuntimeFiltering (dynamic
  * file pruning from join-derived filters).
  */
class AvroStatsRuntimeSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_stats").toString

  private def scanOf(d: DataFrame): AvroScan =
    d.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        return a.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
        }.head.asInstanceOf[AvroScan]
    }.head.asInstanceOf[AvroScan]

  test("estimateStatistics reports sidecar-exact rows and pruned bytes") {
    val dir = tempDir()
    AvroSink.write(spark.range(500).select(col("id"))
      .repartitionByRange(5, col("id")), dir, overwrite = true)
    val scan = scanOf(spark.read.format("graft-avro").load(dir))
    val st = scan.estimateStatistics()
    assert(st.numRows().getAsLong === 500L)
    assert(st.sizeInBytes().getAsLong > 0L)
    // a pushed filter shrinks the ESTIMATE too (pruned files drop out)
    val filtered = spark.read.format("graft-avro").load(dir)
      .where(col("id") < 100)
    val fst = scanOf(filtered).estimateStatistics()
    assert(fst.numRows().getAsLong < 500L)
    assert(fst.sizeInBytes().getAsLong < st.sizeInBytes().getAsLong)
    // a file without a sidecar: bytes still known, rows unknown
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".stats.json")).take(1)
      .foreach(f => assert(f.delete()))
    val nst = scanOf(spark.read.format("graft-avro").load(dir))
      .estimateStatistics()
    assert(!nst.numRows().isPresent)
    assert(nst.sizeInBytes().getAsLong === st.sizeInBytes().getAsLong)
  }

  test("a sidecar WITHOUT a rows field reads as unknown, never as zero") {
    val dir = tempDir()
    AvroSink.write(spark.range(200).select(col("id")).coalesce(1),
      dir, overwrite = true)
    // strip the rows field, keep the column stats (a foreign sidecar)
    val sc = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".stats.json")).get
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(sc).asInstanceOf[
      com.fasterxml.jackson.databind.node.ObjectNode]
    root.remove("rows")
    java.nio.file.Files.write(sc.toPath, om.writeValueAsBytes(root))
    // numRows must be UNKNOWN (a fabricated 0 would auto-broadcast a
    // huge table); bytes stay known
    val st = scanOf(spark.read.format("graft-avro").load(dir))
      .estimateStatistics()
    assert(!st.numRows().isPresent)
    assert(st.sizeInBytes().getAsLong > 0L)
    // count(*) pushdown must DECLINE and fall back to the real scan
    val agged = spark.read.format("graft-avro").load(dir)
      .agg(count(lit(1)).as("n"))
    assert(!agged.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    assert(agged.collect().head.getLong(0) === 200L)
  }

  test("Catalyst auto-broadcasts a small graft-avro dimension from reported stats") {
    val dir = tempDir()
    AvroSink.write(spark.range(20).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name")), dir, overwrite = true)
    val dim = spark.read.format("graft-avro").load(dir)
    val fact = spark.range(10000).select((col("id") % 20).as("k"),
      col("id").as("v"))
    // no broadcast() hint anywhere: the decision must come from the
    // scan's reported sizeInBytes being under the broadcast threshold
    val joined = fact.join(dim, "k")
    assert(joined.count() === 10000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("runtime filter() prunes files like a pushed filter, losslessly") {
    val dir = tempDir()
    AvroSink.write(spark.range(1000).select(col("id"))
      .repartitionByRange(4, col("id")), dir, overwrite = true)
    val df = spark.read.format("graft-avro").load(dir)
    val scan = scanOf(df)
    assert(scan.planSplits(AvroDsv2.listFiles(dir,
      new org.apache.hadoop.conf.Configuration())).nonEmpty)
    val all = scan.lastPlanned
    assert(all._1 === 4 && all._2 === 4)
    // inject a runtime filter the way DPP would, then re-plan
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id", Array(7L, 9L))))
    scan.planSplits(AvroDsv2.listFiles(dir,
      new org.apache.hadoop.conf.Configuration()))
    val (kept, tot) = scan.lastPlanned
    assert(tot === 4 && kept === 1, s"expected runtime pruning, $kept of $tot")
    // filterAttributes exposes the scan columns for DPP eligibility
    assert(scan.filterAttributes().map(_.fieldNames.head).toSeq === Seq("id"))
  }

  test("runtime filter on a PARTITION column prunes directories exactly") {
    val dir = tempDir()
    AvroSink.writePartitioned(
      spark.range(90).select(col("id"),
        (col("id") % 3).cast("int").as("band")),
      dir, Seq("band"), overwrite = true)
    val df = spark.read.format("graft-avro").load(dir)
    val scan = scanOf(df)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("band", 2)))
    scan.planSplits(AvroDsv2.listFiles(dir,
      new org.apache.hadoop.conf.Configuration()))
    val (kept, tot) = scan.lastPlanned
    assert(kept < tot, s"expected directory pruning, $kept of $tot")
    // and the estimate follows the runtime filter
    assert(scan.estimateStatistics().numRows().getAsLong === 30L)
  }
}
