package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r18: clustered write — `graft.sortby` declares a required ordering
  * through the DSv2 write plan (RequiresDistributionAndOrdering), so
  * containers come out sorted and the r17 block zone maps actually pay;
  * `graft.range=true` adds a global range repartition so FILES hold
  * disjoint ranges too.
  */
class AvroClusteredWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_clu").toString

  private def scanOf(d: DataFrame): AvroScan =
    d.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[AvroScan]

  // ids SHUFFLED at the source: without the sink-side sort every block
  // spans nearly the full range and nothing skips
  private def scrambled = spark.range(4000)
    .select((col("id") * 2654435761L % 4000).as("id"))

  private def keptBlocks(dir: String, lo: Long, hi: Long): (Int, Int) = {
    val probe = spark.read.format("graft-avro").load(dir)
      .where(col("id") >= lo && col("id") <= hi)
    // losslessness first: pruning must never cost a row
    assert(probe.select("id").as[Long].collect().sorted.toSeq ===
      (lo to hi), s"probe [$lo,$hi] lost rows in $dir")
    val sc = scanOf(probe); sc.planInputPartitions()
    sc.lastPlannedBlocks
  }

  test("graft.sortby matches the hand-sorted fixture's skip rate") {
    // hand-sorted single container (the q_s27 fixture shape)
    val hand = tempDir()
    scrambled.orderBy("id").coalesce(1)
      .write.format("graft-avro")
      .option("graft.schema", scrambled.schema.json)
      .option("graft.blockrows", "250")
      .mode("overwrite").save(hand)
    // the same data through the OPTION: coalesce(1) + sortby (no manual
    // orderBy — the write plan must insert the sort)
    val opt = tempDir()
    scrambled.coalesce(1)
      .write.format("graft-avro")
      .option("graft.schema", scrambled.schema.json)
      .option("graft.blockrows", "250")
      .option("graft.sortby", "id")
      .mode("overwrite").save(opt)
    val (keptHand, totalHand) = keptBlocks(hand, 1000, 1100)
    val (keptOpt, totalOpt) = keptBlocks(opt, 1000, 1100)
    assert(totalHand === 16 && totalOpt === 16)
    assert(keptOpt <= keptHand,
      s"option-clustered write kept $keptOpt blocks vs hand-sorted $keptHand")
    assert(keptOpt === 1, s"a point-range probe must keep 1 block, got $keptOpt")
    // unsorted baseline: the same probe keeps (nearly) every block
    val flat = tempDir()
    scrambled.coalesce(1)
      .write.format("graft-avro")
      .option("graft.schema", scrambled.schema.json)
      .option("graft.blockrows", "250")
      .mode("overwrite").save(flat)
    val (keptFlat, _) = keptBlocks(flat, 1000, 1100)
    assert(keptFlat > keptOpt * 4,
      s"unsorted baseline must skip far less: kept $keptFlat vs $keptOpt")
  }

  test("graft.range lays out disjoint file ranges and prunes whole files") {
    val dir = tempDir()
    // graft.writepartitions pins the task count (AQE would coalesce a
    // 4000-row range shuffle to one partition = one file)
    scrambled.write.format("graft-avro")
      .option("graft.schema", scrambled.schema.json)
      .option("graft.sortby", "id")
      .option("graft.range", "true")
      .option("graft.writepartitions", "4")
      .mode("overwrite").save(dir)
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = AvroDsv2.listFiles(dir, conf)
    assert(files.size >= 2, s"range write should produce multiple files")
    // file-level [min, max] ranges are pairwise disjoint
    val ranges = files.map { case (p, _) =>
      val c = AvroStats.read(p).get.cols("id")
      (c.minL.get, c.maxL.get)
    }.sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, aMax), (bMin, _)) =>
      assert(aMax < bMin, s"file ranges overlap: $ranges")
    }
    // a point probe plans exactly one FILE
    val probe = spark.read.format("graft-avro").load(dir)
      .where(col("id") === 2024L)
    assert(probe.count() === 1L)
    val sc = scanOf(probe); sc.planInputPartitions()
    assert(sc.lastPlanned._1 === 1,
      s"point probe must prune to one file, planned ${sc.lastPlanned}")
  }

  test("sortby composes with partitioned layout and validates columns") {
    val dir = tempDir()
    val df = spark.range(900).select(col("id"),
      concat(lit("L"), (col("id") % 3).cast("string")).as("lang"))
    df.repartition(col("lang"))
      .write.format("graft-avro")
      .option("graft.schema", df.schema.json)
      .option("graft.partitionby", "lang")
      .option("graft.sortby", "id")
      .option("graft.blockrows", "50")
      .mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.count() === 900L)
    // per-container blocks are sorted: every partition's probe skips
    val probe = back.where(col("id") >= 300 && col("id") <= 330)
    assert(probe.count() === 31L)
    val sc = scanOf(probe); sc.planInputPartitions()
    val (kept, total) = sc.lastPlannedBlocks
    assert(total > 0 && kept < total,
      s"sorted partitioned containers must skip blocks: $kept of $total")
    // unknown sort column fails loudly at write planning
    val ex = intercept[Exception] {
      df.write.format("graft-avro")
        .option("graft.schema", df.schema.json)
        .option("graft.sortby", "nope")
        .mode("overwrite").save(tempDir())
    }
    assert(ex.getMessage.contains("graft.sortby"), ex.getMessage)
    // option combinations that would silently do nothing (range without
    // sort) or die opaquely inside Spark (writepartitions without range)
    // refuse loudly at planning instead
    val ex2 = intercept[Exception] {
      df.write.format("graft-avro")
        .option("graft.schema", df.schema.json)
        .option("graft.range", "true")
        .mode("overwrite").save(tempDir())
    }
    assert(ex2.getMessage.contains("graft.range"), ex2.getMessage)
    val ex3 = intercept[Exception] {
      df.write.format("graft-avro")
        .option("graft.schema", df.schema.json)
        .option("graft.sortby", "id")
        .option("graft.writepartitions", "4")
        .mode("overwrite").save(tempDir())
    }
    assert(ex3.getMessage.contains("graft.writepartitions"), ex3.getMessage)
  }
}
