package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r16: Hive-style partitioned layout for graft-avro — partitioned
  * write, typed path-borne columns, partition-directory pruning.
  */
class AvroPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_part").toString

  private def fixture: DataFrame = spark.range(300).select(
    col("id"),
    concat(lit("L"), (col("id") % 3).cast("string")).as("lang"),
    (col("id") % 4).cast("int").as("band"),
    (col("id") / 8.0).as("score"))

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Seq.empty
    else Option(t.getMessage).toSeq ++ messages(t.getCause)

  private def scanOf(d: DataFrame): AvroScan =
    d.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[AvroScan]

  test("partitioned write round-trips: typed partition columns, hive layout") {
    val dir = tempDir()
    AvroSink.writePartitioned(fixture, dir, Seq("lang", "band"),
      overwrite = true)
    // layout: lang=L0/band=0/... with the spec file at the root
    val root = new java.io.File(dir)
    assert(root.listFiles().exists(_.getName == AvroPartitions.SpecFile))
    val leaf = new java.io.File(dir, "lang=L0/band=0")
    assert(leaf.isDirectory, root.listFiles().map(_.getName).mkString(","))
    assert(leaf.listFiles().exists(_.getName.endsWith(".avro")))
    assert(leaf.listFiles().exists(_.getName.endsWith(".stats.json")))
    val back = spark.read.format("graft-avro").load(dir)
    // partition columns come back TYPED, appended last
    assert(back.schema.fields.map(_.name).toSeq ===
      Seq("id", "score", "lang", "band"))
    assert(back.schema("band").dataType.typeName === "integer")
    assert(back.count() === 300L)
    val r = back.where(col("id") === 7).collect().head
    assert(r.getAs[String]("lang") === "L1")
    assert(r.getAs[Int]("band") === 3)
    assert(r.getAs[Double]("score") === 7.0 / 8.0)
    // full-table values match the source frame
    val exp = fixture.select("id", "score", "lang", "band")
      .collect().map(_.toString).sorted.toSeq
    assert(back.select("id", "score", "lang", "band")
      .collect().map(_.toString).sorted.toSeq === exp)
  }

  test("partition-directory pruning: filters on partition columns skip files") {
    val dir = tempDir()
    AvroSink.writePartitioned(fixture, dir, Seq("lang", "band"),
      overwrite = true)
    val total = AvroDsv2.listFiles(dir,
      new org.apache.hadoop.conf.Configuration()).size
    val one = spark.read.format("graft-avro").load(dir)
      .where(col("lang") === "L2" && col("band") === 1)
    // id % 3 == 2 and id % 4 == 1 -> id % 12 == 5 -> 25 rows
    assert(one.count() === 25L)
    val (kept, tot) = scanOf(one).lastPlanned
    assert(tot === total)
    assert(kept < tot, s"expected directory pruning, planned $kept of $tot")
    // every surviving row really is from the one partition
    assert(one.select("id").as[Long].collect().forall(i => i % 12 == 5))
    // range predicate on an int partition column
    val range = spark.read.format("graft-avro").load(dir)
      .where(col("band") >= 2)
    assert(range.count() === 150L)
    assert(scanOf(range).lastPlanned._1 < total)
    // mixed partition + data predicate: prunes on the partition half,
    // stays lossless on the data half
    val mixed = spark.read.format("graft-avro").load(dir)
      .where(col("lang") === "L0" && col("id") < 30)
    assert(mixed.select("id").as[Long].collect().sorted.toSeq ===
      (0L until 30L).filter(_ % 3 == 0))
    assert(scanOf(mixed).lastPlanned._1 < total)
  }

  test("null partition values round-trip and IsNull prunes to them") {
    val dir = tempDir()
    val df = spark.range(40).select(col("id"),
      when(col("id") % 4 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("g"), (col("id") % 2).cast("string"))).as("grp"))
    AvroSink.writePartitioned(df, dir, Seq("grp"), overwrite = true)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.where(col("grp").isNull).count() === 10L)
    val nn = back.where(col("grp").isNotNull)
    assert(nn.count() === 30L)
    // exact expectation (the r16 ADVICE caught a tautological
    // disjunction here): IsNull must prune to EXACTLY the null-marker
    // directory's files out of the full listing
    val conf = new org.apache.hadoop.conf.Configuration()
    val totalFiles = AvroDsv2.listFiles(dir, conf).size
    val nullDirFiles = AvroDsv2.listFiles(
      s"$dir/grp=${AvroPartitions.NullMarker}", conf).size
    assert(nullDirFiles > 0 && nullDirFiles < totalFiles)
    val isn = back.where(col("grp").isNull)
    val isnScan = scanOf(isn)
    isnScan.planInputPartitions()
    assert(isnScan.lastPlanned === ((nullDirFiles, totalFiles)))
    assert(isn.select("id").as[Long].collect().forall(_ % 4 == 0))
  }

  test("append honors the committed layout; mismatches fail fast") {
    val dir = tempDir()
    val a = spark.range(10).select(col("id"),
      lit("x").as("lang"), lit(1).cast("int").as("band"),
      (col("id") * 1.0).as("score"))
    AvroSink.writePartitioned(a, dir, Seq("lang", "band"), overwrite = true)
    // compatible append lands in the same layout
    AvroSink.writePartitioned(
      spark.range(10, 15).select(col("id"), lit("y").as("lang"),
        lit(2).cast("int").as("band"), (col("id") * 1.0).as("score")),
      dir, Seq("lang", "band"))
    assert(spark.read.format("graft-avro").load(dir).count() === 15L)
    // an option-less append INHERITS the committed layout (r18: the
    // write builder falls back to the table's partition spec — what
    // lets a SQL INSERT INTO land partitioned): rows arrive in the
    // hive layout, never as flat containers
    AvroSink.write(spark.range(100, 103).select(col("id"),
      lit("z").as("lang"), lit(3).cast("int").as("band"),
      (col("id") * 1.0).as("score")), dir)
    assert(new java.io.File(dir, "lang=z/band=3").exists,
      "inherited-layout append must land in partition directories")
    assert(spark.read.format("graft-avro").load(dir).count() === 18L)
    // an append whose schema LACKS the partition columns still refuses
    // (the clustered write distribution resolves the partition column
    // first, so Spark's unresolved-attribute error fires)
    val ex = intercept[Exception] {
      AvroSink.write(spark.range(3).select(col("id"),
        (col("id") * 1.0).as("score")), dir)
    }
    assert(ex.getMessage.contains("not in schema") ||
      ex.getMessage.contains("Unable to resolve"), ex.getMessage)
    // partitioned append with a DIFFERENT spec is refused
    val ex2 = intercept[Exception] {
      AvroSink.writePartitioned(a, dir, Seq("band"))
    }
    assert(ex2.getMessage.contains("layout mismatch"), ex2.getMessage)
    // double partition columns are rejected up front
    val ex3 = intercept[IllegalArgumentException] {
      AvroSink.writePartitioned(a, tempDir(), Seq("score"))
    }
    assert(ex3.getMessage.contains("long/int/string/boolean"))
  }

  test("seen-log streaming tail over a partitioned layout admits any-directory arrivals") {
    val dir = tempDir()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_part_stream_ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_part_stream_out").toString
    def batch(lo: Int, hi: Int, lang: String): DataFrame =
      spark.range(lo, hi).select(col("id"), lit(lang).as("lang"))
    AvroSink.writePartitioned(batch(0, 10, "zz"), dir, Seq("lang"),
      overwrite = true)
    def drain(): Unit = {
      val q = spark.readStream.format("graft-avro")
        .option("graft.seenlog", "true").load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); ()
    }
    drain()
    // a LATE directory: lang=aa sorts BELOW lang=zz — the watermark
    // protocol would ignore it, the seen-log must admit it exactly once
    AvroSink.writePartitioned(batch(10, 15, "aa"), dir, Seq("lang"))
    drain()
    drain() // third drain: nothing new, nothing duplicated
    val back = spark.read.parquet(out)
    assert(back.count() === 15L)
    assert(back.where(col("lang") === "aa").count() === 5L)
    assert(back.select("id").distinct().count() === 15L)
    // partition column values survived the streaming path
    assert(back.schema.fields.map(_.name).contains("lang"))
  }

  test("watermark-mode streaming over a partitioned layout fails fast") {
    val dir = tempDir()
    AvroSink.writePartitioned(
      spark.range(5).select(col("id"), lit("en").as("lang")),
      dir, Seq("lang"), overwrite = true)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_part_wm_ckpt").toString
    val ex = intercept[Exception] {
      val q = spark.readStream.format("graft-avro").load(dir) // no seenlog
        .writeStream.format("memory").queryName("graft_part_wm")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("seen-log")), messages(ex).mkString("|"))
  }

  test("a string partition value colliding with the null marker is rejected") {
    val dir = tempDir()
    val ex = intercept[Exception] {
      AvroSink.writePartitioned(
        spark.range(2).select(col("id"),
          lit(AvroPartitions.NullMarker).as("grp")),
        dir, Seq("grp"), overwrite = true)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("null marker")),
      messages(ex).mkString("|"))
  }

  test("zone maps and blooms still prune DATA columns inside partitions") {
    val dir = tempDir()
    AvroSink.writePartitioned(
      spark.range(200).select(col("id"),
        (col("id") % 2).cast("int").as("band"),
        (col("id") % 50).as("m50")).repartitionByRange(4, col("id")),
      dir, Seq("band"), overwrite = true)
    val q = spark.read.format("graft-avro").load(dir)
      .where(col("band") === 0 && col("id") === 42L)
    assert(q.select("m50").as[Long].collect().toSeq === Seq(42L % 50))
    val (kept, tot) = scanOf(q).lastPlanned
    // band=1 dir pruned by partition value; remaining files pruned by
    // the id bloom/zone map down to the single container holding 42
    assert(kept === 1, s"planned $kept of $tot")
  }

  test("corrupt partition spec fails closed — never read or appended as flat") {
    val dir = tempDir()
    AvroSink.writePartitioned(fixture, dir, Seq("lang"), overwrite = true)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, AvroPartitions.SpecFile),
      "{definitely not json".getBytes)
    // read: a partitioned directory must not silently plan as a flat
    // (wrong-schema) table
    val exRead = intercept[Exception] {
      spark.read.format("graft-avro").load(dir).count()
    }
    assert(messages(exRead).exists(_.contains("unreadable partition spec")),
      messages(exRead).mkString("|"))
    // append: the layout-compatibility check must fail closed, not let
    // a flat container interleave into the partitioned layout
    val exWrite = intercept[Exception] {
      AvroSink.write(spark.range(3).select(col("id"), lit("x").as("lang"),
        lit(1).cast("int").as("band"), (col("id") * 1.0).as("score")), dir)
    }
    assert(messages(exWrite).exists(_.contains("unreadable partition spec")),
      messages(exWrite).mkString("|"))
    // a MISSING spec still reads as an ordinary flat table
    val flat = tempDir()
    AvroSink.write(spark.range(5).toDF("id"), flat, overwrite = true)
    assert(spark.read.format("graft-avro").load(flat).count() === 5L)
  }
}
