package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, concat, lit, when}

class AvroDsv2Spec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(rows: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_dsv2")
    val path = s"$dir/data.avro"
    val df = spark.range(rows).select(
      col("id"),
      (col("id") * 2).cast("int").as("twice"),
      concat_str,
      (col("id") % 3 === 0).as("fizz"),
      when(col("id") % 7 === 0, lit_null).otherwise(col("id") / 4.0).as("quarter"))
    Avro.write(df, path)
    path
  }
  private def concat_str = concat(lit("row#"), col("id").cast("string")).as("label")
  private def lit_null = lit(null).cast("double")

  test("split read returns every row exactly once across many partitions") {
    val path = writeFixture(2000)
    val df = spark.read.format("graft-avro")
      .option("graft.splitbytes", 512).load(path)
    assert(df.rdd.getNumPartitions > 1,
      s"forced 512-byte splits must yield multiple partitions on ${new java.io.File(path).length()} bytes")
    assert(df.count() === 2000)
    val ids = df.select("id").as[Long].collect().sorted
    assert(ids.toSeq === (0L until 2000L))
    // values and nulls survive the round trip
    val r7 = df.where(col("id") === 7).head()
    assert(r7.isNullAt(r7.fieldIndex("quarter")))
    val r8 = df.where(col("id") === 8).head()
    assert(r8.getAs[Double]("quarter") === 2.0)
    assert(r8.getAs[String]("label") === "row#8")
    assert(r8.getAs[Int]("twice") === 16)
  }

  test("one-split and many-split reads agree") {
    val path = writeFixture(500)
    val whole = spark.read.format("graft-avro").load(path)
      .orderBy("id").collect()
    val split = spark.read.format("graft-avro")
      .option("graft.splitbytes", 300).load(path)
      .orderBy("id").collect()
    assert(whole.toSeq === split.toSeq)
  }

  test("column pruning reaches the scan") {
    val path = writeFixture(100)
    val df = spark.read.format("graft-avro").load(path).select("label")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<label:string>"),
      s"pruned schema missing from scan:\n$plan")
    assert(df.collect().map(_.getString(0)).take(3).forall(_.startsWith("row#")))
  }

  private def batchScanOf(df: org.apache.spark.sql.DataFrame): AvroScan = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    assert(scans.nonEmpty, "no BatchScanExec in plan")
    scans.head.asInstanceOf[AvroScan]
  }

  test("filters push to the scan and skip rows before conversion") {
    val path = writeFixture(1000)
    val df = spark.read.format("graft-avro")
      .option("graft.splitbytes", 512).load(path)
      .where(col("id") >= 900 && col("quarter").isNotNull &&
        col("label") =!= "row#999")
    val scan = batchScanOf(df)
    assert(scan.pushed.nonEmpty, "expected pushed filters on the scan")
    val pushedStr = scan.pushed.mkString(";")
    assert(pushedStr.contains("IsNotNull"), s"pushed: $pushedStr")
    assert(pushedStr.contains("GreaterThanOrEqual"), s"pushed: $pushedStr")
    // correctness under pushdown: 900..999 minus %7==0 (null quarter:
    // 903,910,...,994 -> 14 rows) minus id 999
    val ids = df.select("id").as[Long].collect().sorted
    val expected = (900L until 1000L)
      .filter(i => i % 7 != 0 && i != 999L)
    assert(ids.toSeq === expected)
  }

  test("pushdown agrees with the unfiltered read on every predicate shape") {
    val path = writeFixture(300)
    val raw = spark.read.format("graft-avro").load(path).collect()
      .map(r => (r.getLong(0), Option(r.get(4))))
    val preds = Seq(
      col("id") === 42L,
      col("twice") > 100 && col("twice") <= 200,
      col("fizz") === true,
      col("quarter").isNull,
      col("label").startsWith("row#1"),
      col("id").isin(1L, 2L, 250L) || col("twice") < 6)
    preds.foreach { p =>
      val pushedDf = spark.read.format("graft-avro")
        .option("graft.splitbytes", 256).load(path).where(p)
      assert(batchScanOf(pushedDf).pushed.nonEmpty, s"nothing pushed for $p")
      val viaScan = pushedDf.select("id").as[Long].collect().sorted.toSeq
      val viaSpark = spark.read.format("graft-avro").load(path)
        .where(p).select("id").as[Long].collect().sorted.toSeq
      assert(viaScan === viaSpark, s"pushdown diverged for $p")
    }
    assert(raw.length === 300)
  }

  test("reads resolve through the Hadoop FileSystem API (explicit file:// URI)") {
    val path = writeFixture(50)
    val df = spark.read.format("graft-avro").load(s"file://$path")
    assert(df.count() === 50)
    // and a directory of containers expands to its .avro children
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_dir")
    val a = spark.range(10).select(col("id"))
    val b = spark.range(10, 25).select(col("id"))
    Avro.write(a, s"$dir/a.avro")
    Avro.write(b, s"$dir/b.avro")
    val both = spark.read.format("graft-avro").load(dir.toString)
    assert(both.select("id").as[Long].collect().sorted.toSeq === (0L until 25L))
  }

  test("schema is inferred from the container header") {
    val path = writeFixture(10)
    val sch = spark.read.format("graft-avro").load(path).schema
    assert(sch.fieldNames.toSeq ===
      Seq("id", "twice", "label", "fizz", "quarter"))
    assert(sch("id").dataType.typeName === "long")
    assert(sch("twice").dataType.typeName === "integer")
    assert(sch("quarter").dataType.typeName === "double")
    assert(sch("fizz").dataType.typeName === "boolean")
  }
}
