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
