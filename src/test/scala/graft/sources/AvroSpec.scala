package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class AvroSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    s"$dir/$name"
  }

  test("all five primitive types and nulls round-trip losslessly") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("b", BooleanType)))
    val rows = Seq(
      Row(1L, 2, 3.5, "x", true),
      Row(null, null, null, null, null),
      Row(-9L, 0, -0.25, "", false))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val p = tmp("t.avro")
    Avro.write(df, p)
    val back = Avro.read(spark, p)
    assert(back.schema === schema.copy(fields =
      schema.fields.map(_.copy(nullable = true))))
    assert(back.orderBy("s").collect().toSeq ===
      df.orderBy("s").collect().toSeq)
  }

  test("deflate-compressed container is denser than the raw rows") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, "constant_payload_" + (i % 3)))
      .toDF("id", "s")
    val p = tmp("c.avro")
    Avro.write(df, p)
    val size = new java.io.File(p).length()
    assert(size > 0 && size < 2000 * 20, s"container size $size")
  }

  test("unsupported column types fail loudly at write time") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      Avro.write(df, tmp("bad.avro"))
    }
    assert(e.getMessage.contains("arr"))
  }
}
