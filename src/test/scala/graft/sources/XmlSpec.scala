package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class XmlSpec extends SparkSpec {
  import spark.implicits._

  private val dir = java.nio.file.Files
    .createTempDirectory("graft_xml").toString

  test("xml round trip preserves values, types via cast-back") {
    val df = Seq((1, "alpha", 3.5), (2, "beta & <gamma>", -0.25))
      .toDF("id", "name", "v")
    Sources.writeXml(df, s"$dir/t1", rowTag = "rec")
    val back = Sources.readXml(spark, s"$dir/t1", rowTag = "rec")
      .select(col("id").cast("int"), col("name"), col("v").cast("double"))
      .orderBy("id")
    assert(back.collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("xml special characters survive escaping") {
    val df = Seq((1, "a<b>&\"quoted\"' text")).toDF("id", "s")
    Sources.writeXml(df, s"$dir/t2")
    val back = Sources.readXml(spark, s"$dir/t2")
    assert(back.select("s").head().getString(0) === "a<b>&\"quoted\"' text")
  }

  test("xml null columns come back null") {
    val df = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("id", "s")
    Sources.writeXml(df, s"$dir/t3")
    val back = Sources.readXml(spark, s"$dir/t3").orderBy("id").collect()
    assert(back(0).isNullAt(back(0).fieldIndex("s")))
    assert(back(1).getAs[String]("s") === "x")
  }
}
