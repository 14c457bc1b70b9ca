package graft.ops

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._

class SkewSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAggregate equals plain groupBy aggregation") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "cold" + i else "HOT", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("k").collect()
    val salted = Skew.saltedAggregate(df, Seq("k"), col("v"), salt = 8,
      Seq((sum(col("v")), (c: org.apache.spark.sql.Column) => sum(c), "sum_v"),
        (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c), "n")))
      .orderBy("k").collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) == s.getString(0))
      assert(approx(p.getDouble(1), s.getDouble(1), 1e-6))
      assert(p.getLong(2) == s.getLong(2))
    }
  }

  test("saltedJoin output equals the plain join") {
    val left = (1 to 300).map(i => (if (i % 5 == 0) i % 7 else 3, i)).toDF("k", "lv")
    val right = (0 to 6).map(k => (k, s"dim$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).orderBy("k", "lv").collect()
    val salted = Skew.saltedJoin(left, right, Seq("k"), col("lv"), salt = 4)
      .select("k", "lv", "rv").orderBy("k", "lv").collect()
    assert(plain.map(_.toString).toSeq == salted.map(_.toString).toSeq)
  }

  test("readAny dispatches by extension and rejects legacy xls explicitly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_readany").toString
    val df = Seq((1, "a"), (2, "b")).toDF("id", "s")
    df.write.mode("overwrite").parquet(s"$tmp/t.parquet")
    assert(Sources.readAny(spark, s"$tmp/t.parquet").count() == 2)
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$tmp/t.csv")
    assert(Sources.readAny(spark, s"$tmp/t.csv").count() == 2)
    intercept[java.io.FileNotFoundException] { Sources.readAny(spark, "/x/y.xls") }
    intercept[IllegalArgumentException] { Sources.readAny(spark, "/x/y.avro") }
    // an OLE2-magic file RENAMED to .xlsx routes to the BIFF8 reader via
    // the magic dispatch; a truncated one fails with a clear OLE2 message,
    // not an opaque zip-parse error (full .xls reads live in XlsSpec)
    val ole = java.nio.file.Paths.get(tmp, "legacy.xlsx")
    java.nio.file.Files.write(ole,
      Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    val e = intercept[IllegalArgumentException] {
      Sources.readAny(spark, ole.toString)
    }
    assert(e.getMessage.contains("OLE2"))
    // random non-zip bytes named .xlsx: clear not-a-workbook error
    val junk = java.nio.file.Paths.get(tmp, "junk.xlsx")
    java.nio.file.Files.write(junk, "not a zip".getBytes)
    intercept[IllegalArgumentException] { Sources.readAny(spark, junk.toString) }
  }

  test("S2 xlsx round-trip: write then read preserves values, types, and nulls") {
    import graft.sources.Xlsx
    val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    val df = Seq(
      (1L, Some(12.5), Some("plain")),
      (2L, None, Some("needs <escaping> & \"quotes\"")),
      (3L, Some(-0.75), None)).toDF("id", "score", "note")
    Xlsx.write(df, s"$tmp/t.xlsx")
    val back = Sources.readAny(spark, s"$tmp/t.xlsx")
    assert(back.columns.toSeq == Seq("id", "score", "note"))
    assert(back.schema("id").dataType.typeName == "double")    // numeric inference
    assert(back.schema("score").dataType.typeName == "double")
    assert(back.schema("note").dataType.typeName == "string")
    val rows = back.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getDouble(1) == 12.5
      && rows(1).getString(2) == "needs <escaping> & \"quotes\"")
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(2))
    assert(rows(2).getDouble(1) == -0.75)
  }

  test("S2 xlsx multi-sheet round-trip: select by index and by name, in workbook order") {
    import graft.sources.Xlsx
    val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx_multi").toString
    val metrics = Seq((1L, 0.5), (2L, 1.25)).toDF("id", "score")
    val labels = Seq(("a", "alpha"), ("b", "beta & <gamma>")).toDF("code", "label")
    Xlsx.writeSheets(Seq("Metrics" -> metrics, "Labels" -> labels), s"$tmp/wb.xlsx")
    assert(Xlsx.sheetNames(s"$tmp/wb.xlsx") == Seq("Metrics", "Labels"))
    // default read = first sheet (pandas sheet_name=0)
    assert(Sources.readExcel(spark, s"$tmp/wb.xlsx").columns.toSeq == Seq("id", "score"))
    val byIdx = Sources.readExcel(spark, s"$tmp/wb.xlsx", 1).orderBy("code").collect()
    assert(byIdx.map(_.getString(1)).toSeq == Seq("alpha", "beta & <gamma>"))
    val byName = Sources.readExcel(spark, s"$tmp/wb.xlsx", "Metrics").orderBy("id").collect()
    assert(byName.map(_.getDouble(1)).toSeq == Seq(0.5, 1.25))
    // unknown selectors fail with the inventory in the message
    val e = intercept[IllegalArgumentException] {
      Sources.readExcel(spark, s"$tmp/wb.xlsx", "Nope")
    }
    assert(e.getMessage.contains("Metrics"))
    intercept[IllegalArgumentException] {
      Sources.readExcel(spark, s"$tmp/wb.xlsx", 2)
    }
  }

  test("S2 xlsx reads a real table identically to its source (rows-only query fidelity)") {
    import graft.sources.Xlsx
    val region = graft.Tables.load(spark, "/root/testdata/sf0.001", "region")
    val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx_region").toString
    Xlsx.write(region.orderBy("r_regionkey"), s"$tmp/region.xlsx")
    val back = Sources.readExcel(spark, s"$tmp/region.xlsx")
      .select(org.apache.spark.sql.functions.col("r_regionkey").cast("long").as("r_regionkey"),
        org.apache.spark.sql.functions.col("r_name"))
      .orderBy("r_regionkey").collect()
    val orig = region.select("r_regionkey", "r_name").orderBy("r_regionkey").collect()
    assert(back.toSeq == orig.toSeq)
  }
}
