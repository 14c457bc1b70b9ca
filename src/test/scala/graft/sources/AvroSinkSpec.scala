package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class AvroSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_sink").toString

  test("parallel sink round-trips rows across one file per partition") {
    val dir = tempDir()
    val df = spark.range(1000).select(
      col("id"),
      (col("id") % 5).cast("int").as("band"),
      (col("id") / 8.0).as("score"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("d"),
        col("id").cast("string")).as("label"))
      .repartition(4)
    AvroSink.write(df, dir)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".avro")) === 4, files.mkString(","))
    assert(files.count(_.endsWith(".stats.json")) === 4)
    assert(files.contains("_SUCCESS"))
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.count() === 1000)
    assert(back.select("id").as[Long].collect().sorted.toSeq === (0L until 1000L))
  }

  test("overwrite replaces previous files; stats sidecars carry min/max/nulls") {
    val dir = tempDir()
    AvroSink.write(spark.range(100).select(col("id")).repartition(8), dir)
    AvroSink.write(spark.range(10).select(col("id"),
      org.apache.spark.sql.functions.when(col("id") % 2 === 0, col("id") / 2.0)
        .as("half")).repartition(1), dir, overwrite = true)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.count() === 10)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val statsFile = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".stats.json")).get
    val st = om.readTree(statsFile)
    assert(st.get("rows").asLong === 10L)
    assert(st.get("cols").get("id").get("min").asDouble === 0.0)
    assert(st.get("cols").get("id").get("max").asDouble === 9.0)
    assert(st.get("cols").get("half").get("nulls").asLong === 5L)
  }

  test("sidecar stats SKIP whole files under pushed filters, losslessly") {
    val dir = tempDir()
    // range-band by id so each of the 5 files gets a tight [min, max]
    val df = spark.range(1000).select(col("id"),
      (col("id") % 7).cast("int").as("m7"))
      .repartitionByRange(5, col("id"))
    AvroSink.write(df, dir)
    def scanOf(d: org.apache.spark.sql.DataFrame): AvroScan = {
      val scans = d.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }
      scans.head.asInstanceOf[AvroScan]
    }
    val filtered = spark.read.format("graft-avro").load(dir)
      .where(col("id") >= 300 && col("id") < 500)
    val rows = filtered.select("id").as[Long].collect().sorted.toSeq
    assert(rows === (300L until 500L), "pruning lost or duplicated rows")
    val scan = scanOf(filtered)
    val (kept, total) = scan.lastPlanned
    assert(total === 5)
    assert(kept < total && kept >= 1,
      s"expected file skipping, planned $kept of $total")
    // a filter nothing satisfies prunes everything
    val none = spark.read.format("graft-avro").load(dir)
      .where(col("id") > 100000)
    assert(none.count() === 0)
    assert(scanOf(none).lastPlanned._1 === 0)
    // files WITHOUT sidecars are never skipped
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".stats.json")).foreach(_.delete())
    val noStats = spark.read.format("graft-avro").load(dir)
      .where(col("id") >= 300 && col("id") < 500)
    assert(noStats.select("id").as[Long].collect().sorted.toSeq ===
      (300L until 500L))
    assert(scanOf(noStats).lastPlanned === ((5, 5)))
  }

  test("df.write.format(graft-avro): append and overwrite through DSv2") {
    val dir = tempDir()
    // first write to an empty dir needs the schema option (no file to
    // infer from) — exactly what AvroSink.write passes
    val a = spark.range(50).select(col("id"))
    a.write.format("graft-avro").option("graft.schema", a.schema.json)
      .mode("append").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() === 50)
    // append to EXISTING data infers from the files — no option needed
    spark.range(50, 80).select(col("id"))
      .write.format("graft-avro").mode("append").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.select("id").as[Long].collect().sorted.toSeq === (0L until 80L))
    // overwrite truncates the previous files
    spark.range(7).select(col("id"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() === 7)
    assert(new java.io.File(dir).listFiles().map(_.getName)
      .count(_.endsWith(".avro.tmp")) === 0, "temps must not survive commit")
  }

  test("aborted job leaves no readable partial files") {
    val dir = tempDir()
    val boom = org.apache.spark.sql.functions.udf { (id: Long) =>
      if (id == 999L) throw new RuntimeException("boom"); id
    }
    val df = spark.range(1000).select(boom(col("id")).as("id")).repartition(4)
    intercept[Exception] { AvroSink.write(df, dir) }
    val left = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName)
    assert(left.count(_.endsWith(".avro")) === 0,
      s"aborted job left readable files: ${left.mkString(",")}")
    assert(!left.contains("_SUCCESS"))
    assert(left.count(_.endsWith(".avro.tmp")) === 0,
      s"aborted job left temps: ${left.mkString(",")}")
  }

  test("failed OVERWRITE keeps the previous dataset intact") {
    val dir = tempDir()
    AvroSink.write(spark.range(100).select(col("id")).repartition(2), dir)
    val boom = org.apache.spark.sql.functions.udf { (id: Long) =>
      if (id == 5L) throw new RuntimeException("boom"); id
    }
    intercept[Exception] {
      AvroSink.write(spark.range(10).select(boom(col("id")).as("id")),
        dir, overwrite = true)
    }
    // truncation is deferred to commit, so the old 100 rows survive
    assert(spark.read.format("graft-avro").load(dir).count() === 100)
  }

  test("long values beyond 2^53 stay exact in pushdown and zone maps") {
    val dir = tempDir()
    val p53 = 9007199254740992L // 2^53; p53 and p53+1 round to the SAME double
    val df = Seq(p53 - 1, p53, p53 + 1, p53 + 3).toDF("v").repartition(1)
    AvroSink.write(df, dir)
    // sidecar must carry exact longs, not rounded doubles
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val st = om.readTree(new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".stats.json")).get)
    assert(st.get("cols").get("v").get("min").isIntegralNumber)
    assert(st.get("cols").get("v").get("max").asLong === p53 + 3)
    val r = spark.read.format("graft-avro").load(dir)
    // equality at p53+1: a double round-trip would also match p53 (same
    // rounded value) or skip the row entirely; exact compare returns 1
    assert(r.where(col("v") === (p53 + 1)).count() === 1)
    assert(r.where(col("v") === (p53 + 2)).count() === 0)
    // file-level pruning at the rounded boundary must not skip the file:
    // max = p53+3; predicate v >= p53+2 is satisfiable
    assert(r.where(col("v") >= (p53 + 2)).count() === 1)
    assert(r.where(col("v") > (p53 + 3)).count() === 0)
  }

  test("string and null-aware pruning stays conservative") {
    val dir = tempDir()
    val df = Seq(("alpha", Some(1L)), ("beta", None), ("gamma", Some(3L)))
      .toDF("name", "v").repartition(1)
    AvroSink.write(df, dir)
    val r = spark.read.format("graft-avro").load(dir)
    // string range: 'zeta' > max('gamma') -> file skipped
    assert(r.where(col("name") === "zeta").count() === 0)
    // IsNull matches (nulls recorded), IsNotNull matches (rows > nulls)
    assert(r.where(col("v").isNull).count() === 1)
    assert(r.where(col("v").isNotNull).count() === 2)
  }
}
