package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r18: row-level copy-on-write UPDATE — literal assignments applied to
  * exactly the definitely-TRUE rows, only may-match containers rewritten,
  * sidecars regenerated, misdeclarations refused loudly.
  */
class AvroUpdateSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_upd").toString

  private val conf = new org.apache.hadoop.conf.Configuration()

  private def md5Of(p: String): String = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(
        if (p.startsWith("file:")) p else s"file:$p")))
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
  }
  private def md5s(dir: String): Map[String, String] =
    AvroDsv2.listFiles(dir, conf).map { case (p, _) => p -> md5Of(p) }.toMap

  test("update rewrites only may-match files; values change exactly where TRUE") {
    val dir = tempDir()
    AvroSink.write(
      spark.range(4000).select(col("id"), (col("id") % 100).as("v"),
          concat(lit("u"), col("id")).as("name"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      dir, overwrite = true)
    val before = md5s(dir)
    AvroSink.updateWhere(spark, dir,
      col("id") >= 1450 && col("id") <= 1550,
      Map("name" -> "[REDACTED]", "v" -> null))
    val after = md5s(dir)
    assert(after.keySet === before.keySet)
    assert(after.count { case (p, h) => before(p) == h } === 3,
      "only the one may-match container rewrites")
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.count() === 4000L, "UPDATE never changes the row count")
    assert(back.where(col("name") === "[REDACTED]").count() === 101L)
    assert(back.where(col("id").between(1450, 1550) && col("v").isNotNull)
      .count() === 0L, "matched rows take the null assignment")
    assert(back.where(!col("id").between(1450, 1550) &&
      col("name") === "[REDACTED]").count() === 0L,
      "non-matching rows are untouched")
    // regenerated sidecar: min/max/count pushdown reflects the update
    val agg = back.groupBy().count()
    assert(agg.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(agg.collect().head.getLong(0) === 4000L)
    // a no-match update leaves every container byte-identical
    val mid = md5s(dir)
    AvroSink.updateWhere(spark, dir, col("id") === -1L,
      Map("name" -> "x"))
    assert(md5s(dir) === mid)
  }

  test("null semantics: UNKNOWN rows are not updated") {
    val dir = tempDir()
    AvroSink.write(spark.range(100).select(col("id"),
        when(col("id") % 10 === 0, lit(null).cast("long"))
          .otherwise(col("id")).as("v")).coalesce(1),
      dir, overwrite = true)
    AvroSink.updateWhere(spark, dir, col("v") < 50, Map("v" -> 999L))
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.where(col("v").isNull).count() === 10L,
      "UNKNOWN rows must stay untouched")
    assert(back.where(col("v") === 999L).count() === 45L)
  }

  test("partitioned update: partition conjunct selects directories; assignments on partition columns refuse") {
    val dir = tempDir()
    val df = spark.range(90).select(col("id"),
      concat(lit("L"), (col("id") % 3).cast("string")).as("lang"),
      (col("id") * 2).as("v"))
    AvroSink.writePartitioned(df, dir, Seq("lang"), overwrite = true)
    val before = md5s(dir)
    AvroSink.updateWhere(spark, dir,
      col("lang") === "L1" && col("v") > 100, Map("v" -> 0L))
    val after = md5s(dir)
    before.foreach { case (p, h) =>
      if (!p.contains("lang=L1"))
        assert(after.get(p).contains(h), s"non-matching partition touched: $p")
    }
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.where(col("v") === 0L).count() ===
      df.where(col("lang") === "L1" && col("v") > 100).count() +
        df.where(col("v") === 0L).count())
    val ex = intercept[IllegalArgumentException] {
      AvroSink.updateWhere(spark, dir, col("v") > 0, Map("lang" -> "x"))
    }
    assert(ex.getMessage.contains("partition column"), ex.getMessage)
  }

  test("type validation refuses mismatched literals; unknown columns refuse") {
    val dir = tempDir()
    AvroSink.write(spark.range(10).select(col("id"),
      (col("id") * 1.5).as("score")).coalesce(1), dir, overwrite = true)
    val ex = intercept[IllegalArgumentException] {
      AvroSink.updateWhere(spark, dir, col("id") > 5, Map("score" -> "oops"))
    }
    assert(ex.getMessage.contains("is double"), ex.getMessage)
    intercept[IllegalArgumentException] {
      AvroSink.updateWhere(spark, dir, col("id") > 5, Map("nope" -> 1L))
    }
    // int-widening into a long column is exact and accepted
    AvroSink.updateWhere(spark, dir, col("id") === 3L, Map("id" -> 77))
    assert(spark.read.format("graft-avro").load(dir)
      .where(col("id") === 77L).count() === 1L)
  }
}
