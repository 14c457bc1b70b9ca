package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r17: partition-predicate DELETE — whole-file removal through the
  * path-value evaluation, data-column predicates refused, containers
  * never rewritten.
  */
class AvroDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_del").toString

  private def fixture = spark.range(90).select(
    col("id"),
    when(col("id") % 9 === 0, lit(null).cast("string"))
      .otherwise(concat(lit("L"), (col("id") % 3).cast("string"))).as("lang"),
    (col("id") * 2).as("v"))

  test("partition delete drops exactly the matching directories") {
    val dir = tempDir()
    AvroSink.writePartitioned(fixture, dir, Seq("lang"), overwrite = true)
    // survivors' byte sizes, to prove no container is rewritten
    val conf = new org.apache.hadoop.conf.Configuration()
    val before = AvroDsv2.listFiles(dir, conf).toMap
    AvroSink.deleteWhere(spark, dir, col("lang") === "L1")
    val after = AvroDsv2.listFiles(dir, conf)
    assert(after.forall { case (p, len) => before(p) === len },
      "survivors must be byte-identical")
    assert(!new java.io.File(dir, "lang=L1").exists,
      "the emptied partition directory must be retired")
    val back = spark.read.format("graft-avro").load(dir)
    val expected = fixture.where(col("lang").isNull || col("lang") =!= "L1")
      .collect().map(_.toString).sorted.toSeq
    assert(back.select("id", "v", "lang").collect()
      .map(r => Seq(r.get(2), r.get(0), r.get(1))).map(_.toString).sorted.size
      === expected.size)
    assert(back.count() === fixture.where(
      col("lang").isNull || col("lang") =!= "L1").count())
    // idempotent: re-running the same delete is a no-op
    AvroSink.deleteWhere(spark, dir, col("lang") === "L1")
    assert(spark.read.format("graft-avro").load(dir).count() === back.count())
  }

  test("SQL null semantics: only definitely-TRUE partitions delete") {
    val dir = tempDir()
    AvroSink.writePartitioned(fixture, dir, Seq("lang"), overwrite = true)
    // lang < 'L1' is UNKNOWN for null partitions -> they must survive
    AvroSink.deleteWhere(spark, dir, col("lang") < "L1")
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.where(col("lang").isNull).count() === 10L)
    assert(back.where(col("lang") === "L0").count() === 0L)
    assert(back.count() === fixture.where(
      col("lang").isNull || col("lang") >= "L1").count())
    // IS NULL deletes exactly the null-marker directory
    AvroSink.deleteWhere(spark, dir, col("lang").isNull)
    assert(spark.read.format("graft-avro").load(dir)
      .where(col("lang").isNull).count() === 0L)
  }

  test("data-column and flat-table deletes are refused loudly") {
    val dir = tempDir()
    AvroSink.writePartitioned(fixture, dir, Seq("lang"), overwrite = true)
    val ex = intercept[UnsupportedOperationException] {
      AvroSink.deleteWhere(spark, dir, col("v") > 10)
    }
    assert(ex.getMessage.contains("partition columns"), ex.getMessage)
    // mixed predicate: the data-column conjunct poisons the whole delete
    val ex2 = intercept[UnsupportedOperationException] {
      AvroSink.deleteWhere(spark, dir, col("lang") === "L1" && col("v") > 10)
    }
    assert(ex2.getMessage.contains("partition columns"), ex2.getMessage)
    // nothing was deleted by the refused attempts
    assert(spark.read.format("graft-avro").load(dir).count() === 90L)
    // a cast-wrapped partition column still translates: an int
    // partition probed with a LONG literal analyzes to
    // Cast(band as bigint) = 1L and must delete, not refuse
    val dirI = tempDir()
    AvroSink.writePartitioned(
      spark.range(20).select(col("id"), (col("id") % 2).cast("int").as("band")),
      dirI, Seq("band"), overwrite = true)
    AvroSink.deleteWhere(spark, dirI, col("band") === 1L)
    assert(spark.read.format("graft-avro").load(dirI).count() === 10L)
    assert(spark.read.format("graft-avro").load(dirI)
      .where(col("band") === 1).count() === 0L)
    // flat table: no partition columns at all
    val flat = tempDir()
    AvroSink.write(spark.range(5).toDF("id"), flat, overwrite = true)
    val ex3 = intercept[UnsupportedOperationException] {
      AvroSink.deleteWhere(spark, flat, col("id") === 3)
    }
    assert(ex3.getMessage.contains("partition columns"), ex3.getMessage)
  }
}
