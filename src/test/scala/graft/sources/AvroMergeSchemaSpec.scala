package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r17: graft-avro schema-evolution read — `graft.mergeschema=true`
  * unions container header schemas by name, old containers null-filling
  * appended columns; type conflicts fail loudly.
  */
class AvroMergeSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_evo").toString

  test("merged read unions schemas; old containers null-fill new columns") {
    val dir = tempDir()
    AvroSink.write(spark.range(5).select(col("id"),
      concat(lit("a"), col("id").cast("string")).as("name")),
      dir, overwrite = true)
    AvroSink.write(spark.range(5, 8).select(col("id"),
      concat(lit("a"), col("id").cast("string")).as("name"),
      (col("id") * 10).as("score")),
      dir)
    val back = spark.read.format("graft-avro")
      .option("graft.mergeschema", "true").load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq
      === Seq(("id", "long"), ("name", "string"), ("score", "long")))
    val rows = back.orderBy("id").collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === s"a$id")
      if (id < 5) assert(r.isNullAt(2))
      else assert(r.getLong(2) === id * 10)
    }
    // filters on the appended column: SQL null semantics over old files
    assert(back.where(col("score").isNotNull).count() === 3L)
    assert(back.where(col("score").isNull).count() === 5L)
    assert(back.where(col("score") > 50).count() === 2L)
    // aggregate pushdown over the evolved column declines conservatively
    // (old sidecars lack its stats) but the answer is right
    val ag = back.agg(count(col("score")).as("n"), max(col("score")).as("m"))
    val a = ag.collect().head
    assert(a.getLong(0) === 3L && a.getLong(1) === 70L)
  }

  test("the default (non-merged) read keeps the head-file schema") {
    val dir = tempDir()
    AvroSink.write(spark.range(3).toDF("id"), dir, overwrite = true)
    AvroSink.write(spark.range(3, 5).select(col("id"),
      (col("id") * 2).as("extra")), dir)
    // the legacy contract: schema of the lexicographically FIRST file,
    // whichever batch that is — merging requires the explicit option
    val conf = new org.apache.hadoop.conf.Configuration()
    val head = AvroDsv2.listFiles(dir, conf).head._1
    val r = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](
      AvroDsv2.openSeekable(head),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val headNames = try {
      import scala.jdk.CollectionConverters._
      r.getSchema.getFields.asScala.map(_.name).toSeq
    } finally r.close()
    val plain = spark.read.format("graft-avro").load(dir)
    assert(plain.schema.fieldNames.toSeq === headNames)
    assert(plain.count() === 5L) // files missing a head-schema column null-fill
  }

  test("type conflicts fail loudly, never silently widen") {
    val dir = tempDir()
    AvroSink.write(spark.range(3).select(col("id"), lit(1L).as("v")),
      dir, overwrite = true)
    AvroSink.write(spark.range(3, 5).select(col("id"),
      lit("s").as("v")), dir)
    val ex = intercept[Exception] {
      spark.read.format("graft-avro")
        .option("graft.mergeschema", "true").load(dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("type conflicts")),
      messages(ex).mkString("|"))
  }

  test("merged read composes with the partitioned layout") {
    val dir = tempDir()
    val base = spark.range(20).select(col("id"),
      concat(lit("L"), (col("id") % 2).cast("string")).as("lang"))
    AvroSink.writePartitioned(base, dir, Seq("lang"), overwrite = true)
    AvroSink.writePartitioned(
      spark.range(20, 30).select(col("id"),
        concat(lit("L"), (col("id") % 2).cast("string")).as("lang"),
        (col("id") + 100).as("w")),
      dir, Seq("lang"))
    val back = spark.read.format("graft-avro")
      .option("graft.mergeschema", "true").load(dir)
    // data columns merged, partition column still appended LAST
    assert(back.schema.fieldNames.toSeq === Seq("id", "w", "lang"))
    assert(back.count() === 30L)
    assert(back.where(col("w").isNotNull).count() === 10L)
    // partition pruning still exact on the merged read
    assert(back.where(col("lang") === "L1").count() === 15L)
  }
}
