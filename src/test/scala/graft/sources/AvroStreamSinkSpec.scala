package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** r17: exactly-once DSv2 streaming APPEND for graft-avro — epoch-
  * deterministic names + replay cleanup, restart-mid-epoch safe.
  */
class AvroStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_ssink").toString

  test("streaming append equals the batch content, exactly once across a replayed epoch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val dir = tempDir(); val ckpt = tempDir()
    def drain(): Unit = {
      val q = mem.toDF().select(col("value").as("id"),
          (col("value") * 2).as("v"))
        .writeStream.format("graft-avro")
        .option("path", dir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData(0L until 10L: _*)
    drain()
    val afterFirst = spark.read.format("graft-avro").load(dir)
    assert(afterFirst.count() === 10L)

    // simulate a crash BETWEEN the sink's epoch commit and the engine's
    // commit-log write: drop the last commit-log entry, so the restart
    // REPLAYS that epoch against the already-committed files — the
    // replay must replace, not duplicate
    val commits = new java.io.File(ckpt, "commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val doomedCrc = new java.io.File(new java.io.File(ckpt, "commits"),
      s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (doomedCrc.exists) doomedCrc.delete() // local-fs checksum shadow

    mem.addData(10L until 15L: _*)
    drain()
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.count() === 15L, "replayed epoch must not duplicate rows")
    assert(back.select("id").as[Long].collect().sorted.toSeq ===
      (0L until 15L))
    assert(back.where(col("v") =!= col("id") * 2).count() === 0L)
    // every committed file carries a sidecar; no temp survives
    val files = new java.io.File(dir).listFiles().map(_.getName)
    val avros = files.filter(_.endsWith(".avro"))
    assert(avros.nonEmpty)
    avros.foreach(a => assert(files.contains(s"$a.stats.json"), a))
    assert(!files.exists(_.endsWith(".avro.tmp")))
  }

  test("partitioned streaming append lands the hive layout and stays readable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val dir = tempDir(); val ckpt = tempDir()
    val q = mem.toDF().select(col("value").as("id"),
        concat(lit("L"), (col("value") % 2).cast("string")).as("lang"))
      .writeStream.format("graft-avro")
      .option("path", dir).option("checkpointLocation", ckpt)
      .option("graft.partitionby", "lang")
      .trigger(Trigger.AvailableNow())
    mem.addData(0L until 8L: _*)
    val h = q.start(); h.awaitTermination()
    assert(new java.io.File(dir, "lang=L0").isDirectory)
    assert(new java.io.File(dir, AvroPartitions.SpecFile).exists)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fieldNames.toSeq === Seq("id", "lang"))
    assert(back.count() === 8L)
    assert(back.where(col("lang") === "L1").count() === 4L)
    // a second epoch appends without clobbering the first
    mem.addData(8L until 12L: _*)
    val h2 = q.start(); h2.awaitTermination()
    assert(spark.read.format("graft-avro").load(dir).count() === 12L)
  }

  test("aggregate pushdown and zone maps work over stream-written files") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val dir = tempDir(); val ckpt = tempDir()
    mem.addData(0L until 100L: _*)
    val q = mem.toDF().select(col("value").as("id"))
      .writeStream.format("graft-avro")
      .option("path", dir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val agged = spark.read.format("graft-avro").load(dir)
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"),
        max(col("id")).as("m"))
    assert(agged.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    val r = agged.collect().head
    assert(r.getLong(0) === 100L && r.getLong(1) === 4950L
      && r.getLong(2) === 99L)
  }
}
