package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** The graft-avro MICRO_BATCH_READ tail: file-name-watermark offsets,
  * per-trigger directory re-list, and the same split/prune/filter path
  * as the batch scan.
  */
class AvroStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String, name: String, ids: Range): Unit =
    Avro.write(spark.range(ids.head, ids.last + 1).select(
      col("id"), (col("id") % 5).cast("int").as("m")), s"$dir/$name")

  /** One AvailableNow run into an append parquet sink (the memory sink
    * cannot recover a checkpoint, and restart recovery is exactly what
    * this spec proves). Returns the ids the sink holds afterwards.
    */
  private def runOnce(dir: String, ckpt: String, out: String): Seq[Long] = {
    val q = spark.readStream.format("graft-avro")
      .option("graft.splitbytes", 512).load(dir)
      .select("id")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(out).as[Long].collect().sorted.toSeq
  }

  test("tail reads new files only, exactly once, across restarts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_stream").toString
    val ckpt = s"$dir/_ckpt"; val out = s"$dir/_out"
    writeBatch(dir, "b0.avro", 0 until 100)
    assert(runOnce(dir, ckpt, out) === (0L until 100L),
      "first run reads the initial file")

    // a second run from the SAME checkpoint must append ONLY the new file
    writeBatch(dir, "b1.avro", 100 until 250)
    assert(runOnce(dir, ckpt, out) === (0L until 250L),
      "restart must pick up exactly b1.avro, no re-read, no gap")

    // late-file contract: a name sorting BELOW the watermark is ignored
    writeBatch(dir, "a9.avro", 900 until 910)
    assert(runOnce(dir, ckpt, out) === (0L until 250L),
      "a file sorting at or below the watermark is outside the tail contract")
  }

  test("stream-side filters and pruning ride the same scan as batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_stream_f").toString
    writeBatch(dir, "b0.avro", 0 until 200)
    val q = spark.readStream.format("graft-avro")
      .option("graft.splitbytes", 512).load(dir)
      .where(col("m") === 0).select("id")
      .writeStream.format("memory").queryName("avro_tail_f")
      .option("checkpointLocation", s"$dir/_ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("avro_tail_f").as[Long].collect().sorted
    assert(got.toSeq === (0L until 200L by 5),
      "filtered tail must equal the predicate over the batch read")
  }

  test("maxFilesPerTrigger chunks the backlog into capped micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_stream_mf").toString
    writeBatch(dir, "b0.avro", 0 until 10)
    writeBatch(dir, "b1.avro", 10 until 20)
    writeBatch(dir, "b2.avro", 20 until 30)
    val q = spark.readStream.format("graft-avro")
      .option("graft.splitbytes", 512)
      .option("graft.maxfilespertrigger", 1).load(dir)
      .writeStream.format("memory").queryName("avro_tail_mf")
      .option("checkpointLocation", s"$dir/_ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("avro_tail_mf").select("id").as[Long].collect().sorted
      .toSeq === (0L until 30L), "the capped tail still drains everything")
    // one offset-log entry per admitted batch: 3 files at cap 1 -> 3
    val offsets = new java.io.File(s"$dir/_ckpt/offsets").listFiles()
      .map(_.getName).filter(_.forall(_.isDigit)).map(_.toInt).sorted
    assert(offsets.length >= 3,
      s"cap 1 over 3 files must take >= 3 micro-batches, got ${offsets.toSeq}")
  }

  test("a tail starts on an EMPTY directory with an explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_stream_e").toString
    val ckpt = s"$dir/_ckpt"; val out = s"$dir/_out"
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("m",
        org.apache.spark.sql.types.IntegerType)))
    def drain(): Seq[Long] = {
      val q = spark.readStream.format("graft-avro").schema(sch)
        .option("graft.splitbytes", 512).load(dir).select("id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val f = new java.io.File(out)
      if (!f.exists() || f.listFiles().forall(!_.getName.endsWith(".parquet")))
        Seq.empty
      else spark.read.parquet(out).as[Long].collect().sorted.toSeq
    }
    assert(drain() === Seq.empty, "empty directory drains zero rows, no crash")
    writeBatch(dir, "b0.avro", 0 until 25)
    assert(drain() === (0L until 25L), "the first file lands in the next run")
  }

  /** AvailableNow drain with the seen-files log on; parquet sink so the
    * checkpoint (and with it the graft-seen log) recovers across runs.
    */
  private def runSeenLog(dir: String, ckpt: String, out: String,
      retain: Option[Int] = None): Seq[Long] = {
    val reader = spark.readStream.format("graft-avro")
      .option("graft.splitbytes", 512)
      .option("graft.seenlog", "true")
    val withRetain = retain.fold(reader)(n =>
      reader.option("graft.seenlog.retain", n.toString))
    val query = withRetain.load(dir).select("id")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val f = new java.io.File(out)
    if (!f.exists() || f.listFiles().forall(!_.getName.endsWith(".parquet")))
      Seq.empty
    else spark.read.parquet(out).as[Long].collect().sorted.toSeq
  }

  test("seen-log tail admits LATE files exactly once across restarts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_seenlog").toString
    val ckpt = s"$dir/_ckpt"; val out = s"$dir/_out"
    writeBatch(dir, "b5.avro", 0 until 100)
    assert(runSeenLog(dir, ckpt, out) === (0L until 100L))
    // a9 sorts BELOW b5 — the watermark tail ignores it; seen-log admits it
    writeBatch(dir, "a9.avro", 100 until 150)
    assert(runSeenLog(dir, ckpt, out) === (0L until 150L),
      "late file must be admitted by the seen-log tail")
    // and exactly once: an idle re-run appends nothing
    assert(runSeenLog(dir, ckpt, out) === (0L until 150L),
      "no file may be processed twice")
    // the log persists one batch file per non-empty micro-batch
    val logFiles = new java.io.File(s"$ckpt/sources/0/graft-seen").listFiles()
      .map(_.getName).filter(_.startsWith("batch-"))
    assert(logFiles.length === 2, logFiles.mkString(","))
  }

  test("seen-log retention folds retired batches into the name floor") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_seenret").toString
    val ckpt = s"$dir/_ckpt"; val out = s"$dir/_out"
    writeBatch(dir, "c1.avro", 0 until 10)
    assert(runSeenLog(dir, ckpt, out, retain = Some(1)) === (0L until 10L))
    writeBatch(dir, "c2.avro", 10 until 20)
    assert(runSeenLog(dir, ckpt, out, retain = Some(1)) === (0L until 20L))
    writeBatch(dir, "c3.avro", 20 until 30)
    assert(runSeenLog(dir, ckpt, out, retain = Some(1)) === (0L until 30L))
    // a file BELOW the floor (older than the whole retention window) is
    // refused — the documented FileStreamSource-maxFileAge-style caveat.
    // (This restart also delivers the final batch's commit() callback,
    // which is when retention retires it — AvailableNow stops before
    // the last within-run commit.)
    writeBatch(dir, "a0.avro", 900 until 910)
    assert(runSeenLog(dir, ckpt, out, retain = Some(1)) === (0L until 30L),
      "names below the retention floor stay outside the contract")
    // retention=1: at most the newest batch's log survives (+ the floor)
    val logDir = new java.io.File(s"$ckpt/sources/0/graft-seen")
    val kept = logDir.listFiles().map(_.getName).filter(_.startsWith("batch-"))
    assert(kept.length <= 1, s"retention must bound the log: ${kept.mkString(",")}")
    assert(logDir.listFiles().map(_.getName).contains("_floor"))
  }

  test("seen-log tail honors maxFilesPerTrigger while draining") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_seenmf").toString
    writeBatch(dir, "b0.avro", 0 until 10)
    writeBatch(dir, "b1.avro", 10 until 20)
    writeBatch(dir, "b2.avro", 20 until 30)
    val q = spark.readStream.format("graft-avro")
      .option("graft.splitbytes", 512)
      .option("graft.seenlog", "true")
      .option("graft.maxfilespertrigger", 1).load(dir)
      .writeStream.format("memory").queryName("avro_seen_mf")
      .option("checkpointLocation", s"$dir/_ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("avro_seen_mf").select("id").as[Long].collect().sorted
      .toSeq === (0L until 30L))
    val logFiles = new java.io.File(s"$dir/_ckpt/sources/0/graft-seen").listFiles()
      .map(_.getName).filter(_.startsWith("batch-"))
    assert(logFiles.length === 3, s"cap 1 over 3 files: ${logFiles.mkString(",")}")
  }

  test("offsets round-trip through JSON") {
    val o = AvroStreamOffset("/some/dir/b17.avro")
    val back = new AvroMicroBatchStream(
      new AvroScan(new org.apache.spark.sql.types.StructType(), "/tmp",
        Seq.empty, 1L, Array.empty), "/tmp")
      .deserializeOffset(o.json())
    assert(back === o)
  }
}
