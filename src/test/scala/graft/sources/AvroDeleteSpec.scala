package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r17: partition-predicate DELETE — whole-file removal through the
  * path-value evaluation, containers never rewritten.
  * r18: row-level copy-on-write DELETE — data-column predicates rewrite
  * ONLY the files the zone maps / blooms cannot rule out, leave every
  * other container byte-identical, regenerate sidecars, and stay
  * correct at every crash point of the swap protocol.
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

  private def md5Of(p: String): String = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(
        if (p.startsWith("file:")) p else s"file:$p")))
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
  }

  private def md5s(dir: String): Map[String, String] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    AvroDsv2.listFiles(dir, conf).map { case (p, _) => p -> md5Of(p) }.toMap
  }

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

  test("cast-wrapped partition columns translate when numeric, refuse otherwise") {
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
    // a NON-numeric column-side cast (string column coerced to meet a
    // numeric literal) must REFUSE: the evaluator cannot reproduce
    // Spark's cast semantics, and unwrapping would silently UNDER-delete
    // (r17 ADVICE, medium)
    val dirS = tempDir()
    AvroSink.writePartitioned(fixture, dirS, Seq("lang"), overwrite = true)
    intercept[Exception] {
      AvroSink.deleteWhere(spark, dirS, col("lang") === 1)
    }
    assert(spark.read.format("graft-avro").load(dirS).count() === 90L,
      "a refused delete must not remove anything")
  }

  test("unsupported predicate shapes are refused loudly") {
    val dir = tempDir()
    AvroSink.write(fixture, dir, overwrite = true)
    // Not: three-valued flip is not a supported source-filter shape
    val ex = intercept[UnsupportedOperationException] {
      AvroSink.deleteWhere(spark, dir, col("v") =!= 10)
    }
    assert(ex.getMessage.contains("untranslatable"), ex.getMessage)
    assert(spark.read.format("graft-avro").load(dir).count() === 90L)
  }

  // -- r18 row-level copy-on-write tier ---------------------------------

  /** Four containers with disjoint sorted id ranges [0,1000) .. [3000,4000). */
  private def rangedFixture(dir: String): Unit =
    AvroSink.write(
      spark.range(4000).select(col("id"), (col("id") % 100).as("v"),
          concat(lit("n"), col("id")).as("name"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"),
      dir, overwrite = true)

  test("row delete rewrites only may-match files; others stay byte-identical") {
    val dir = tempDir()
    rangedFixture(dir)
    val conf = new org.apache.hadoop.conf.Configuration()
    assert(AvroDsv2.listFiles(dir, conf).size === 4)
    val before = md5s(dir)
    // probe range chosen mid-file: repartitionByRange boundaries are
    // SAMPLED (~1000, 2000, 3000 plus sampling error), so [1400, 1600]
    // provably lives inside one container
    AvroSink.deleteWhere(spark, dir, col("id") >= 1400 && col("id") <= 1600)
    val after = md5s(dir)
    assert(after.keySet === before.keySet, "no file appears or vanishes")
    val untouched = after.count { case (p, h) => before(p) == h }
    assert(untouched === 3,
      s"exactly the one may-match container rewrites, got $untouched untouched")
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.count() === 3799L)
    assert(back.where(col("id").between(1400, 1600)).count() === 0L)
    // regenerated sidecar: metadata count(*) pushdown answers the NEW
    // count (a stale sidecar would answer 4000)
    val agg = back.groupBy().count()
    assert(agg.queryExecution.executedPlan.toString.contains("metadata-only"),
      "count(*) must still push down after the rewrite")
    assert(agg.collect().head.getLong(0) === 3799L)
    // idempotent: re-running deletes nothing more and rewrites nothing
    val mid = md5s(dir)
    AvroSink.deleteWhere(spark, dir, col("id") >= 1400 && col("id") <= 1600)
    assert(md5s(dir) === mid, "a re-run must leave every container untouched")
  }

  test("row delete null semantics + emptied files unlink") {
    val dir = tempDir()
    // v is null every 10th row; delete v < 50 -> null v survives (UNKNOWN)
    AvroSink.write(
      spark.range(300).select(col("id"),
          when(col("id") % 10 === 0, lit(null).cast("long"))
            .otherwise(col("id") % 100).as("v"))
        .repartitionByRange(3, col("id")).sortWithinPartitions("id"),
      dir, overwrite = true)
    AvroSink.deleteWhere(spark, dir, col("v") < 50)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.where(col("v").isNull).count() === 30L,
      "UNKNOWN rows must survive a DELETE")
    assert(back.where(col("v") < 50).count() === 0L)
    // emptied containers unlink: delete everything that remains
    AvroSink.deleteWhere(spark, dir, col("v") >= 50 || col("v").isNull)
    val conf = new org.apache.hadoop.conf.Configuration()
    assert(AvroDsv2.listFiles(dir, conf).isEmpty,
      "fully-emptied containers must be unlinked, not left as 0-row files")
  }

  test("mixed partition+data predicate rewrites only inside matching partitions") {
    val dir = tempDir()
    AvroSink.writePartitioned(fixture, dir, Seq("lang"), overwrite = true)
    val before = md5s(dir)
    AvroSink.deleteWhere(spark, dir, col("lang") === "L1" && col("v") > 100)
    val after = md5s(dir)
    // every container OUTSIDE lang=L1 is byte-identical
    before.foreach { case (p, h) =>
      if (!p.contains("lang=L1"))
        assert(after.get(p).contains(h), s"non-matching partition touched: $p")
    }
    val back = spark.read.format("graft-avro").load(dir)
    val expected = fixture.where(
      !(col("lang") === "L1" && col("v") > 100) || col("lang").isNull).count()
    assert(back.count() === expected)
    assert(back.where(col("lang") === "L1" && col("v") > 100).count() === 0L)
  }

  test("swap protocol: abort keeps originals; every crash point stays readable") {
    val dir = tempDir()
    rangedFixture(dir)
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = AvroDsv2.listFiles(dir, conf)
    // the file holding id 0 (repartitionByRange boundaries are sampled,
    // so per-file counts are approximate — derive expectations from the
    // actual target file)
    val target = files.map(_._1).find(p =>
      AvroStats.read(p).get.cols("id").minL.contains(0L)).get
    val targetRows = spark.read.format("graft-avro").load(target)
    val n = targetRows.count()
    val m = targetRows.where(col("id") < 10).count()
    assert(m > 0L)
    val filters: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.LessThan("id", 10L))
    val outcome = AvroRewrite.deleteRewrite(target, Map.empty, filters)
    val rw = outcome.asInstanceOf[AvroRewrite.Rewritten]
    assert(rw.kept === n - m && rw.deleted === m)
    // the dot-temp is INVISIBLE to readers (abort = just delete it)
    assert(AvroDsv2.listFiles(dir, conf).size === 4)
    assert(spark.read.format("graft-avro").load(dir).count() === 4000L,
      "before the swap the original data is fully intact")
    // crash point A: sidecar deleted, rename not yet done -> table intact
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(s"$target.stats.json"), false)
    assert(spark.read.format("graft-avro").load(dir).count() === 4000L)
    // complete the swap: rename + sidecar
    AvroRewrite.swapInPlace(conf, rw.tempPath, target, rw.stats)
    assert(spark.read.format("graft-avro").load(dir).count() === 4000L - m)
    assert(spark.read.format("graft-avro").load(dir)
      .where(col("id") < 10).count() === 0L)
    // regenerated sidecar is consistent: metadata count matches
    val agg = spark.read.format("graft-avro").load(dir).groupBy().count()
    assert(agg.collect().head.getLong(0) === 4000L - m)
  }
}
