package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r19: the versioned manifest log — snapshot isolation, time travel
  * (Scala option + SQL VERSION AS OF), optimistic writer fencing,
  * versioned COW delete/update/replace/compaction, retention + orphan
  * sweep, the signed change feed, and the legacy fallback (unversioned
  * tables untouched by all of it).
  */
class AvroVersionsSpec extends SparkSpec {

  private val conf = new org.apache.hadoop.conf.Configuration()

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_ver").toString

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)

  private def readV(dir: String, v: Long) =
    spark.read.format("graft-avro")
      .option("graft.versionasof", v.toString).load(dir)

  test("enable/append/overwrite commit versions; VERSION AS OF reads each") {
    val dir = tempDir()
    AvroSink.write(spark.range(10).select(col("id")), dir, overwrite = true)
    assert(AvroVersions.enable(dir, conf) === 1L)
    AvroSink.write(spark.range(10, 30).select(col("id")), dir) // v2 append
    AvroSink.write(spark.range(100, 105).select(col("id")), dir,
      overwrite = true) // v3 overwrite
    assert(readV(dir, 1).count() === 10L)
    assert(readV(dir, 2).count() === 30L)
    assert(readV(dir, 3).count() === 5L)
    // default read = latest
    assert(spark.read.format("graft-avro").load(dir).count() === 5L)
    // time travel on an UNVERSIONED table throws
    val flat = tempDir()
    AvroSink.write(spark.range(3).select(col("id")), flat, overwrite = true)
    val e = intercept[IllegalArgumentException] {
      readV(flat, 1).count()
    }
    assert(e.getMessage.contains("no version log"))
  }

  test("snapshot isolation: a pinned reader sees its version across a COW delete") {
    val dir = tempDir()
    AvroSink.write(spark.range(100)
      .select(col("id"), (col("id") % 5).as("v")).repartition(2), dir,
      overwrite = true)
    AvroVersions.enable(dir, conf)
    val pinned = readV(dir, 1)
    assert(pinned.count() === 100L)
    // COW delete commits v2 under fresh names; v1's files stay on disk
    AvroSink.deleteWhere(spark, dir, col("v") === 2L)
    assert(spark.read.format("graft-avro").load(dir).count() === 80L)
    assert(pinned.count() === 100L,
      "the pinned snapshot must see version 1 exactly during/after " +
        "a concurrent rewrite")
    assert(readV(dir, 1).where(col("v") === 2L).count() === 20L)
    // the rewrite landed under a fresh name; originals retained
    val latestFiles = AvroVersions.resolveFiles(dir, conf).get.map(_._1)
    assert(latestFiles.exists(_.contains("part-cow-")))
    val v1Files = AvroVersions
      .resolveFiles(dir, conf, Some(1L)).get.map(_._1)
    v1Files.foreach(p => assert(
      fsOf(dir).exists(new org.apache.hadoop.fs.Path(p)),
      s"v1 file must be retained for time travel: $p"))
  }

  test("writer fencing: stale parent and claim collisions fail loudly") {
    val dir = tempDir()
    AvroSink.write(spark.range(5).select(col("id")), dir, overwrite = true)
    AvroVersions.enable(dir, conf)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(dir)
    val files = AvroVersions.readManifest(fs, root, 1L)
    // a commit derived from a stale parent refuses
    AvroVersions.commit(fs, root, files, "noop", 1L) // -> v2
    intercept[AvroVersions.ConcurrentWriteException] {
      AvroVersions.commit(fs, root, files, "stale", 1L)
    }
    // a FRESH claim from a concurrent writer blocks the commit
    val claim = new org.apache.hadoop.fs.Path(dir,
      s"${AvroVersions.LogDirName}/v${"%020d".format(3L)}.json.claim")
    fs.create(claim, false).close()
    intercept[AvroVersions.ConcurrentWriteException] {
      AvroVersions.commit(fs, root, files, "blocked", 2L)
    }
    // a STALE claim (older than the threshold) is swept and the commit
    // proceeds
    AvroVersions.commit(fs, root, files, "sweeps", 2L, staleClaimMs = 0L)
    assert(AvroVersions.latestVersion(fs, root).contains(3L))
    // readers were never blocked
    assert(spark.read.format("graft-avro").load(dir).count() === 5L)
  }

  test("versioned update, SQL row-level replace, and compaction commit through the log") {
    val wh = tempDir()
    spark.conf.set("spark.sql.catalog.gver", "graft.sources.AvroCatalog")
    spark.conf.set("spark.sql.catalog.gver.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gver.db")
    spark.sql("CREATE TABLE gver.db.t (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES('versioned'='true')")
    val dir = s"$wh/db/t"
    spark.range(50).select(col("id"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("ver_src")
    spark.sql("INSERT INTO gver.db.t SELECT id, v FROM ver_src") // v2
    // Scala-API literal update -> v3 (versioned COW: fresh names)
    AvroSink.updateWhere(spark, dir, col("id") < 5L, Map("v" -> 999L))
    // SQL expression update through the row-level replace -> v4
    spark.sql("UPDATE gver.db.t SET v = v + 1 WHERE id >= 45")
    val fs = fsOf(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    assert(AvroVersions.latestVersion(fs, root).contains(4L))
    // content correct at each version
    assert(readV(dir, 2).agg(sum("v")).collect().head.getLong(0) ===
      (0L until 50L).map(_ * 2).sum)
    assert(readV(dir, 3).where(col("v") === 999L).count() === 5L)
    assert(spark.sql("SELECT sum(v) FROM gver.db.t WHERE id >= 45")
      .collect().head.getLong(0) === (45L until 50L).map(_ * 2 + 1).sum)
    // SQL time travel syntax
    assert(spark.sql("SELECT count(*) FROM gver.db.t VERSION AS OF 2 " +
      "WHERE v = 999").collect().head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM gver.db.t VERSION AS OF 3 " +
      "WHERE v = 999").collect().head.getLong(0) === 5L)
    // compaction commits v5, sources retained, content identical
    val before = spark.sql("SELECT sum(v), count(*) FROM gver.db.t")
      .collect().head
    assert(graft.ops.Layout.compact(dir, Long.MaxValue / 4) >= 1)
    assert(AvroVersions.latestVersion(fs, root).contains(5L))
    assert(spark.sql("SELECT sum(v), count(*) FROM gver.db.t")
      .collect().head === before)
    assert(readV(dir, 4).count() === 50L, "pre-compaction snapshot intact")
  }

  test("expire drops versions, reclaims unreferenced files and aged orphans") {
    val dir = tempDir()
    AvroSink.write(spark.range(20).select(col("id")).repartition(2), dir,
      overwrite = true)
    AvroVersions.enable(dir, conf) // v1
    AvroSink.deleteWhere(spark, dir, col("id") < 10L) // v2: COW rewrite
    val fs = fsOf(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val v1Files = AvroVersions.readManifest(fs, root, 1L).map(_._1)
    // an aged orphan (crashed pre-commit rewrite leftover)
    val orphan = new org.apache.hadoop.fs.Path(dir, "part-cow-dead-00000.avro")
    fs.create(orphan, true).close()
    val (dropped, deleted) = AvroVersions.expire(dir, keepVersions = 1,
      conf = conf, orphanAgeMs = 0L)
    assert(dropped === 1)
    assert(deleted >= 1)
    assert(!fs.exists(orphan), "aged orphan must be reclaimed")
    val kept = AvroVersions.resolveFiles(dir, conf).get.map(_._1).toSet
    v1Files.filterNot(kept.contains).foreach(p => assert(
      !fs.exists(new org.apache.hadoop.fs.Path(p)),
      s"retired-only file must be deleted: $p"))
    intercept[IllegalArgumentException] { readV(dir, 1).count() }
    assert(spark.read.format("graft-avro").load(dir).count() === 10L)
  }

  test("signed change feed: file-set diff rows, additive cancellation") {
    val dir = tempDir()
    AvroSink.write(spark.range(30)
      .select(col("id"), (col("id") % 3).as("v")).repartition(3), dir,
      overwrite = true)
    AvroVersions.enable(dir, conf) // v1
    AvroSink.write(spark.range(30, 40)
      .select(col("id"), (col("id") % 3).as("v")), dir) // v2 append
    AvroSink.deleteWhere(spark, dir, col("id") < 5L) // v3 COW
    // v1 -> v2: pure inserts
    val c12 = AvroVersions.changes(spark, dir, 1L, 2L)
    assert(c12.where(col("_change_type") === "delete").count() === 0L)
    assert(c12.where(col("_change_type") === "insert")
      .agg(count(lit(1))).collect().head.getLong(0) === 10L)
    // v1 -> v3: the COW-rewritten container contributes both sides;
    // the SIGNED composition equals the snapshot diff exactly
    val c13 = AvroVersions.changes(spark, dir, 1L, 3L)
    val signedSum = c13.select(sum(when(col("_change_type") === "insert",
      col("id")).otherwise(-col("id")))).collect().head.getLong(0)
    val snapDiff = readV(dir, 3).agg(sum("id")).collect().head.getLong(0) -
      readV(dir, 1).agg(sum("id")).collect().head.getLong(0)
    assert(signedSum === snapDiff,
      "signed change feed must compose to the snapshot delta")
    // equal versions -> empty feed with the right schema
    intercept[IllegalArgumentException] {
      AvroVersions.changes(spark, dir, 2L, 2L)
    }
  }

  test("IVM composition: applySignedDeltas over the change feed equals full recompute") {
    val dir = tempDir()
    val mk = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id"), (col("id") % 3).as("k"))
    AvroSink.write(mk(0, 60).repartition(2), dir, overwrite = true)
    AvroVersions.enable(dir, conf) // v1
    AvroSink.write(mk(60, 90), dir) // v2 append
    AvroSink.deleteWhere(spark, dir,
      col("id").isin(1L, 8L, 15L, 22L, 29L, 36L, 43L, 50L, 57L, 64L,
        71L, 78L, 85L)) // v3 COW
    def aggState(df: org.apache.spark.sql.DataFrame) = df.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("id").cast("decimal(24,2)")).cast("decimal(28,2)")
          .as("sum_v"))
    val baseState = aggState(readV(dir, 1))
    val deltas = AvroVersions.changes(spark, dir, 1L, 3L)
      .withColumn("w",
        when(col("_change_type") === "insert", 1L).otherwise(-1L))
    val maintained = graft.ops.Merge.applySignedDeltas(
        baseState, deltas, Seq("k"), "w", "id")
      .select(col("k"), col("n"), col("sum_v").cast("long").as("s"))
      .orderBy("k").collect().toSeq
    val recomputed = aggState(readV(dir, 3))
      .select(col("k"), col("n"), col("sum_v").cast("long").as("s"))
      .orderBy("k").collect().toSeq
    assert(maintained === recomputed,
      "the signed change feed must maintain the aggregate to exactly " +
        "the full-recompute state (redundant COW pairs cancel)")
  }

  test("history lists every committed version with op and file stats") {
    val dir = tempDir()
    AvroSink.write(spark.range(10).select(col("id")).repartition(2), dir,
      overwrite = true)
    AvroVersions.enable(dir, conf) // v1
    AvroSink.write(spark.range(10, 20).select(col("id")), dir) // v2
    AvroSink.deleteWhere(spark, dir, col("id") < 3L) // v3 (COW)
    val h = AvroVersions.history(spark, dir).collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(3L, 2L, 1L), "newest first")
    assert(h.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq((3L, 2L, "delete"), (2L, 1L, "append"), (1L, 0L, "enable")))
    assert(h.forall(_.getLong(4) > 0L), "every version lists files")
    assert(h.forall(_.getLong(5) > 0L), "every version sums bytes")
    intercept[IllegalArgumentException] {
      AvroVersions.history(spark, tempDir())
    }
  }

  test("SQL TIMESTAMP AS OF resolves the newest version at or before the instant") {
    val wh = tempDir()
    spark.conf.set("spark.sql.catalog.gts", "graft.sources.AvroCatalog")
    spark.conf.set("spark.sql.catalog.gts.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gts.db")
    spark.sql("CREATE TABLE gts.db.t (id BIGINT) " +
      "TBLPROPERTIES('versioned'='true')")
    val dir = s"$wh/db/t"
    spark.range(10).select(col("id")).createOrReplaceTempView("ts_src")
    spark.sql("INSERT INTO gts.db.t SELECT id FROM ts_src") // v2
    Thread.sleep(5)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql("INSERT INTO gts.db.t SELECT id + 100 FROM ts_src") // v3
    val tsLit = new java.sql.Timestamp(betweenMs).toInstant.toString
    // between v2 and v3: sees exactly v2's 10 rows
    assert(spark.sql(
      s"SELECT count(*) FROM gts.db.t TIMESTAMP AS OF '$tsLit'")
      .collect().head.getLong(0) === 10L)
    // after v3: sees all 20
    val afterLit = new java.sql.Timestamp(
      System.currentTimeMillis() + 1000).toInstant.toString
    assert(spark.sql(
      s"SELECT count(*) FROM gts.db.t TIMESTAMP AS OF '$afterLit'")
      .collect().head.getLong(0) === 20L)
    // before the first commit: loud refusal
    val early = new java.sql.Timestamp(betweenMs - 3600_000L)
      .toInstant.toString
    val e = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM gts.db.t TIMESTAMP AS OF '$early'")
        .collect()
    }
    assert(e.getMessage.contains("no committed version"))
  }

  test("streaming read/write of a versioned table refuse loudly") {
    val dir = tempDir()
    AvroSink.write(spark.range(5).select(col("id")), dir, overwrite = true)
    AvroVersions.enable(dir, conf)
    val e1 = intercept[Exception] {
      spark.readStream.format("graft-avro").load(dir)
        .writeStream.format("memory").queryName("ver_refuse")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(e1.getMessage != null)
    val ckpt = tempDir()
    val e2 = intercept[Exception] {
      val q = spark.readStream.format("rate").option("rowsPerSecond", "1")
        .load().selectExpr("value AS id")
        .writeStream.format("graft-avro")
        .option("path", dir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(e2.getMessage != null)
    // the refusals left the table intact
    assert(spark.read.format("graft-avro").load(dir).count() === 5L)
  }
}
