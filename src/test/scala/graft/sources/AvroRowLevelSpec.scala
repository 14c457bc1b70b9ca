package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r19: SQL UPDATE / MERGE INTO / rewrite-shaped DELETE through
  * SupportsRowLevelOperations — group-based copy-on-write: expression
  * assignments, cross-partition row moves, merge with inserts,
  * untouched-file byte-identity, metadata-delete short-circuit, and
  * the rlo-manifest crash recovery.
  */
class AvroRowLevelSpec extends SparkSpec {

  private val wh = java.nio.file.Files
    .createTempDirectory("graft_rlo_wh").toString

  spark.conf.set("spark.sql.catalog.grlo", "graft.sources.AvroCatalog")
  spark.conf.set("spark.sql.catalog.grlo.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS grlo.db")

  private val conf = new org.apache.hadoop.conf.Configuration()

  private def md5(p: String): String = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
  }

  test("SQL UPDATE with expression assignments; untouched files stay byte-identical") {
    spark.sql("CREATE TABLE grlo.db.u (id BIGINT, v BIGINT)")
    val dir = s"$wh/db/u"
    // two range-disjoint sorted containers so the zone maps can prove
    // one of them row-free for the predicate
    val src = spark.range(200).select(col("id"), (col("id") * 10).as("v"))
    src.write.format("graft-avro")
      .option("graft.schema", src.schema.json)
      .option("graft.sortby", "id").option("graft.range", "true")
      .option("graft.writepartitions", "4")
      .mode("append").save(dir)
    val files = AvroDsv2.listFiles(dir, conf)
    assert(files.size >= 2, s"need >=2 range-disjoint files: $files")
    // the file(s) NOT holding id<20 must not be rewritten
    val untouched = files.filter(f =>
      AvroStats.read(f._1).get.cols("id").minL.exists(_ >= 20L))
    assert(untouched.nonEmpty)
    val sums = untouched.map(f => f._1 -> md5(
      new java.net.URI(f._1).getPath)).toMap
    // expression assignment — beyond the Scala API's literal-only tier
    spark.sql("UPDATE grlo.db.u SET v = v * 2 + id WHERE id < 20")
    val expect = src.withColumn("v",
      when(col("id") < 20, col("v") * 2 + col("id")).otherwise(col("v")))
      .orderBy("id").collect().toSeq
    val got = spark.sql("SELECT id, v FROM grlo.db.u ORDER BY id")
      .collect().toSeq
    assert(got === expect)
    sums.foreach { case (p, h) =>
      assert(new java.io.File(new java.net.URI(p).getPath).exists,
        s"pruned-out file must survive: $p")
      assert(md5(new java.net.URI(p).getPath) === h,
        s"pruned-out file must stay byte-identical: $p")
    }
    // the affected file was REPLACED by an rlo container + fresh sidecar
    val after = AvroDsv2.listFiles(dir, conf)
    assert(after.exists(_._1.contains("part-rlo-")))
    val agg = spark.sql("SELECT count(*) FROM grlo.db.u")
    assert(agg.collect().head.getLong(0) === 200L)
    // no manifest or temp residue
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .exists(_.getPath.getName.startsWith(".graft-rlo-")))
  }

  test("SQL UPDATE can move rows across partitions") {
    spark.sql("CREATE TABLE grlo.db.p (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.range(60).select(col("id"),
        concat(lit("L"), (col("id") % 2).cast("string")).as("lang"))
      .createOrReplaceTempView("rlo_psrc")
    spark.sql("INSERT INTO grlo.db.p SELECT id, lang FROM rlo_psrc")
    // the Scala API refuses partition-column assignment; SQL's
    // group-based rewrite routes the row to its new directory
    spark.sql("UPDATE grlo.db.p SET lang = 'L9' WHERE id < 10 AND lang = 'L0'")
    assert(spark.sql("SELECT count(*) FROM grlo.db.p WHERE lang = 'L9'")
      .collect().head.getLong(0) === 5L)
    assert(spark.sql(
      "SELECT count(*) FROM grlo.db.p WHERE lang = 'L0' AND id < 10")
      .collect().head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM grlo.db.p")
      .collect().head.getLong(0) === 60L)
    assert(new java.io.File(s"$wh/db/p/lang=L9").exists,
      "moved rows must land in their new partition directory")
  }

  test("MERGE INTO: matched update, not-matched insert, by-source delete") {
    spark.sql("CREATE TABLE grlo.db.m (k BIGINT, v BIGINT)")
    spark.range(10).select(col("id").as("k"), (col("id") * 100).as("v"))
      .createOrReplaceTempView("rlo_mtarget")
    spark.sql("INSERT INTO grlo.db.m SELECT k, v FROM rlo_mtarget")
    spark.range(5, 15).select(col("id").as("k"), (col("id") + 1).as("nv"))
      .createOrReplaceTempView("rlo_msrc")
    spark.sql("""MERGE INTO grlo.db.m t USING rlo_msrc s ON t.k = s.k
      |WHEN MATCHED THEN UPDATE SET v = s.nv * 2
      |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)
    val got = spark.sql("SELECT k, v FROM grlo.db.m ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = (0L until 5L).map(k => (k, k * 100)) ++
      (5L until 10L).map(k => (k, (k + 1) * 2)) ++
      (10L until 15L).map(k => (k, k + 1))
    assert(got === expect)
    // WHEN NOT MATCHED BY SOURCE
    spark.sql("""MERGE INTO grlo.db.m t USING rlo_msrc s ON t.k = s.k
      |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT min(k), max(k), count(*) FROM grlo.db.m")
      .collect().head.toSeq === Seq(5L, 14L, 10L))
  }

  test("untranslatable DELETE predicates fall through to the COW rewrite") {
    spark.sql("CREATE TABLE grlo.db.d (id BIGINT, v BIGINT)")
    spark.range(50).select(col("id"), (col("id") % 7).as("v"))
      .createOrReplaceTempView("rlo_dsrc")
    spark.sql("INSERT INTO grlo.db.d SELECT id, v FROM rlo_dsrc")
    // pre-r19 this threw "untranslatable predicate"; now the group
    // rewrite handles any deterministic predicate
    spark.sql("DELETE FROM grlo.db.d WHERE NOT (v < 5) OR pmod(id, 10) = 3")
    val remaining = spark.sql("SELECT id FROM grlo.db.d ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    val expect = (0L until 50L)
      .filterNot(id => !(id % 7 < 5) || id % 10 == 3)
    assert(remaining === expect)
  }

  test("translatable DELETE still short-circuits to the metadata tier") {
    spark.sql("CREATE TABLE grlo.db.s (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.range(40).select(col("id"),
        concat(lit("L"), (col("id") % 2).cast("string")).as("lang"))
      .createOrReplaceTempView("rlo_ssrc")
    spark.sql("INSERT INTO grlo.db.s SELECT id, lang FROM rlo_ssrc")
    spark.sql("DELETE FROM grlo.db.s WHERE lang = 'L1'")
    // metadata tier = whole-directory unlink, NO rlo rewrite artifacts
    assert(!new java.io.File(s"$wh/db/s/lang=L1").exists,
      "partition delete must unlink the directory (metadata tier)")
    assert(!AvroDsv2.listFiles(s"$wh/db/s", conf)
      .exists(_._1.contains("part-rlo-")),
      "a translatable DELETE must not route through the group rewrite")
    assert(spark.sql("SELECT count(*) FROM grlo.db.s")
      .collect().head.getLong(0) === 20L)
  }

  test("runtime group filtering: MERGE rewrites only files with matched rows") {
    spark.sql("CREATE TABLE grlo.db.g (id BIGINT, v BIGINT)")
    val dir = s"$wh/db/g"
    val src = spark.range(400).select(col("id"), (col("id") * 3).as("v"))
    src.write.format("graft-avro")
      .option("graft.schema", src.schema.json)
      .option("graft.sortby", "id").option("graft.range", "true")
      .option("graft.writepartitions", "4")
      .mode("append").save(dir)
    val files = AvroDsv2.listFiles(dir, conf)
    assert(files.size >= 3, files.toString)
    // source keys hit ONLY the low-id file(s): the merge ON condition
    // pushes nothing statically, so without runtime group filtering
    // every file would be rewritten
    val untouched = files.filter(f =>
      AvroStats.read(f._1).get.cols("id").minL.exists(_ >= 50L))
    assert(untouched.nonEmpty)
    val sums = untouched.map(f => f._1 -> md5(
      new java.net.URI(f._1).getPath)).toMap
    spark.range(10).select(col("id").as("k"), lit(7L).as("nv"))
      .createOrReplaceTempView("rlo_gsrc")
    spark.sql("""MERGE INTO grlo.db.g t USING rlo_gsrc s ON t.id = s.k
      |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM grlo.db.g WHERE v = 7 AND id < 10")
      .collect().head.getLong(0) === 10L)
    assert(spark.sql("SELECT count(*) FROM grlo.db.g")
      .collect().head.getLong(0) === 400L)
    sums.foreach { case (p, h) =>
      assert(new java.io.File(new java.net.URI(p).getPath).exists &&
        md5(new java.net.URI(p).getPath) === h,
        s"runtime group filtering must leave unmatched files " +
          s"byte-identical: $p")
    }
  }

  test("the _file metadata column reads on ordinary scans") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rlo_file").toString
    AvroSink.write(spark.range(20).select(col("id")).repartition(2), dir,
      overwrite = true)
    val got = spark.read.format("graft-avro").load(dir)
      .select(col("id"), col("_file")).collect()
    assert(got.length === 20)
    val byFile = got.groupBy(_.getString(1))
    assert(byFile.size === 2, byFile.keys.toString)
    assert(byFile.keys.forall(_.endsWith(".avro")))
  }

  test("rlo crash recovery: pre-commit aborts, post-commit finishes") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rlo_rec").toString
    AvroSink.write(spark.range(100).select(col("id")).repartition(2), dir,
      overwrite = true)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val files = AvroDsv2.listFiles(dir, conf).map(_._1)
    val victim = files.head
    // post-commit crash: add renamed in, removes not yet deleted
    val addP = new org.apache.hadoop.fs.Path(dir, "part-rlo-aa-p00000-000.avro")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(victim), fs, addP, false, conf)
    val n1 = om.createObjectNode()
    n1.putArray("adds").add(addP.getName)
    n1.putArray("removes").add(new org.apache.hadoop.fs.Path(victim).getName)
    val m1 = new org.apache.hadoop.fs.Path(dir, ".graft-rlo-aa.manifest.json")
    val o1 = fs.create(m1, true); o1.write(om.writeValueAsBytes(n1)); o1.close()
    // reader is exact DURING the window (mask) ...
    assert(spark.read.format("graft-avro").load(dir).count() === 100L)
    // ... and recovery finishes the physical swap
    AvroRlo.recover(fs, new org.apache.hadoop.fs.Path(dir))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(victim)))
    assert(!fs.exists(m1))
    assert(spark.read.format("graft-avro").load(dir).count() === 100L)
    // pre-commit crash: manifest names an add that never renamed in,
    // plus one that did — recovery rolls BOTH back, originals stand
    val addHalf = new org.apache.hadoop.fs.Path(dir, "part-rlo-bb-p00000-000.avro")
    org.apache.hadoop.fs.FileUtil.copy(fs, addP, fs, addHalf, false, conf)
    val n2 = om.createObjectNode()
    val arr = n2.putArray("adds")
    arr.add(addHalf.getName); arr.add("part-rlo-bb-p00001-000.avro")
    n2.putArray("removes").add(addP.getName)
    val m2 = new org.apache.hadoop.fs.Path(dir, ".graft-rlo-bb.manifest.json")
    val o2 = fs.create(m2, true); o2.write(om.writeValueAsBytes(n2)); o2.close()
    assert(spark.read.format("graft-avro").load(dir).count() === 100L,
      "mask: a partially-renamed add set reads as the OLD snapshot")
    AvroRlo.recover(fs, new org.apache.hadoop.fs.Path(dir))
    assert(!fs.exists(addHalf) && !fs.exists(m2))
    assert(fs.exists(addP), "removes must be untouched by a rollback")
    assert(spark.read.format("graft-avro").load(dir).count() === 100L)
  }
}
