package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r19 (the r18 ADVICE queue): read-side manifest masking — a reader
  * hitting the post-commit duplicate window sees exactly-once rows
  * without waiting for the next compact(); the rewrite tier's STRICT
  * filter evaluator; sidecar self-repair on the Untouched rewrite path;
  * and block-granularity inference so tuned layouts survive rewrites.
  */
class AvroRepairSpec extends SparkSpec {

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_rep").toString

  private val conf = new org.apache.hadoop.conf.Configuration()

  test("reader masks a committed compaction manifest: no duplicate rows") {
    val dir = tempDir()
    AvroSink.write(spark.range(400).select(col("id")).repartition(4), dir,
      overwrite = true)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // simulate a crash AFTER the commit rename, BEFORE the source
    // deletes: final container (copy of source 0) + manifest + source
    val src0 = AvroDsv2.listFiles(dir, conf).head._1
    val finalP = new org.apache.hadoop.fs.Path(dir, "compact-cafebabe.avro")
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src0),
      fs, finalP, false, conf)
    val m = om.createObjectNode()
    m.put("final", "compact-cafebabe.avro")
    m.putArray("sources").add(src0)
    val mp = new org.apache.hadoop.fs.Path(dir,
      ".graft-cmp-cafebabe.manifest.json")
    val o = fs.create(mp, true); o.write(om.writeValueAsBytes(m)); o.close()
    // the source file is still on disk, but the LISTING masks it
    assert(fs.exists(new org.apache.hadoop.fs.Path(src0)))
    val listed = AvroDsv2.listFiles(dir, conf).map(_._1)
    assert(!listed.contains(src0), "committed manifest must mask its sources")
    assert(listed.exists(_.endsWith("compact-cafebabe.avro")))
    assert(spark.read.format("graft-avro").load(dir).count() === 400L,
      "no duplicate rows during the post-commit window")
    // an UNCOMMITTED manifest (no final file) masks nothing
    val m2 = om.createObjectNode()
    m2.put("final", "compact-00000000.avro")
    m2.putArray("sources").add(listed.head)
    val mp2 = new org.apache.hadoop.fs.Path(dir,
      ".graft-cmp-00000000.manifest.json")
    val o2 = fs.create(mp2, true); o2.write(om.writeValueAsBytes(m2)); o2.close()
    assert(spark.read.format("graft-avro").load(dir).count() === 400L)
    fs.delete(mp2, false)
    // an UNREADABLE committed manifest fails loudly, never serves dups
    val o3 = fs.create(mp, true); o3.write("not json".getBytes); o3.close()
    fs.delete(new org.apache.hadoop.fs.Path(
      dir, s".${mp.getName}.crc"), false)
    val e = intercept[IllegalStateException] {
      AvroDsv2.listFiles(dir, conf)
    }
    assert(e.getMessage.contains("unreadable commit manifest"))
  }

  test("rewrite tier evaluates filters STRICTLY: unhandled shape throws") {
    // the scan tier keeps its permissive residue...
    val unknown = org.apache.spark.sql.sources.EqualNullSafe("a", 1L)
    assert(AvroFilters.eval(unknown, _ => null))
    // ...the rewrite tier refuses (true would mean destroy-the-row)
    val e = intercept[IllegalStateException] {
      AvroFilters.eval(unknown, _ => null, strict = true)
    }
    assert(e.getMessage.contains("row-mutation"))
    // strictness propagates through And/Or
    intercept[IllegalStateException] {
      AvroFilters.eval(org.apache.spark.sql.sources.And(
        org.apache.spark.sql.sources.IsNotNull("a"), unknown),
        _ => java.lang.Long.valueOf(1L), strict = true)
    }
  }

  test("Untouched rewrite repairs a missing sidecar (file-level stats)") {
    val dir = tempDir()
    AvroSink.write(spark.range(100)
      .select(col("id"), (col("id") % 5).as("v")).coalesce(1), dir,
      overwrite = true)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val target = AvroDsv2.listFiles(dir, conf).head._1
    val sc = new org.apache.hadoop.fs.Path(s"$target.stats.json")
    fs.delete(sc, false)
    val scCrc = new org.apache.hadoop.fs.Path(sc.getParent, s".${sc.getName}.crc")
    fs.delete(scCrc, false)
    assert(AvroStats.read(target).isEmpty)
    // sidecar gone -> the file cannot be ruled out -> rewrite streams it,
    // matches nothing (Untouched), and REPAIRS the sidecar in passing
    AvroSink.deleteWhere(spark, dir, col("v") > 100L)
    val st = AvroStats.read(target).getOrElse(
      fail("Untouched rewrite must regenerate the missing sidecar"))
    assert(st.rows.contains(100L))
    assert(st.cols("id").minL.contains(0L) && st.cols("id").maxL.contains(99L))
    assert(st.blocks.isEmpty,
      "repair must emit FILE-level stats only: regenerated block sync " +
        "positions would anchor splits at wrong offsets in the original")
    // the repaired sidecar re-arms metadata pushdown
    val agg = spark.read.format("graft-avro").load(dir).groupBy().count()
    assert(agg.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(agg.collect().head.getLong(0) === 100L)
  }

  test("COW rewrite and compaction preserve a tuned block granularity") {
    val dir = tempDir()
    val src = spark.range(1000).select(col("id"), (col("id") % 9).as("v"))
    src.coalesce(1).write.format("graft-avro")
      .option("graft.schema", src.schema.json)
      .option("graft.blockrows", "250")
      .mode("overwrite").save(dir)
    def maxBlockRows(p: String): Long =
      AvroStats.read(p).get.blocks.map(_.rows).max
    assert(maxBlockRows(AvroDsv2.listFiles(dir, conf).head._1) === 250L)
    // row-level COW delete: the rewritten sidecar keeps ~250-row blocks
    AvroSink.deleteWhere(spark, dir, col("id") === 7L)
    val p1 = AvroDsv2.listFiles(dir, conf).head._1
    val blocks1 = AvroStats.read(p1).get.blocks
    assert(blocks1.size >= 3 && blocks1.map(_.rows).max === 250L,
      s"delete rewrite must infer blockrows=250, got ${blocks1.map(_.rows)}")
    // compaction of two tuned files: granularity inferred from sources
    AvroSink.write(spark.range(1000, 1500)
      .select(col("id"), (col("id") % 9).as("v")).coalesce(1), dir)
    graft.ops.Layout.compact(dir, Long.MaxValue / 4)
    val pc = AvroDsv2.listFiles(dir, conf).head._1
    assert(pc.contains("compact-"))
    val blocksC = AvroStats.read(pc).get.blocks
    assert(blocksC.nonEmpty && blocksC.map(_.rows).max === 250L,
      s"compaction must preserve the tuned granularity, got " +
        s"${blocksC.map(_.rows)}")
  }
}
