package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r18: compaction execution — multi-file bins rewrite into one
  * container each through the manifest commit protocol; data identity,
  * file-count-equals-plan, idempotence, and both crash-recovery paths.
  */
class AvroCompactSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_cmp").toString

  private val conf = new org.apache.hadoop.conf.Configuration()

  private def contents(dir: String): Seq[String] =
    spark.read.format("graft-avro").load(dir)
      .collect().map(_.toString).sorted.toSeq

  test("compaction merges small files, preserves data, and is idempotent") {
    val dir = tempDir()
    // 8 small containers of ~uniform size
    AvroSink.write(spark.range(800).select(col("id"), (col("id") % 7).as("v"))
      .repartition(8), dir, overwrite = true)
    assert(AvroDsv2.listFiles(dir, conf).size === 8)
    val before = contents(dir)
    val bins = graft.ops.Layout.compact(dir, Long.MaxValue / 4)
    val after = AvroDsv2.listFiles(dir, conf)
    assert(bins === 1 && after.size === 1,
      s"expected 1 compacted container, got ${after.size} (bins=$bins)")
    assert(after.forall(_._1.contains("compact-")),
      s"compacted names expected: ${after.map(_._1)}")
    assert(contents(dir) === before, "compaction must preserve every row")
    // sidecars regenerated: metadata count(*) still pushes down exactly
    val agg = spark.read.format("graft-avro").load(dir).groupBy().count()
    assert(agg.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(agg.collect().head.getLong(0) === 800L)
    // idempotent: a single-file bin is a no-op, nothing rewrites
    val mid = AvroDsv2.listFiles(dir, conf).toMap
    assert(graft.ops.Layout.compact(dir, Long.MaxValue / 4) === 0)
    assert(AvroDsv2.listFiles(dir, conf).toMap === mid)
  }

  test("bin count follows the plan rule; at-target files are not churned") {
    val dir = tempDir()
    AvroSink.write(spark.range(800).select(col("id"), (col("id") % 7).as("v"))
      .repartition(8), dir, overwrite = true)
    val files = AvroDsv2.listFiles(dir, conf)
    val totalBytes = files.map(_._2).sum
    // target = half the table -> the nfd rule bins the 8 files into 2
    val target = totalBytes / 2 + 1
    val bins = graft.ops.Layout.compact(dir, target)
    val after = AvroDsv2.listFiles(dir, conf)
    assert(bins === 2 && after.size === 2,
      s"expected 2 compacted containers, got ${after.size} (bins=$bins)")
    // repeated compaction CONVERGES: any further run either merges the
    // (now sub-target) outputs once more or no-ops; after at most two
    // more runs the state is a fixed point
    graft.ops.Layout.compact(dir, target)
    graft.ops.Layout.compact(dir, target)
    val stable = AvroDsv2.listFiles(dir, conf).toMap
    assert(graft.ops.Layout.compact(dir, target) === 0)
    assert(AvroDsv2.listFiles(dir, conf).toMap === stable)
    assert(spark.read.format("graft-avro").load(dir).count() === 800L)
  }

  test("compaction respects partition directories") {
    val dir = tempDir()
    val df = spark.range(600).select(col("id"),
      concat(lit("L"), (col("id") % 2).cast("string")).as("lang"))
    // several containers per partition value: partitioned writes now
    // cluster by lang (one container per value per write), so stack
    // three APPENDS to get three files per partition directory
    AvroSink.writePartitioned(df.where(col("id") < 200), dir, Seq("lang"),
      overwrite = true)
    AvroSink.writePartitioned(
      df.where(col("id") >= 200 && col("id") < 400), dir, Seq("lang"))
    AvroSink.writePartitioned(df.where(col("id") >= 400), dir, Seq("lang"))
    val filesBefore = AvroDsv2.listFiles(dir, conf)
    assert(filesBefore.size > 2, filesBefore.toString)
    val before = contents(dir)
    graft.ops.Layout.compact(dir, Long.MaxValue / 4)
    val after = AvroDsv2.listFiles(dir, conf)
    assert(after.size === 2, s"one container per partition dir: $after")
    assert(after.forall { case (p, _) => p.contains("lang=") })
    assert(contents(dir) === before)
    // partition pruning still works on the compacted layout
    assert(spark.read.format("graft-avro").load(dir)
      .where(col("lang") === "L1").count() === 300L)
  }

  test("compaction merges evolved schemas with null-fill") {
    val dir = tempDir()
    AvroSink.write(spark.range(50).select(col("id")).coalesce(1), dir,
      overwrite = true)
    AvroSink.write(spark.range(50, 100)
      .select(col("id"), (col("id") * 2).as("v")).coalesce(1), dir)
    graft.ops.Layout.compact(dir, Long.MaxValue / 4)
    assert(AvroDsv2.listFiles(dir, conf).size === 1)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.columns.toSeq === Seq("id", "v"))
    assert(back.count() === 100L)
    assert(back.where(col("v").isNull).count() === 50L,
      "old-schema rows must null-fill the appended column")
    assert(back.where(col("v") === col("id") * 2).count() === 50L)
  }

  test("crash recovery: both manifest paths repair exactly") {
    val dir = tempDir()
    AvroSink.write(spark.range(400).select(col("id")).repartition(4), dir,
      overwrite = true)
    val before = contents(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // crash BEFORE the commit point: manifest + temp, no final file
    val orphanTemp = new org.apache.hadoop.fs.Path(dir,
      ".graft-cmp-deadbeef.avro.tmp")
    fs.create(orphanTemp, true).close()
    val m1 = om.createObjectNode()
    m1.put("final", "compact-deadbeef.avro")
    m1.putArray("sources") // empty: nothing to delete
    val m1p = new org.apache.hadoop.fs.Path(dir,
      ".graft-cmp-deadbeef.manifest.json")
    val o1 = fs.create(m1p, true); o1.write(om.writeValueAsBytes(m1)); o1.close()
    // crash AFTER the commit point: final exists, one source undeleted.
    // Simulate by compacting a COPY of one source into a "final" file:
    // here the final is a real readable container (a copy of source 0)
    val files = AvroDsv2.listFiles(dir, conf)
    val src0 = files.head._1
    val finalP = new org.apache.hadoop.fs.Path(dir, "compact-cafebabe.avro")
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src0),
      fs, finalP, false, conf)
    val m2 = om.createObjectNode()
    m2.put("final", "compact-cafebabe.avro")
    val arr = m2.putArray("sources"); arr.add(src0)
    val m2p = new org.apache.hadoop.fs.Path(dir,
      ".graft-cmp-cafebabe.manifest.json")
    val o2 = fs.create(m2p, true); o2.write(om.writeValueAsBytes(m2)); o2.close()
    // recovery runs at the START of compact (huge target -> also compacts)
    graft.ops.Layout.compact(dir, Long.MaxValue / 4)
    assert(!fs.exists(orphanTemp), "pre-commit crash: temp must be swept")
    assert(!fs.exists(m1p) && !fs.exists(m2p), "manifests must be consumed")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(src0)),
      "post-commit crash: the undeleted source must be removed")
    // the table's CONTENT is exactly the original rows (the copied final
    // replaced src0 one-for-one; recovery removed the duplicate source)
    assert(contents(dir) === before,
      "recovery must converge to exactly-once content")
  }
}
