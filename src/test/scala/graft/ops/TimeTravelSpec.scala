package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, 100.0), (2L, 200.0), (3L, 300.0))
    .toDF("k", "price")
  // v1: upsert k=1 -> 110; v2: delete k=2; v3: upsert k=2 -> 250 (rebirth),
  // v4: delete k=1
  private val log = Seq(
    (1L, 1L, "u", Some(110.0)),
    (2L, 2L, "d", None),
    (2L, 3L, "u", Some(250.0)),
    (1L, 4L, "d", None)
  ).toDF("k", "v", "op", "price")

  private def snap(asOf: Long): Map[Long, Double] =
    Merge.snapshotAsOf(base, log, Seq("k"), "v", "op", Seq("price"), asOf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("as-of reconstructs each version's state") {
    assert(snap(0) === Map(1L -> 100.0, 2L -> 200.0, 3L -> 300.0)) // pre-log
    assert(snap(1) === Map(1L -> 110.0, 2L -> 200.0, 3L -> 300.0))
    assert(snap(2) === Map(1L -> 110.0, 3L -> 300.0)) // k=2 deleted
    assert(snap(3) === Map(1L -> 110.0, 2L -> 250.0, 3L -> 300.0)) // reborn
    assert(snap(4) === Map(2L -> 250.0, 3L -> 300.0)) // k=1 deleted last
  }

  test("a delete then later upsert resurrects the key (latest wins)") {
    assert(snap(3).get(2L).contains(250.0))
  }

  test("untouched keys always come from the base") {
    (0L to 4L).foreach(v => assert(snap(v).get(3L).contains(300.0)))
  }

  test("the per-key winner is an aggregate, not a window sort") {
    val plan = Merge.snapshotAsOf(base, log, Seq("k"), "v", "op",
        Seq("price"), 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"no aggregate in plan:\n$plan")
  }

  test("compaction preserves every snapshot at or above the watermark") {
    (0L to 4L).foreach { w =>
      val (nb, nl) = Merge.compactLog(base, log, Seq("k"), "v", "op",
        Seq("price"), watermark = w)
      (w to 4L).foreach { v =>
        val got = Merge.snapshotAsOf(nb, nl, Seq("k"), "v", "op",
            Seq("price"), v)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got === snap(v), s"watermark=$w, asOf=$v diverged")
      }
      // and the truncated log is exactly the above-watermark suffix
      assert(nl.agg(org.apache.spark.sql.functions.min(col("v"))).head()
        .isNullAt(0) || nl.agg(org.apache.spark.sql.functions.min(col("v")))
        .head().getLong(0) > w)
    }
  }

  test("multi-boundary compaction replays exactly at every retained boundary") {
    // tiered retention: boundaries {1, 3} — base folds <= 1, band (1,3]
    // keeps ONE winner per key, tail v=4 verbatim
    val (nb, nl) = Merge.compactLog(base, log, Seq("k"), "v", "op",
      Seq("price"), boundaries = Seq(1L, 3L))
    def replay(v: Long): Map[Long, Double] =
      Merge.snapshotAsOf(nb, nl, Seq("k"), "v", "op", Seq("price"), v)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // exact at each retained boundary and at/above the newest one
    Seq(1L, 3L, 4L).foreach(v => assert(replay(v) === snap(v),
      s"boundary replay diverged at v=$v"))
    // the band (1,3] collapsed k=2's delete(v2)+upsert(v3) to ONE entry
    val bandRows = nl.where(col("v") > 1 && col("v") <= 3).collect()
    assert(bandRows.length === 1, bandRows.mkString(","))
    assert(bandRows.head.getAs[Long]("v") === 3L, "winner keeps its version")
    // the tail is verbatim
    assert(nl.where(col("v") > 3).count() === 1)
  }

  test("multi-boundary compaction rejects unsorted boundary lists") {
    intercept[IllegalArgumentException] {
      Merge.compactLog(base, log, Seq("k"), "v", "op", Seq("price"),
        boundaries = Seq(3L, 1L))
    }
    intercept[IllegalArgumentException] {
      Merge.compactLog(base, log, Seq("k"), "v", "op", Seq("price"),
        boundaries = Seq.empty[Long])
    }
  }

  test("the version predicate PRUNES partitions of a version-banded CDC log") {
    // the 100 TB shape: the log is laid out partitioned by version band,
    // so `v <= asOf` must land in PartitionFilters (files of later bands
    // are never opened), not just as a row filter after a full scan
    val dir = java.nio.file.Files.createTempDirectory("graft_tt_log").toString
    log.write.partitionBy("v").mode("overwrite").parquet(dir)
    val logOnDisk = spark.read.parquet(dir)
    val snap = Merge.snapshotAsOf(base, logOnDisk, Seq("k"), "v", "op",
      Seq("price"), asOfVersion = 2)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scansOf)
    }
    val scans = scansOf(snap.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains(dir)))
    assert(scans.nonEmpty, "no file scan over the CDC log found")
    scans.foreach { f =>
      val pf = f.partitionFilters.map(_.sql).mkString(" AND ")
      assert(f.partitionFilters.exists(_.references.exists(_.name == "v")),
        s"version predicate missing from PartitionFilters: [$pf]")
      // and the pruning is effective: only bands v=1,2 survive listing
      val parts = f.selectedPartitions.toPartitionArray
        .map(_.urlEncodedPath).distinct.toSeq
      assert(parts.nonEmpty && parts.forall(p => p.contains("v=1") || p.contains("v=2")),
        s"unpruned log files read: ${parts.mkString(", ")}")
    }
    // correctness through the on-disk banded log is unchanged
    val got = snap.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 110.0, 3L -> 300.0))
  }
}
