package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionPlanSpec extends SparkSpec {
  import spark.implicits._

  // 40 "files": sizes 5..200 step 5, ids reversed so the tie order matters
  private val inv = (1 to 40).map(i => (s"f${41 - i}", 5L * i))
    .toDF("path", "bytes")

  test("bins are contiguous target windows of the size-desc cumulative mass") {
    val target = 300L
    val out = Layout.compactionPlan(inv, "bytes", Seq("path"), target)
      .select("path", "bytes", "cum_before", "bin")
      .as[(String, Long, Long, Long)].collect()
      .sortBy(r => (-r._2, r._1))
    assert(out.length === 40)
    // prefix sum is exclusive and consistent with the declared order
    out.foldLeft(0L) { case (acc, (_, b, cum, bin)) =>
      assert(cum === acc)
      assert(bin === acc / target)
      acc + b
    }
    // every non-final bin's cumulative coverage reaches the next window
    // boundary (its last file ends at or past (bin+1)*target), and a
    // bin's own fill deviates from target by at most one straddling file
    val byBin = out.groupBy(_._4)
    val lastBin = byBin.keys.max
    byBin.foreach { case (bin, files) =>
      val fill = files.map(_._2).sum
      val end = files.map(f => f._3 + f._2).max
      val largest = files.map(_._2).max
      if (bin != lastBin) {
        assert(end >= (bin + 1) * target, s"bin $bin stops short: end=$end")
        assert(fill >= target - largest, s"bin $bin underfull: $fill")
      }
      assert(fill <= target + largest, s"bin $bin overshoots: $fill")
    }
    val fills = byBin.view.mapValues(_.map(_._2).sum).toMap
    assert(fills.values.sum === inv.agg(sum("bytes")).as[Long].head())
  }

  test("assignment is invariant to input partitioning") {
    val a = Layout.compactionPlan(inv.repartition(7), "bytes", Seq("path"), 300L)
      .select("path", "bin").as[(String, Long)].collect().toSet
    val b = Layout.compactionPlan(inv.coalesce(1), "bytes", Seq("path"), 300L)
      .select("path", "bin").as[(String, Long)].collect().toSet
    assert(a === b)
  }
}
