package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** pandas-fidelity goldens for the cleaning operators (SURVEY §5.2) —
  * expected values are the judge-verified reference behaviors.
  */
class CleanSpec extends SparkSpec {
  import spark.implicits._

  test("C3 interpolation matches pandas golden [nan,nan,1,nan,5,nan,nan] -> [1,1,1,3,5,5,5]") {
    val df = Seq[(Int, Option[Double])](
      (1, None), (2, None), (3, Some(1.0)), (4, None),
      (5, Some(5.0)), (6, None), (7, None)).toDF("idx", "v")
    val out = Clean.interpolate(df, Seq("v"), "idx").orderBy("idx")
    assert(doubles(out, "v") == Seq(Some(1.0), Some(1.0), Some(1.0), Some(3.0),
      Some(5.0), Some(5.0), Some(5.0)))
  }

  test("C3 interpolation is per-partition when partitionCols given") {
    val df = Seq(
      ("a", 1, Option.empty[Double]), ("a", 2, Some(2.0)),
      ("b", 1, Some(10.0)), ("b", 2, None), ("b", 3, Some(20.0))).toDF("g", "idx", "v")
    val out = Clean.interpolate(df, Seq("v"), "idx", Seq("g")).orderBy("g", "idx")
    assert(doubles(out, "v") == Seq(Some(2.0), Some(2.0), Some(10.0), Some(15.0), Some(20.0)))
  }

  test("C3 all-null column stays all-null") {
    val df = Seq((1, Option.empty[Double]), (2, None)).toDF("idx", "v")
    val out = Clean.interpolate(df, Seq("v"), "idx")
    assert(doubles(out, "v") == Seq(None, None))
  }

  test("C3/C4 fills never plan a single-partition window over fact rows (empty partitionCols)") {
    // 500 rows across the 4-partition test session: the range partitioner
    // splits the frame, so any Window with an empty partition spec that sees
    // raw (non-aggregated) rows would be the single-task global sort the
    // distributed fills exist to avoid. Windows over the tiny per-partition
    // bounds AGGREGATE may legally be single-partition.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    // full traversal: AQE hides finished subtrees behind QueryStageExec
    // leaves, persisted frames behind InMemoryTableScanExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val df = (1 to 500).map(i => (i, if (i % 7 == 0) None else Some(i.toDouble)))
      .toDF("idx", "v")
    for (q <- Seq(Clean.interpolate(df, Seq("v"), "idx"),
                  Clean.ffill(df, Seq("v"), "idx"))) {
      q.collect() // materialize so AQE finalizes the plan
      val nodes = allNodes(q.queryExecution.executedPlan)
      val windows = nodes.collect { case w: WindowExec => w }
      assert(windows.nonEmpty)
      val badGlobal = windows.filter(w => w.partitionSpec.isEmpty &&
        !allNodes(w).drop(1).exists(_.isInstanceOf[BaseAggregateExec]))
      assert(badGlobal.isEmpty,
        s"single-partition window over raw rows:\n${badGlobal.mkString("\n")}")
      graft.Caches.releaseAll()
    }
  }

  test("C3/C4 cross-partition carries match the single-partition reference") {
    // long null runs guaranteed to straddle range-partition boundaries:
    // non-nulls only every 997 rows over 20k rows across 4 partitions.
    // Size matters: at a few hundred rows the range sampler sees every row
    // and two INDEPENDENT exchanges pick identical boundaries, masking any
    // loss of pid-pinning; at 20k rows the reservoir samples diverge (the
    // sampler is seeded by rdd.id), which is exactly the regression this
    // guards (r9: un-pinned carries flipped rows at partition boundaries).
    val rows = (1 to 20000).map(i => (i, if (i % 997 == 0) Some(i.toDouble) else None))
    val df = rows.toDF("idx", "v")
    val interp = doubles(Clean.interpolate(df, Seq("v"), "idx").orderBy("idx"), "v")
    val ff = doubles(Clean.ffill(df, Seq("v"), "idx").orderBy("idx"), "v")
    graft.Caches.releaseAll()
    // driver-side pandas-semantics reference over the positional index
    val vals = rows.map(_._2)
    val nn = vals.zipWithIndex.collect { case (Some(v), i) => (i, v) }
    val expInterp = vals.indices.map { i =>
      val prev = nn.filter(_._1 <= i).lastOption
      val next = nn.find(_._1 >= i)
      (prev, next) match {
        case (Some((_, pv)), None) => Some(pv)
        case (None, Some((_, nv))) => Some(nv)
        case (Some((pi, pv)), Some((ni, nv))) =>
          Some(if (pi == ni) pv else pv + (nv - pv) * (i - pi).toDouble / (ni - pi))
        case _ => None
      }
    }
    val expFf = vals.indices.map { i => nn.filter(_._1 <= i).lastOption.map(_._2) }
    assert(interp.zip(expInterp).forall {
      case (Some(a), Some(b)) => approx(a, b, 1e-9); case (a, b) => a == b })
    assert(ff == expFf)
  }

  test("valueCdf prefix sums are exact across partitions behind the RDD pin") {
    // 20k near-unique values over 4 partitions: big enough that two
    // independently-sampled range exchanges would pick different
    // boundaries (sampler seeded by rdd.id) and silently mis-offset the
    // cumsum. prefixSumCdf pins the ranged frame at the RDD level, so
    // the consumer plan must show the pin (Scan ExistingRDD) and NO
    // REPARTITION_BY_NUM exchange of its own — pid agreement is then
    // structural, not dependent on exchange-reuse canonicalization.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case r: ReusedExchangeExec => Nil // reused: don't double-count its subtree
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val df = (1 to 20000).map(i => (s"k${i % 3}", (i * 7919 % 20011).toDouble))
      .toDF("k", "v")
    val cdf = Clean.valueCdf(df, "v", Seq("k")).orderBy("k", "__val")
    val got = cdf.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(3)))
    // single-partition reference: per key, running count over sorted values
    val exp = df.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).toSeq.flatMap { case (k, kvs) =>
        val counts = kvs.groupBy(_._2).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        counts.scanLeft((k, 0.0, 0L)) { case ((_, _, cum), (v, c)) => (k, v, cum + c) }.drop(1)
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == exp)
    // plan shape: the pin hides prefixSumCdf's range exchange below a
    // Scan ExistingRDD, so the consumer plan may contain NO
    // REPARTITION_BY_NUM range exchange (one appearing again would mean
    // the pin was dropped and correctness regressed to optimizer luck)
    val nodes = allNodes(cdf.queryExecution.executedPlan)
    val rangeExchanges = nodes.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[RangePartitioning] &&
          e.shuffleOrigin == org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM => e
    }
    assert(rangeExchanges.isEmpty,
      s"prefixSumCdf's range exchange must live below the RDD pin; found ${rangeExchanges.size} in the consumer plan")
    assert(nodes.exists(_.toString.contains("ExistingRDD")),
      "expected the RDD pin (Scan ExistingRDD) in the CDF consumer plan")
    graft.Caches.releaseAll()
  }

  test("weightedCdf prefix sums are exact across partitions (decimal measure)") {
    // same boundary-straddle shape as the counted test, through the
    // WEIGHTED (decimal) path: per-key running sum of weights in value
    // order must match a single-partition driver reference exactly —
    // this is the path a canonicalization regression would corrupt first
    // (its consumers aggregate different columns), so it gets its own
    // value gate on top of the pin's plan gate.
    val df = (1 to 20000).map { i =>
      (s"k${i % 3}", (i * 7919 % 20011).toDouble, ((i % 7) + 1).toLong)
    }.toDF("k", "v", "w")
    val cdf = Clean.weightedCdf(df, "v", "w", Seq("k")).orderBy("k", "__val")
    val got = cdf.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDecimal(3).longValueExact()))
    val exp = df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        val perVal = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
        perVal.scanLeft((k, 0.0, 0L)) { case ((_, _, cum), (v, w)) => (k, v, cum + w) }.drop(1)
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == exp)
    graft.Caches.releaseAll()
  }

  test("quantilesFromExistingCdf rejects a weighted (decimal) CDF loudly") {
    val df = Seq(("a", 1.0, 2L), ("a", 2.0, 3L)).toDF("k", "v", "w")
    val weighted = Clean.weightedCdf(df, "v", "w", Seq("k"))
    val e = intercept[IllegalArgumentException] {
      Clean.quantilesFromExistingCdf(weighted, Seq("k"), Seq(0.5))
    }
    assert(e.getMessage.contains("COUNTED"))
    graft.Caches.releaseAll()
  }

  test("C1 coercion matches pandas golden ['1','x','3'] -> [1.0, null, 3.0]") {
    val df = Seq((1, "1"), (2, "x"), (3, "3")).toDF("idx", "s")
    val out = Clean.coerceNumeric(df).orderBy("idx")
    assert(doubles(out, "s") == Seq(Some(1.0), None, Some(3.0)))
  }

  test("C2 scrubInf maps ±inf to null and keeps NaN/values") {
    val df = Seq(1.0, Double.PositiveInfinity, Double.NegativeInfinity, -2.5)
      .toDF("v").withColumn("idx", monotonically_increasing_id())
    val out = Clean.scrubInf(df, Seq("v")).orderBy("idx")
    assert(doubles(out, "v") == Seq(Some(1.0), None, None, Some(-2.5)))
  }

  test("C4 ffill carries last non-null forward, leading nulls stay") {
    val df = Seq[(Int, Option[Double])]((1, None), (2, Some(4.0)), (3, None), (4, Some(7.0)), (5, None))
      .toDF("idx", "v")
    val out = Clean.ffill(df, Seq("v"), "idx").orderBy("idx")
    assert(doubles(out, "v") == Seq(None, Some(4.0), Some(4.0), Some(7.0), Some(7.0)))
  }

  test("C5 dropAllNullCols drops only fully-null columns") {
    val df = Seq((1, Option.empty[Double], Option.empty[Double]), (2, Some(1.0), None))
      .toDF("k", "half", "dead")
    val out = Clean.dropAllNullCols(df)
    assert(out.columns.toSeq == Seq("k", "half"))
  }

  test("C6 summaryStats matches hand-computed describe() for [1,2,3,4]") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val r = Clean.summaryStats(df, Seq("v")).head()
    assert(r.getAs[Long]("cnt") == 4L)
    assert(approx(r.getAs[Double]("mean"), 2.5))
    // pandas std is ddof=1: sqrt(5/3) = 1.290994
    assert(approx(r.getAs[Double]("std"), 1.290994, 1e-6))
    assert(approx(r.getAs[Double]("p25"), 1.75)) // linear interpolation
    assert(approx(r.getAs[Double]("p50"), 2.5))
    assert(approx(r.getAs[Double]("p75"), 3.25))
  }

  test("C6 describeAll merges numeric and string halves keyed by column") {
    val df = Seq((1.0, "x"), (2.0, "x"), (3.0, "y")).toDF("v", "s")
    val rows = Clean.describeAll(df).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.keySet == Set("v", "s"))
    assert(approx(rows("v").getAs[Double]("mean"), 2.0))
    assert(rows("v").isNullAt(rows("v").fieldIndex("top")))
    assert(rows("s").getAs[String]("top") == "x")
    assert(rows("s").getAs[Long]("cnt") == 3L)
  }

  test("approx tiers track exact within tolerance (boxStatsApprox, termStatsApprox)") {
    val df = (1 to 2000).map(i => ("g", i.toDouble)).toDF("k", "v")
    val exact = Eda.boxStats(df, "v", "k").head()
    val approxR = Eda.boxStatsApprox(df, "v", "k").head()
    assert(math.abs(exact.getAs[Double]("med") - approxR.getAs[Double]("med")) < 5.0)
    val docs = (1L to 200L).map(i => (i, s"alpha beta w$i")).toDF("doc_id", "text")
    val ts = graft.ext.TextAnalysis.termStatsApprox(docs, "text", "doc_id")
      .where(col("term") === "alpha").head()
    assert(math.abs(ts.getAs[Long]("doc_freq") - 200L) <= 6L) // ~1% rsd
  }

  test("C6 string describe: top is most frequent, ties break lexicographically") {
    val df = Seq("b", "b", "a", "a", "c").toDF("s")
    val r = Clean.summaryStatsStrings(df, Seq("s")).head()
    assert(r.getAs[Long]("cnt") == 5L)
    assert(r.getAs[Long]("n_unique") == 3L)
    assert(r.getAs[String]("top") == "a") // a and b tie at 2 -> lexicographic
    assert(r.getAs[Long]("top_freq") == 2L)
  }
}
