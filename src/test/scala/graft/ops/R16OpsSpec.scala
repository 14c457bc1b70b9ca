package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r16 analytics wave: k-fold assignment, DP noisy counts, seasonal-
  * naive backtest (MASE), leave-one-group-out slope influence, kNN
  * label-vote classification.
  */
class R16OpsSpec extends SparkSpec {
  import spark.implicits._

  test("foldAssign: folds in [0,k), deterministic, partitioning the rows") {
    val df = spark.range(1000).select(col("id"))
    val a = Sampling.foldAssign(df, "id", 5)
    val folds = a.select("fold").distinct().as[Int].collect().sorted
    assert(folds.forall(f => f >= 0 && f < 5))
    assert(a.count() === 1000L)
    // every fold is populated and roughly balanced (hash-mod, ±O(√n))
    val sizes = a.groupBy("fold").count().select("count").as[Long].collect()
    assert(sizes.length === 5)
    assert(sizes.min > 120 && sizes.max < 280, sizes.mkString(","))
    // rerun = identical assignment (pure hash of the id)
    val b = Sampling.foldAssign(df, "id", 5)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    intercept[IllegalArgumentException](Sampling.foldAssign(df, "id", 1))
    // null ids land in ONE deterministic fold, never fold = null
    val withNulls = spark.range(10).select(
      when(col("id") < 3, lit(null)).otherwise(col("id")).as("id"))
    val nf = Sampling.foldAssign(withNulls, "id", 5)
    assert(nf.where(col("fold").isNull).count() === 0)
    assert(nf.where(col("id").isNull).select("fold")
      .distinct().count() === 1)
  }

  test("dpNoisyCounts: real counts plus bounded deterministic Laplace noise") {
    val df = Seq.fill(40)("en").++(Seq.fill(10)("de")).toDF("lang")
    val out = Quality.dpNoisyCounts(df, "lang", epsilon = 1.0)
      .orderBy("lang").collect()
    assert(out.length === 2)
    val de = out(0); val en = out(1)
    assert(de.getString(0) === "de" && de.getLong(1) === 10L)
    assert(en.getString(0) === "en" && en.getLong(1) === 40L)
    // Laplace(1) noise: finite, nonzero with overwhelming probability,
    // and typically small relative to the count
    Seq(de, en).foreach { r =>
      val noise = r.getDouble(2) - r.getLong(1)
      assert(!noise.isNaN && !noise.isInfinite)
      assert(math.abs(noise) < 30.0, s"implausible noise $noise")
    }
    // deterministic by construction (md5 of the category)
    val again = Quality.dpNoisyCounts(df, "lang", epsilon = 1.0)
      .orderBy("lang").collect()
    assert(again.map(_.getDouble(2)).toSeq === out.map(_.getDouble(2)).toSeq)
    // tighter epsilon = larger noise scale for the same uniform
    val loose = Quality.dpNoisyCounts(df, "lang", epsilon = 0.1)
      .orderBy("lang").collect()
    Seq(0, 1).foreach { i =>
      val n1 = math.abs(out(i).getDouble(2) - out(i).getLong(1))
      val n10 = math.abs(loose(i).getDouble(2) - loose(i).getLong(1))
      assert(approx(n10, 10.0 * n1, 1e-4), s"scale: $n1 vs $n10")
    }
    intercept[IllegalArgumentException](Quality.dpNoisyCounts(df, "lang", 0.0))
  }

  test("backtestSeasonalNaive: a perfect weekly cycle scores MASE 0") {
    // value(t) = t mod 7 -> seasonal-naive is exact, naive-1 is not
    val series = (0 until 70).map(t => ("k", t, (t % 7).toDouble))
      .toDF("key", "t", "v")
    val out = graft.ml.Eval.backtestSeasonalNaive(series, Seq("key"),
      "t", "v", period = 7).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 63L) // 70 - 7 eval rows
    assert(r.getDouble(2) === 0.0) // mae_seasonal
    assert(r.getDouble(3) > 0.0) // mae_naive: steps of 1 and 6
    assert(r.getDouble(4) === 0.0) // mase
    // a trend series: seasonal lag is WORSE than naive-1 -> mase > 1
    val trend = (0 until 70).map(t => ("k", t, t.toDouble)).toDF("key", "t", "v")
    val tr = graft.ml.Eval.backtestSeasonalNaive(trend, Seq("key"),
      "t", "v", period = 7).collect().head
    assert(tr.getDouble(4) === 7.0) // |7| vs |1| errors everywhere
    intercept[IllegalArgumentException](
      graft.ml.Eval.backtestSeasonalNaive(series, Seq("key"), "t", "v", 1))
  }

  test("leaveOneGroupOutSlope: removing a group recovers the other group's slope") {
    // group a: y = 2x exactly; group b: y = 5x exactly
    val a = (1 to 20).map(i => ("a", i.toDouble, 2.0 * i))
    val b = (1 to 20).map(i => ("b", i.toDouble, 5.0 * i))
    val out = graft.ml.Eval.leaveOneGroupOutSlope(
      (a ++ b).toDF("g", "x", "y"), "g", "x", "y")
      .orderBy("g").collect()
    assert(out.length === 2)
    val woA = out(0) // without a -> slope of b alone = 5
    val woB = out(1)
    assert(woA.getDouble(3) === 5.0, woA.toString)
    assert(woB.getDouble(3) === 2.0, woB.toString)
    assert(woA.getDouble(2) === woB.getDouble(2)) // same full slope
    // influences pull in opposite directions around the pooled fit
    assert(woA.getDouble(4) > 0 && woB.getDouble(4) < 0)
  }

  test("cvLinreg: exact linear data gives every fold the true line and MSE 0") {
    val df = (1 to 200).map(i => (i.toLong, i.toDouble, 3.0 * i + 1.0))
      .toDF("id", "x", "y")
    val out = graft.ml.Eval.cvLinreg(df, "id", "x", "y", k = 5).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) < 5)
      assert(r.getLong(1) + r.getLong(2) === 200L) // n_test + n_train
      assert(r.getDouble(3) === 3.0, r.toString) // slope
      assert(r.getDouble(4) === 1.0, r.toString) // intercept
      assert(r.getDouble(5) === 0.0, r.toString) // held-out mse
    }
    // noisy group: mse strictly positive, slope near the signal
    val noisy = (1 to 200).map(i =>
      (i.toLong, i.toDouble, 3.0 * i + (if (i % 2 == 0) 5.0 else -5.0)))
      .toDF("id", "x", "y")
    val n = graft.ml.Eval.cvLinreg(noisy, "id", "x", "y", k = 4).collect()
    assert(n.forall(_.getDouble(5) > 0.0))
    assert(n.forall(r => math.abs(r.getDouble(3) - 3.0) < 0.1))
  }

  test("welchTTest: hand-computed two-sample statistic and Welch df") {
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(2.0, 4.0, 6.0, 8.0).map(("b", _))).toDF("g", "v")
    val r = graft.ml.Eval.welchTTest(df, "v", col("g") === "b")
      .collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L)
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 5.0)
    // ma=2 va=1 sea=1/3; mb=5 vb=20/3 seb=5/3; t=-3/sqrt(2)
    assert(approx(r.getDouble(4), -3.0 / math.sqrt(2.0), 1e-6))
    val sea = 1.0 / 3.0; val seb = 5.0 / 3.0
    val dfW = math.pow(sea + seb, 2) /
      (sea * sea / 2.0 + seb * seb / 3.0)
    assert(approx(r.getDouble(5), dfW, 1e-5))
  }

  test("keynessLLR: focus-only terms lean focus, balanced terms lean even") {
    val docs = (
      Seq.fill(30)((1L, "alpha common", "en")) ++
      Seq.fill(30)((2L, "beta common", "de"))
    ).zipWithIndex.map { case ((_, t, l), i) => (i.toLong, t, l) }
      .toDF("doc_id", "text", "lang")
    val out = graft.ext.TextAnalysis.keynessLLR(docs, "text",
      col("lang") === "en", minCount = 20L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))).toMap
    val (af, ar, ag, al) = out("alpha")
    assert(af === 30L && ar === 0L && al === "focus" && ag > 10.0)
    val (bf, br, bg, bl) = out("beta")
    assert(bf === 0L && br === 30L && bl === "ref" && bg > 10.0)
    val (cf, cr, cg, cl) = out("common")
    assert(cf === 30L && cr === 30L && cl === "even" && cg === 0.0)
    // symmetric corpus: alpha's keyness equals beta's
    assert(ag === bg)
  }

  test("burstiness: clumped terms score high VMR, uniform terms near 1") {
    // "glue" appears once in every doc (VMR -> 0: constant counts);
    // "burst" appears 10 times in one tenth of the docs (bursty)
    val docs = (0 until 100).map { i =>
      val body = if (i % 10 == 0) ("burst " * 10) + "glue" else "glue"
      (i.toLong, body)
    }.toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.burstiness(docs, "text", "doc_id",
      minCount = 50L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (gt, gdf, gv) = out("glue")
    assert(gt === 100L && gdf === 100L)
    assert(gv === 0.0) // constant 1-per-doc: zero variance
    val (bt, bdf, bv) = out("burst")
    assert(bt === 100L && bdf === 10L)
    // counts: ten docs of 10, ninety of 0 -> mean 1, var 9, VMR 9
    assert(bv === 9.0, bv.toString)
  }

  test("knnClassify: separable clusters vote their own label") {
    // two tight clusters on orthogonal axes; ids 0/1 are the queries
    def v(base: Seq[Double], j: Int): Seq[Double] =
      base.zipWithIndex.map { case (x, i) => x + (if (i == j % 3) 0.01 * j else 0.0) }
    val rows =
      (0 until 12).map(i => (i.toLong, v(Seq(1.0, 0.0, 0.05), i), 7)) ++
      (12 until 24).map(i => (i.toLong, v(Seq(0.0, 1.0, 0.05), i), 9))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.knnClassify(df, "vec_id", "embedding",
      "label", col("vec_id") === 0 || col("vec_id") === 12, k = 5)
      .collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"query ${r.getLong(0)}: predicted ${r.getInt(2)} != actual ${r.getInt(1)}")
      assert(r.getLong(3) === 5L) // unanimous within the cluster
    }
    // the scoring side must broadcast the bounded query sample
    val plan = graft.ext.Similarity.knnClassify(df, "vec_id", "embedding",
      "label", col("vec_id") === 0, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("Broadcast"),
      plan)
  }
}
