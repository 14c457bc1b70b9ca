package graft.ops

import graft.SparkSpec
import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-5 operators: schema-drift report, bigram collocations,
  * ignore-nulls windows via the registered query shapes.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  test("schemaDiff: both/left_only/right_only statuses and type comparison") {
    val left = Seq((1L, "a", 1.5)).toDF("x_id", "x_name", "x_score")
    val right = Seq((2, "b", true)).toDF("y_id", "y_name", "y_flag")
    val diff = Harmonize.schemaDiff(left, right, _.replaceFirst("^[xy]_", ""))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)).orNull, Option(r.getString(3)).orNull,
        if (r.isNullAt(4)) null else Boolean.box(r.getBoolean(4)))).toSeq
    assert(diff === Seq(
      ("flag", "right_only", null, "boolean", null),
      ("id", "both", "bigint", "integer", Boolean.box(false)),
      ("name", "both", "varchar", "varchar", Boolean.box(true)),
      ("score", "left_only", "double", null, null)))
  }

  test("schemaDiff is sorted, constant-size, and scans no data") {
    // a diff over a wide-but-huge table must not trigger a job on the data
    val left = spark.range(0).selectExpr("id", "cast(id as double) d")
    val right = spark.range(0).selectExpr("id", "cast(id as string) d")
    val rows = Harmonize.schemaDiff(left, right).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("d", "id"))
    assert(rows.find(_.getString(0) == "d").get.getBoolean(4) === false)
  }

  test("collocations: lift matches the hand formula on a tiny corpus") {
    // corpus: "big data" appears twice adjacent, tokens counted exactly
    val docs = Seq(
      (1L, "big data big data"),
      (2L, "big apple"),
      (3L, "data lake")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // tokens U = 8; bigrams B = 3 + 1 + 1 = 5
    // "big data": n_ab=2, n_big=3, n_data=3 ->
    // lift = (2/5) / ((3/8)*(3/8)) = 0.4 / 0.140625 = 2.844444
    assert(out.toSeq === Seq(("big", "data", 2L, 2.844444)))
  }

  test("collocations: single-token and empty docs contribute no bigrams") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 1)
    assert(out.count() === 1) // only ("a","b")
    val r = out.head()
    assert((r.getString(0), r.getString(1), r.getLong(2)) === ("a", "b", 1L))
  }

  test("fkOrphans counts unresolved FKs; null FKs are not orphans") {
    val fact = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.fkOrphans(Seq(Quality.FkEdge("f->d", fact, "fk", dim, "pk")))
      .collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("f->d", 1L)))
  }

  test("profile: distinct excludes nulls, null count exact") {
    val df = Seq(Some(1), Some(1), Some(2), None).toDF("x")
    val out = Quality.profile(df, Seq("x")).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("x", 2L, 1L)))
  }

  test("crosstabChi2: cell terms sum to the textbook chi2 statistic") {
    // 2x2 table: [[10, 20], [30, 40]] -> chi2 = 100*(10*40-20*30)^2/(30*70*40*60)
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val df = rows.toDF("u", "v")
    val out = Eda.crosstabChi2(df, "u", "v")
    val chi2 = out.agg(sum("chi2_term")).head().getDouble(0)
    val expected = 100.0 * math.pow(10 * 40 - 20 * 30, 2) / (30.0 * 70 * 40 * 60)
    assert(approx(chi2, expected, 1e-4))
    // expected counts: row_total*col_total/grand, e.g. cell (a,x) = 30*40/100
    val ax = out.where(col("a") === "a" && col("b") === "x").head()
    assert(approx(ax.getDouble(3), 12.0))
  }

  test("quantileRank: ties share a rank, nulls pass through, max is 1.0") {
    val df = Seq(Some(10.0), Some(10.0), Some(20.0), Some(40.0), None).toDF("x")
    val out = Preprocess.quantileRank(df, Seq("x"))
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
         if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSeq.sortBy(_._1)
    assert(out === Seq(
      (None, None),
      (Some(10.0), Some(0.5)), (Some(10.0), Some(0.5)),
      (Some(20.0), Some(0.75)), (Some(40.0), Some(1.0))))
  }

  test("quantileRank matches cume_dist on a null-free column") {
    val df = spark.range(1, 101).select((col("id") % 13).cast("double").as("x"))
    val viaOp = Preprocess.quantileRank(df, Seq("x"))
      .groupBy("x").agg(first("x_qrank").as("qr")).orderBy("x")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val viaWindow = df.select(col("x"), cume_dist().over(
        org.apache.spark.sql.expressions.Window.orderBy("x")).as("cd"))
      .groupBy("x").agg(round(first("cd"), 6).as("cd")).orderBy("x")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(viaOp === viaWindow)
  }

  test("plan: q_tpch_q19 pushes the OR residual to the part side of a broadcast join") {
    val q = graft.SparkEntry.queries("q_tpch_q19")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    // the brand/size disjunction must filter part BEFORE the join (scan-level
    // pushdown of the extracted part-only predicate)
    val scans = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.exists(s => s.contains("part") && s.contains("PushedFilters")
      && s.contains("p_brand")), "p_brand predicate not pushed to the part scan")
  }

  test("plan: q_tpch_q4 EXISTS becomes a left-semi join, no aggregate-side shuffle of lineitem") {
    val q = graft.SparkEntry.queries("q_tpch_q4")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a left-semi join:\n$plan")
  }

  test("plan: q_p4_quantile_rank windows over distinct values, joins broadcast") {
    val q = graft.SparkEntry.queries("q_p4_quantile_rank")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the CDF to broadcast back to the fact table:\n$plan")
    // the Window must sit above an aggregate (distinct values), not the scan
    assert(plan.contains("Window"), s"expected a window over the CDF:\n$plan")
  }

  test("recode: mapped values translate; keepUnmapped toggles pass-through vs null") {
    val df = Seq("a", "b", "c").toDF("k")
    val kept = Harmonize.recode(df, "k", Seq("a" -> "A", "b" -> "B"))
      .orderBy("k").collect().map(_.getString(0)).toSeq
    assert(kept === Seq("A", "B", "c"))
    val mapped = Harmonize.recode(df, "k", Seq("a" -> "A"), keepUnmapped = false)
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(mapped.sortBy(_.getOrElse("")) === Seq(None, None, Some("A")))
  }

  test("spearmanMatrix: monotonic is 1.0; midrank ties match the hand formula") {
    val mono = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 9.0)).toDF("x", "y")
    val r1 = Eda.spearmanMatrix(mono, Seq("x", "y")).head().getDouble(2)
    assert(r1 === 1.0)
    // x ranks with midrank ties: [1.5, 1.5, 3]; y ranks [1, 3, 2] -> rho = 0
    val tied = Seq((1.0, 3.0), (1.0, 5.0), (2.0, 4.0)).toDF("x", "y")
    val r2 = Eda.spearmanMatrix(tied, Seq("x", "y")).head().getDouble(2)
    assert(r2 === 0.0)
  }

  test("keepFirst keeps exactly the first row per key under the given order") {
    val df = Seq(
      ("k1", 3, "c"), ("k1", 1, "a"), ("k1", 2, "b"), ("k2", 5, "z")
    ).toDF("k", "ord", "v")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq === Seq(("k1", 1, "a"), ("k2", 5, "z")))
  }

  test("summaryStatsBy matches per-group pandas describe on a hand corpus") {
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g1", 4.0), ("g2", 10.0))
      .toDF("g", "v")
    val out = Clean.summaryStatsBy(df, "v", Seq("g")).orderBy("g").collect()
    val g1 = out(0)
    // pandas describe of [1,2,3,4]: mean 2.5, std ~1.290994, q25 1.75, q50 2.5, q75 3.25
    assert(g1.getLong(1) === 4L)
    assert(approx(g1.getDouble(2), 2.5))
    assert(approx(g1.getDouble(3), 1.290994, 1e-6))
    assert(approx(g1.getDouble(5), 1.75))
    assert(approx(g1.getDouble(6), 2.5))
    assert(approx(g1.getDouble(7), 3.25))
    val g2 = out(1)
    assert(g2.getLong(1) === 1L && g2.isNullAt(3)) // std of one value = null
  }

  test("categoricalProfile: gini and modal share match hand counts") {
    // values: a,a,a,b -> p = (3/4, 1/4), gini = 1 - (9+1)/16 = 0.375
    val df = Seq("a", "a", "a", "b").toDF("k")
    val r = Quality.categoricalProfile(df, Seq("k")).head()
    assert(r.getString(0) === "k" && r.getLong(1) === 2L)
    assert(approx(r.getDouble(2), 0.375))
    assert(r.getString(3) === "a" && approx(r.getDouble(4), 0.75))
  }

  test("benfordProfile: ladder extracts the first significant digit") {
    val df = Seq(1.0, 19.5, 250.0, 2.0, 999999.0, 0.5, 9.99).toDF("x")
    val out = Quality.benfordProfile(df, "x")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    // 0.5 excluded (< 1); digits: 1,1,2,2,9,9 -> {1:2, 2:2, 9:2}
    assert(out === Map(1 -> 2L, 2 -> 2L, 9 -> 2L))
  }

  test("saltedAggregate equals the plain groupBy on skewed keys") {
    val df = spark.range(10000)
      .select((col("id") % 3).cast("string").as("k"),
        (col("id") % 97).cast("double").as("v"))
    val plain = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAggregate(df, Seq("k"), col("v"), salt = 8,
      Seq((sum(col("v").cast("decimal(18,2)")), c => sum(c), "s"),
        (count(lit(1)), c => sum(c), "n")))
      .select(col("k"), col("s").cast("decimal(18,2)").as("s"), col("n"))
      .orderBy("k").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))) ===
      plain.map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))))
  }
}
