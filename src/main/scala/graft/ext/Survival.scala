package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958) — "how long
  * until conversion, given many users never convert": right-censored
  * time-to-event with the product-limit estimator
  * S(t) = Π_{t_i ≤ t} (1 − d_i/n_i). The censoring-aware answer the
  * naive "average days to purchase over converters" gets wrong
  * (survivorship bias: dropping non-converters skews fast).
  *
  * Scale shape: the heavy part — reducing the event stream to one
  * (duration, converted) row per subject — is two map-side-combining
  * per-user aggregates; the day-level (d_j, c_j) table is bounded by
  * the observation window (days, not events), so the risk-set scan and
  * the product-limit recursion are metadata-sized. The recursion runs
  * on the driver over the collected bounded table in EXACT integer
  * arithmetic — s₉ ← s₉·(n_j − d_j) div n_j in 1e-9 units, the
  * Attribution fixed-point device — and is replayed verbatim by a
  * recursive-CTE oracle; survival ships as the exact e9 integer.
  */
object Survival {

  private val Nano = 1000000000L

  /** Per-subject (duration, converted): duration = days from the
    * subject's FIRST event to its FIRST `convType` event; subjects with
    * no conversion are right-censored at the global max event day.
    * Conversions at day 0 (first event IS a conversion) count at t=0.
    */
  def durations(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String): DataFrame = {
    val per = events.groupBy(col(userCol).as("u"))
      .agg(min(to_date(col(tsCol))).as("__start"),
        min(when(col(typeCol) === convType, to_date(col(tsCol))))
          .as("__conv"))
    val horizon = events.agg(max(to_date(col(tsCol))).as("__end"))
    per.crossJoin(broadcast(horizon))
      .select(col("u"),
        when(col("__conv").isNotNull,
          datediff(col("__conv"), col("__start")))
          .otherwise(datediff(col("__end"), col("__start")))
          .cast("long").as("t"),
        col("__conv").isNotNull.as("converted"))
  }

  /** Kaplan–Meier curve: one row per distinct duration day with an
    * event or censoring, (t, n_risk, n_events, n_censored,
    * survival_e9). survival_e9 is S(t) in exact 1e-9 units AFTER the
    * day's events.
    */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val dur = durations(events, userCol, tsCol, typeCol, convType)
    // bounded: one row per distinct day in the observation window
    val byDay = dur.groupBy("t")
      .agg(count(when(col("converted"), 1)).as("d"),
        count(when(!col("converted"), 1)).as("c"))
      .orderBy("t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = byDay.map(r => r._2 + r._3).sum
    var atRisk = total
    var s9 = Nano
    val rows = byDay.map { case (t, d, c) =>
      // events at t happen before censorings at t (standard convention)
      if (atRisk > 0L && d > 0L) s9 = s9 * (atRisk - d) / atRisk
      val out = (t, atRisk, d, c, s9)
      atRisk -= d + c
      out
    }
    rows.toSeq.toDF("t", "n_risk", "n_events", "n_censored", "survival_e9")
  }

  /** Two-group log-rank test (Mantel 1966): does group B convert on a
    * different schedule than group A, accounting for right-censoring —
    * the hypothesis-test companion to the [[kaplanMeier]] curves. At
    * every event day t: observed group-A events d₁ vs expected
    * e₁ = d·n₁/n under the null, with hypergeometric variance
    * v = d·(n₁/n)·(n₂/n)·(n−d)/(n−1); χ² = (O₁−E₁)²/V.
    *
    * Shape: the per-subject reduction is [[durations]]' two aggregates;
    * everything after runs on the BOUNDED day-level table (one row per
    * distinct duration day in the observation window) — at-risk counts
    * are a suffix sum over that table (the one global window, bounded by
    * the window's day count), and the E/V accumulations ride fixed-point
    * 1e9 longs so the day summation is order-invariant.
    *
    * @param isGroupB predicate over the subject id column
    * @return one row (n_a, n_b, o1, e1, chi2), round-6
    */
  def logRank(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String,
      isGroupB: Column => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dur = durations(events, userCol, tsCol, typeCol, convType)
      .withColumn("__g", isGroupB(col("u")))
    val byDay = dur.groupBy("t").agg(
      sum(when(!col("__g") && col("converted"), 1L).otherwise(0L)).as("d1"),
      sum(when(col("__g") && col("converted"), 1L).otherwise(0L)).as("d2"),
      sum(when(!col("__g") && !col("converted"), 1L).otherwise(0L)).as("c1"),
      sum(when(col("__g") && !col("converted"), 1L).otherwise(0L)).as("c2"))
    // at-risk = suffix sums over the bounded day table
    val w = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ar = byDay
      .withColumn("n1", sum(col("d1") + col("c1")).over(w))
      .withColumn("n2", sum(col("d2") + col("c2")).over(w))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("d", col("d1") + col("d2"))
      .where(col("d") > 0L)
    val e1t = (col("d").cast("double") * col("n1").cast("double")
      / col("n").cast("double"))
    val vt = when(col("n") > 1L,
      col("d").cast("double")
        * (col("n1").cast("double") / col("n").cast("double"))
        * (col("n2").cast("double") / col("n").cast("double"))
        * (col("n") - col("d")).cast("double") / (col("n") - 1L).cast("double"))
      .otherwise(lit(0.0))
    val agg = ar.agg(
      sum(col("d1")).as("o1"),
      sum(floor(e1t * 1e9).cast("decimal(38,0)")).as("__e9"),
      sum(floor(vt * 1e9).cast("decimal(38,0)")).as("__v9"))
    val tot = dur.agg(
      sum(when(!col("__g"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__g"), 1L).otherwise(0L)).as("n_b"))
    val e1 = col("__e9").cast("double") / 1e9
    val v = col("__v9").cast("double") / 1e9
    tot.crossJoin(broadcast(agg))
      .select(col("n_a"), col("n_b"), col("o1"),
        round(e1, 6).as("e1"),
        round(when(col("__v9") > 0,
          (col("o1").cast("double") - e1) * (col("o1").cast("double") - e1) / v),
          6).as("chi2"))
  }
}
