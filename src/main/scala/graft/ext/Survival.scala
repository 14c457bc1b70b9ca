package graft.ext

import org.apache.spark.sql.DataFrame
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
}
