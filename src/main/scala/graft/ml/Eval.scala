package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation metrics computed exactly and distributed — the audit
  * tier a training pipeline runs over scored corpora at full scale.
  *
  * The reference's evaluation surface (`DIH.py:76-120`) is sklearn's
  * in-memory `roc_auc`-adjacent metric block; these are the same
  * statistics re-derived as Spark aggregates so they run over a scored
  * 100 TB table instead of a driver array:
  *
  *  - [[aucExact]]: exact ROC AUC via the Mann–Whitney rank-sum identity
  *    with average-rank tie correction — no threshold sweep, no sampling.
  *  - [[calibrationBins]]: reliability diagram (equal-width score bins ×
  *    observed positive rate) for calibration audits.
  *
  * Determinism: every data-dependent accumulation is an integer (counts,
  * 2× rank sums — the factor 2 clears the half from averaged tied ranks,
  * fixed-point 1e9 score sums), so results are order- and
  * partitioning-invariant; only the final closed formula runs in double,
  * shared verbatim with the SQL oracle.
  */
object Eval {

  /** Exact ROC AUC.
    *
    * Mann–Whitney identity: AUC = (R⁺ − n₊(n₊+1)/2) / (n₊ n₋) where R⁺ is
    * the sum of the (average, tie-corrected) ranks of the positive items
    * in the combined score ordering. Ties contribute the average rank of
    * their run: a score value v with c tied items ending at cumulative
    * count cum has average rank cum − (c−1)/2, so
    * 2·R⁺ = Σ_v p_v · (2·cum_v − c_v + 1) — an exact integer.
    *
    * Shape: one per-distinct-score aggregate (count + positive count),
    * a range-partitioned distributed prefix sum for cum ([[graft.ops.Clean
    * .valueCdfWithTotals]] — no single-task window), and a one-row final
    * aggregate. DECIMAL(38,0) carries the rank sum: at n = 10¹² rows a
    * single term reaches p_v·2n ≈ 10²⁴, far past long but 14 digits under
    * the decimal ceiling.
    *
    * Output: one row (n_pos, n_neg, auc).
    *
    * @param labelIsPos boolean column marking positives (evaluated per row)
    */
  def aucExact(df: DataFrame, scoreCol: String, labelIsPos: Column): DataFrame = {
    val base = df
      .where(col(scoreCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        when(labelIsPos, 1L).otherwise(0L).as("__y"))
    // cum over ALL items (positives + negatives) in score order
    val (cdf, _) = graft.ops.Clean.valueCdfWithTotals(base, "__s", Nil)
    // per-score positive counts ride a second, cheaper agg over the same
    // scan and meet the CDF in a distinct-score-sized join
    val pos = base.where(col("__y") === 1L)
      .groupBy(col("__s").as("__val")).agg(count(lit(1)).as("__p"))
    val d0 = lit(0).cast("decimal(38,0)")
    cdf.join(pos, Seq("__val"), "left")
      .select(
        coalesce(col("__p"), lit(0L)).cast("decimal(38,0)").as("__p"),
        col("__c").cast("decimal(38,0)").as("__c"),
        col("__cum").cast("decimal(38,0)").as("__cum"))
      .agg(
        coalesce(sum(col("__p") * (col("__cum") * 2 - col("__c") + 1)), d0)
          .as("__r2"), // = 2·R⁺, exact integer
        coalesce(sum(col("__p")), d0).as("__np"),
        coalesce(sum(col("__c") - col("__p")), d0).as("__nn"))
      .select(
        col("__np").cast("long").as("n_pos"),
        col("__nn").cast("long").as("n_neg"),
        round(
          ((col("__r2") - col("__np") * (col("__np") + 1)).cast("double") / 2.0)
            / (col("__np").cast("double") * col("__nn").cast("double")),
          6).as("auc"))
  }

  /** Reliability (calibration) bins: equal-width bins over the score's
    * [min, max] with the numpy edge rule (max clamps into the last bin,
    * degenerate range → bin 0), each with its item count, observed
    * positive rate, and mean score. Mean scores are fixed-point 1e9 sums
    * (order-invariant) divided out only at the end.
    *
    * One min/max pre-aggregate broadcast back, one grouped aggregate —
    * the same two-pass shape as [[graft.ops.Eda.histogram]]; output is
    * `bins` rows regardless of input size.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelIsPos: Column,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val base = df
      .where(col(scoreCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        when(labelIsPos, 1L).otherwise(0L).as("__y"))
    val mm = base.agg(min(col("__s")).as("__lo"), max(col("__s")).as("__hi"))
    base.crossJoin(broadcast(mm))
      .select(
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor((col("__s") - col("__lo"))
              / ((col("__hi") - col("__lo")) / lit(bins.toDouble))),
            lit((bins - 1).toLong))).as("bin"),
        col("__s"), col("__y"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"),
        sum(floor(col("__s") * 1e9).cast("decimal(38,0)")).as("__s9"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("frac_pos"),
        round(col("__s9").cast("double") / 1e9 / col("n").cast("double"), 6)
          .as("mean_score"))
      .orderBy("bin")
  }

  /** Confusion matrix + threshold metrics: tp/fp/tn/fn at a fixed score
    * threshold with precision, recall, F1 and accuracy — the operating-
    * point companion to [[aucExact]] (which integrates over all
    * thresholds). One aggregate pass of four exact conditional counts;
    * rates guard their zero denominators with null (no fake 0.0).
    *
    * @return one row (tp, fp, tn, fn, precision, recall, f1, accuracy)
    */
  def confusionAtThreshold(df: DataFrame, scoreCol: String,
      labelIsPos: Column, threshold: Double): DataFrame = {
    val base = df.where(col(scoreCol).isNotNull)
      .select((col(scoreCol).cast("double") >= threshold).as("__p"),
        labelIsPos.as("__y"))
    val agg = base.agg(
      sum(when(col("__p") && col("__y"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("__p") && !col("__y"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("__p") && !col("__y"), 1L).otherwise(0L)).as("tn"),
      sum(when(!col("__p") && col("__y"), 1L).otherwise(0L)).as("fn"))
    val tp = col("tp").cast("double"); val fp = col("fp").cast("double")
    val tn = col("tn").cast("double"); val fn = col("fn").cast("double")
    val prec = when(col("tp") + col("fp") > 0L, tp / (tp + fp))
    val rec = when(col("tp") + col("fn") > 0L, tp / (tp + fn))
    agg.select(col("tp"), col("fp"), col("tn"), col("fn"),
      round(prec, 6).as("precision"),
      round(rec, 6).as("recall"),
      round(when(col("tp") > 0L,
        lit(2.0) * (tp / (tp + fp)) * (tp / (tp + fn))
          / (tp / (tp + fp) + tp / (tp + fn))), 6).as("f1"),
      round((tp + tn) / (tp + fp + tn + fn), 6).as("accuracy"))
  }

  /** Difference-in-differences: the 2×2 (treated × post-period) panel
    * estimator DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post −
    * ȳ_ctrl,pre) — the first-line causal screen when treatment wasn't
    * randomized but both groups share pre-trends. One aggregate pass of
    * four cell counts + fixed-point 1e6 value sums; the subtraction DAG
    * is shared with the oracle.
    *
    * @return one row: per-cell n/mean (8 cols) + did, round-6
    */
  def diffInDiff(df: DataFrame, isTreated: Column, isPost: Column,
      valueCol: String): DataFrame = {
    val base = df.where(col(valueCol).isNotNull)
      .select(isTreated.as("__t"), isPost.as("__p"),
        floor(col(valueCol).cast("double") * 1e6).cast("decimal(38,0)")
          .as("__v6"))
    def cell(t: Boolean, p: Boolean, suffix: String) = Seq(
      sum(when(col("__t") === t && col("__p") === p, 1L).otherwise(0L))
        .as(s"n_$suffix"),
      sum(when(col("__t") === t && col("__p") === p, col("__v6"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as(s"__s_$suffix"))
    val aggs = cell(true, false, "treat_pre") ++ cell(true, true, "treat_post") ++
      cell(false, false, "ctrl_pre") ++ cell(false, true, "ctrl_post")
    val agg = base.agg(aggs.head, aggs.tail: _*)
    def mean(s: String) =
      col(s"__s_$s").cast("double") / 1e6 / col(s"n_$s").cast("double")
    agg.select(
      col("n_treat_pre"), col("n_treat_post"),
      col("n_ctrl_pre"), col("n_ctrl_post"),
      round(mean("treat_pre"), 6).as("mean_treat_pre"),
      round(mean("treat_post"), 6).as("mean_treat_post"),
      round(mean("ctrl_pre"), 6).as("mean_ctrl_pre"),
      round(mean("ctrl_post"), 6).as("mean_ctrl_post"),
      round((mean("treat_post") - mean("treat_pre"))
        - (mean("ctrl_post") - mean("ctrl_pre")), 6).as("did"))
  }

  /** Wilson score interval: the 95% confidence interval for a proportion
    * that stays inside [0, 1] and behaves at small n (unlike the normal
    * approximation) — the standard way to report conversion/defect rates
    * with uncertainty. z is the plan-time literal 1.96; the formula is
    * one shared double DAG per group from exact integer counts.
    *
    * @return per group: (group, n, n_pos, p, lo95, hi95), ordered
    */
  def wilsonInterval(df: DataFrame, groupCol: String,
      isPos: Column): DataFrame = {
    val per = df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(isPos, 1L).otherwise(0L)).as("n_pos"))
    val n = col("n").cast("double"); val x = col("n_pos").cast("double")
    val z = lit(1.96); val z2 = z * z
    val p = x / n
    val center = (p + z2 / (lit(2.0) * n)) / (lit(1.0) + z2 / n)
    val half = (z * sqrt(p * (lit(1.0) - p) / n
      + z2 / (lit(4.0) * n * n))) / (lit(1.0) + z2 / n)
    per.select(col("group"), col("n"), col("n_pos"),
      round(p, 6).as("p"),
      round(center - half, 6).as("lo95"),
      round(center + half, 6).as("hi95"))
      .orderBy("group")
  }

  /** Cohen's kappa: agreement between two binary raters corrected for
    * chance — the label-quality audit when two annotation sources (a
    * heuristic and a model, two labeling runs) disagree more than their
    * marginals explain. κ = (p_o − p_e)/(1 − p_e) with p_e from the
    * marginal products; one aggregate pass of four exact counts.
    *
    * @return one row (n_agree, n_total, po, pe, kappa)
    */
  def cohensKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val base = df.select(raterA.as("__a"), raterB.as("__b"))
    val agg = base.agg(
      sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("__pp"),
      sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("__pn"),
      sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("__np"),
      sum(when(!col("__a") && !col("__b"), 1L).otherwise(0L)).as("__nn"))
    val pp = col("__pp").cast("double"); val pn = col("__pn").cast("double")
    val np = col("__np").cast("double"); val nn = col("__nn").cast("double")
    val n = pp + pn + np + nn
    val po = (pp + nn) / n
    val pe = ((pp + pn) * (pp + np) + (np + nn) * (pn + nn)) / (n * n)
    agg.select(
      (col("__pp") + col("__nn")).as("n_agree"),
      (col("__pp") + col("__pn") + col("__np") + col("__nn")).as("n_total"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      round(when(pe < 1.0, (po - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }

  /** Two-proportion A/B z-test: conversion rates of two variants with
    * the pooled-variance z statistic — the experimentation readout
    * (|z| ≳ 1.96 ⇒ 5% two-sided significance; the p-value itself needs
    * erf, which differs across libm implementations, so the statistic is
    * the contract and the caller applies the threshold).
    *
    * One per-unit aggregate (a unit converts if ANY of its rows does —
    * max rides the groupBy), one 2-row variant rollup, one closed double
    * formula from exact integer counts.
    *
    * @return one row (n_a, n_b, conv_a, conv_b, rate_a, rate_b, z)
    */
  def abTest(df: DataFrame, unitCol: String, isVariantB: Column,
      converted: Column): DataFrame = {
    val perUnit = df
      .select(col(unitCol).as("__u"),
        when(isVariantB, 1L).otherwise(0L).as("__v"),
        when(converted, 1L).otherwise(0L).as("__c"))
      .groupBy("__u", "__v").agg(max(col("__c")).as("__conv"))
    val agg = perUnit.agg(
      sum(when(col("__v") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__v") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__v") === 0L, col("__conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("__v") === 1L, col("__conv")).otherwise(0L)).as("conv_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ca = col("conv_a").cast("double"); val cb = col("conv_b").cast("double")
    val pa = ca / na; val pb = cb / nb
    val pool = (ca + cb) / (na + nb)
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      round((pa - pb) / sqrt(pool * (lit(1.0) - pool)
        * (lit(1.0) / na + lit(1.0) / nb)), 6).as("z"))
  }

  /** Two-predictor ordinary least squares, closed-form: fits
    * y = b0 + b1·x1 + b2·x2 by solving the 3×3 normal equations with
    * Cramer's rule over ONE aggregate pass of exact DECIMAL moment sums
    * (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y, Σx2y, Σy²) — the
    * multiple-regression companion to the per-group simple fit
    * (`q_stats_linreg`). No matrix library, no driver-side math: the
    * determinant expansion is a fixed closed double DAG shared verbatim
    * with the SQL oracle, and R² comes from the same sums
    * (SSE = Σy² − b0Σy − b1Σx1y − b2Σx2y).
    *
    * Scale: one map-side-combinable aggregate over the fact table; the
    * output is a single row. Inputs are cast to DECIMAL(18,2) (exact at
    * 2 decimal places) so the sums are order-invariant.
    *
    * @return one row (n, b0, b1, b2, r2), coefficients round-6
    */
  def ols2(df: DataFrame, x1Col: String, x2Col: String,
      yCol: String): DataFrame = {
    val x1 = col(x1Col).cast("decimal(18,2)")
    val x2 = col(x2Col).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val sums = df
      .where(x1.isNotNull && x2.isNotNull && y.isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
        sum((x1 * x1).cast("decimal(38,4)")).as("s11"),
        sum((x1 * x2).cast("decimal(38,4)")).as("s12"),
        sum((x2 * x2).cast("decimal(38,4)")).as("s22"),
        sum((x1 * y).cast("decimal(38,4)")).as("s1y"),
        sum((x2 * y).cast("decimal(38,4)")).as("s2y"),
        sum((y * y).cast("decimal(38,4)")).as("syy"))
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double"); val s2 = col("s2").cast("double")
    val sy = col("sy").cast("double")
    val s11 = col("s11").cast("double"); val s12 = col("s12").cast("double")
    val s22 = col("s22").cast("double")
    val s1y = col("s1y").cast("double"); val s2y = col("s2y").cast("double")
    val syy = col("syy").cast("double")
    // first-column cofactor expansions — the SAME textual order as the
    // oracle SQL, so both engines execute the identical double DAG
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    // degeneracy guards (module convention: zero denominators -> null, not
    // NaN/Infinity): det = 0 means collinear/constant predictors (the
    // normal-equation system is singular); sst <= 0 means constant y
    val b0 = when(det =!= 0.0, det0 / det)
    val b1 = when(det =!= 0.0, det1 / det)
    val b2 = when(det =!= 0.0, det2 / det)
    val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    val sst = syy - sy * sy / n
    sums.select(col("n"),
      round(b0, 6).as("b0"), round(b1, 6).as("b1"), round(b2, 6).as("b2"),
      round(when(det =!= 0.0 && sst > 0.0, lit(1.0) - sse / sst), 6).as("r2"))
  }

  /** Weight-of-evidence table for a categorical predictor against a binary
    * target: per category, WOE = ln((p_c/P)/(q_c/Q)) with the classic +0.5
    * numerator smoothing (so empty classes stay finite), and the category's
    * information-value term IV_c = (p_c/P − q_c/Q)·WOE — Σ IV_c is the
    * predictor's screening score. All inputs are exact integer counts; the
    * ln/division DAG is shared verbatim with the oracle.
    *
    * One grouped aggregate + a broadcast one-row totals join; output is
    * |categories| rows.
    */
  def woeTable(df: DataFrame, catCol: String, targetIsPos: Column): DataFrame = {
    val base = df.select(col(catCol).as("category"),
      when(targetIsPos, 1L).otherwise(0L).as("__y"))
    val per = base.groupBy("category").agg(
      sum(col("__y")).as("n_pos"),
      sum(lit(1L) - col("__y")).as("n_neg"))
    val tot = per.agg(sum(col("n_pos")).as("__tp"), sum(col("n_neg")).as("__tn"))
    val pr = (col("n_pos").cast("double") + 0.5) / col("__tp").cast("double")
    val qr = (col("n_neg").cast("double") + 0.5) / col("__tn").cast("double")
    per.crossJoin(broadcast(tot))
      .select(col("category"), col("n_pos"), col("n_neg"),
        round(log(pr / qr), 6).as("woe"),
        round((pr - qr) * log(pr / qr), 6).as("iv_term"))
      .orderBy("category")
  }

  /** Split-conformal prediction interval (Vovk et al.; the
    * distribution-free finite-sample coverage recipe): fit a simple OLS
    * y ~ x on the TRAIN split, take the conformity scores |y − ŷ| on a
    * held-out CALIBRATION split, and the interval half-width is the
    * k-th smallest calibration score with k = ⌈(n_cal+1)·cov⌉ — then
    * ŷ ± q covers a fresh point with probability ≥ cov, no Gaussian
    * residual assumption. The TEST split reports the realized coverage.
    *
    * Scale shape: three disjoint filtered passes over the fact table
    * (train → one decimal-exact sums aggregate; calibration → the
    * range-partitioned distributed value-CDF of [[graft.ops.Clean
    * .valueCdf]], no single-task sort even with corpus-sized
    * calibration; test → one count aggregate against the broadcast
    * scalar q). The fitted (slope, intercept) is a one-row broadcast;
    * nothing collects, nothing windows globally.
    *
    * Determinism: coverage is the RATIONAL coverNum/coverDen so the
    * conformal rank k = ((n_cal+1)·num + den−1) div den is exact
    * integer arithmetic on both engines (a double ⌈(n+1)·0.9⌉ can land
    * on either side of an integer); the OLS and residual double DAGs
    * are shared verbatim with the oracle; q is an order STATISTIC
    * (smallest value with cum ≥ k), bit-identical across engines.
    *
    * Output: one row (n_train, n_calib, n_test, slope, intercept, q,
    * covered, coverage) — slope/intercept/q/coverage round-6. When the
    * conformal rank exceeds n_cal (calibration too small for the
    * requested coverage: n_cal < num/(den−num)), q is null — the
    * UNBOUNDED interval — and coverage is trivially 1.
    */
  def conformalSplit(df: DataFrame, xCol: String, yCol: String,
      trainPred: Column, calibPred: Column, testPred: Column,
      coverNum: Int = 9, coverDen: Int = 10): DataFrame = {
    require(coverNum > 0 && coverDen > coverNum,
      s"coverage must be a proper fraction: $coverNum/$coverDen")
    val xd = col(xCol).cast("decimal(18,2)")
    val yd = col(yCol).cast("decimal(18,2)")
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val sums = base.where(trainPred)
      .agg(count(lit(1)).as("n_train"),
        sum(xd).as("sx"), sum(yd).as("sy"),
        sum((xd * xd).cast("decimal(38,4)")).as("sxx"),
        sum((xd * yd).cast("decimal(38,4)")).as("sxy"))
    val n = col("n_train").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
    // the q_stats_linreg formula DAG, textually mirrored in the oracle
    val m = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b = (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
    // one row; eager localCheckpoint so the 3-value fit materializes in
    // its own jobs and every consumer broadcasts a literal-sized scan
    val parms = sums.select(col("n_train"), m.as("__m"), b.as("__b"))
      .localCheckpoint(true)
    def scores(pred: Column): DataFrame = base.where(pred)
      .crossJoin(broadcast(parms))
      .select(col("n_train"), col("__m"), col("__b"),
        abs(col(yCol).cast("double") -
          (col("__b") + col("__m") * col(xCol).cast("double"))).as("__r"))
    val (cdf, tot) = graft.ops.Clean.valueCdfWithTotals(
      scores(calibPred), "__r", Seq.empty)
    // k = ceil((n_cal+1) * num / den) in pure integer arithmetic
    val kRank = expr(s"((__tot + 1) * $coverNum + ${coverDen - 1}) div $coverDen")
    // n_calib comes from the TOT frame, not the rank-filtered one: when
    // the conformal rank exceeds n_cal the filter below matches nothing,
    // and an agg over empty input would report n_calib = null instead of
    // the real calibration count (the q = null it also produces is the
    // correct unbounded-interval answer and is kept)
    val qRow = cdf.crossJoin(broadcast(tot))
      .where(col("__cum") >= kRank)
      .agg(min(col("__val")).as("__q"))
      .crossJoin(broadcast(tot.select(col("__tot").as("n_calib"))))
      .localCheckpoint(true)
    // a null q means the conformal rank EXCEEDED n_cal (k = ⌈(n+1)·cov⌉
    // > n happens whenever n_cal < cov/(1−cov)) — the method's answer is
    // the UNBOUNDED interval, which trivially covers everything, so a
    // null q counts every test row as covered rather than none
    scores(testPred)
      .crossJoin(broadcast(qRow))
      .agg(first(col("n_train")).as("n_train"),
        first(col("n_calib")).as("n_calib"),
        count(lit(1)).as("n_test"),
        round(first(col("__m")), 6).as("slope"),
        round(first(col("__b")), 6).as("intercept"),
        round(first(col("__q")), 6).as("q"),
        sum(when(col("__q").isNull || col("__r") <= col("__q"), 1L)
          .otherwise(0L)).as("covered"))
      .withColumn("coverage",
        round(col("covered").cast("double") / col("n_test").cast("double"), 6))
  }

  /** Pearson chi-square test of independence for two categorical
    * columns, plus Cramér's V effect size — the categorical association
    * screen (the crosstab's inferential companion; mutual information
    * is the entropy-side counterpart). All inputs are exact integer
    * cell/marginal counts from ONE grouped aggregate over the fact
    * table; expected counts and the χ² fold run in a double DAG shared
    * verbatim with the oracle (the statistic is the contract — p-values
    * need the incomplete gamma, which differs across libm). Cells are
    * bounded by the category cross product; the fold over cells happens
    * at marginal scale, never row scale.
    *
    * @return one row (n, r, c, dof, chi2, cramers_v) — chi2/V round-6
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rowTot = cells.groupBy("__a").agg(sum(col("__o")).as("__ra"))
    val colTot = cells.groupBy("__b").agg(sum(col("__o")).as("__cb"))
    val n = cells.agg(sum(col("__o")).as("__n"),
      countDistinct(col("__a")).as("__r"),
      countDistinct(col("__b")).as("__c"))
    val e = col("__ra").cast("double") * col("__cb").cast("double") /
      col("__n").cast("double")
    cells.join(broadcast(rowTot), Seq("__a"))
      .join(broadcast(colTot), Seq("__b"))
      .crossJoin(broadcast(n))
      .select(col("__n"), col("__r"), col("__c"),
        ((col("__o").cast("double") - e) * (col("__o").cast("double") - e) / e)
          .as("__t"))
      .groupBy("__n", "__r", "__c")
      .agg(sum(floor(col("__t") * 1e9)).cast("decimal(38,0)").as("__t9"))
      .select(col("__n").as("n"), col("__r").as("r"), col("__c").as("c"),
        ((col("__r") - 1) * (col("__c") - 1)).as("dof"),
        round(col("__t9").cast("double") / 1e9, 6).as("chi2"),
        round(sqrt(col("__t9").cast("double") / 1e9 /
          (col("__n").cast("double") *
            least(col("__r") - 1, col("__c") - 1).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** Kendall's τ-b rank correlation per key — the pair-concordance
    * companion to Pearson (q_e5) and Spearman (q_e8): over all pairs
    * with x_i < x_j, count concordant (y rises), discordant (y falls)
    * and y-tied pairs; τ-b = (C − D) / √(n0 · (n0 − n2)) with
    * n0 = n(n−1)/2 and n2 = Σ_y c_y(c_y−1)/2 the y-tie correction.
    * Everything except the final √ DAG is an exact integer count, so
    * the statistic is order- and partitioning-invariant.
    *
    * CONTRACT (shared with [[theilSen]]): `points` is bounded per key
    * with UNIQUE x per key (e.g. a daily rollup) — so x-tie pairs are
    * zero (n1 = 0) and the quadratic pair stage is a key equi-join over
    * key-bounded state; keys scale out through the groupBy. Keys with
    * fewer than 2 points have no pairs and drop from the output;
    * all-tied-y keys yield null τ (zero denominator).
    *
    * @return (keys*, n_points, n_concordant, n_discordant, tau_b)
    */
  def kendallTau(points: DataFrame, xCol: String, yCol: String,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "kendallTau needs at least one key column")
    val keys = keyCols.map(col)
    val x = col(xCol).cast("int"); val y = col(yCol).cast("double")
    val pts = graft.Caches.register(points
      .where(x.isNotNull && y.isNotNull)
      .select(keys :+ x.as("__x") :+ y.as("__y"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = pts.select(keys :+ col("__x").as("__xa") :+ col("__y").as("__ya"): _*)
    val b = pts.select(keys :+ col("__x").as("__xb") :+ col("__y").as("__yb"): _*)
    val cd = a.join(b, keyCols).where(col("__xa") < col("__xb"))
      .groupBy(keys: _*)
      .agg(sum(when(col("__yb") > col("__ya"), 1L).otherwise(0L)).as("n_concordant"),
        sum(when(col("__yb") < col("__ya"), 1L).otherwise(0L)).as("n_discordant"))
    val nPts = pts.groupBy(keys: _*).agg(count(lit(1)).as("n_points"))
    val yTies = pts.groupBy(keys :+ col("__y"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(keys: _*)
      .agg(sum(col("__c") * (col("__c") - 1)).as("__t2")) // = 2·n2
    val n0x2 = col("n_points") * (col("n_points") - 1) // = 2·n0
    val denom = sqrt((n0x2.cast("double") / 2) *
      ((n0x2 - col("__t2")).cast("double") / 2))
    nPts.join(cd, keyCols).join(yTies, keyCols)
      .select(keys ++ Seq(col("n_points"), col("n_concordant"),
        col("n_discordant"),
        round(when(denom > 0.0,
          (col("n_concordant") - col("n_discordant")).cast("double") / denom),
          6).as("tau_b")): _*)
      .orderBy(keys: _*)
  }

  /** Theil–Sen robust trend per key: slope = median of all pairwise
    * slopes (y_j − y_i)/(x_j − x_i) over x_i < x_j, intercept = median
    * of (y_i − m·x_i) — the classic 29.3%-breakdown robust line (Theil
    * 1950; Sen 1968), immune to outlier days that wreck OLS.
    *
    * CONTRACT: `points` must be BOUNDED per key (one row per (key, x) —
    * e.g. a daily rollup, ≤ 31 points per month) because the pair stage
    * is quadratic WITHIN a key; the keys themselves can be unbounded.
    * The pair join is a key equi-join, never a cartesian, and the two
    * medians are per-key sorted-array order statistics — correct
    * because the contract bounds per-key state; keys scale out through
    * the groupBy.
    *
    * Median of n values = (v⌊(n+1)/2⌋ + v⌊n/2⌋+1) / 2 (exact order
    * statistics, averaged middles for even n) — integer ranks, shared
    * verbatim with the oracle. Keys whose x has fewer than 2 distinct
    * points yield no pairs and drop from the output.
    *
    * @return (keys*, n_points, n_pairs, slope, intercept) round-6
    */
  def theilSen(points: DataFrame, xCol: String, yCol: String,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "theilSen needs at least one key column")
    val keys = keyCols.map(col)
    val x = col(xCol).cast("int"); val y = col(yCol).cast("double")
    // persisted: the (key, x) point table is bounded by contract and
    // feeds THREE consumers (pair slopes, residuals, and the pair join's
    // second side) — without the pin each median pass re-derives the
    // caller's upstream rollup from the fact table
    val pts = graft.Caches.register(points
      .where(x.isNotNull && y.isNotNull)
      .select(keys :+ x.as("__x") :+ y.as("__y"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = pts.select(keys :+ col("__x").as("__xa") :+ col("__y").as("__ya"): _*)
    val b = pts.select(keys :+ col("__x").as("__xb") :+ col("__y").as("__yb"): _*)
    val pairs = a.join(b, keyCols).where(col("__xa") < col("__xb"))
      .select(keys :+
        ((col("__yb") - col("__ya")) / (col("__xb") - col("__xa"))).as("__s"): _*)
    // per-key values are BOUNDED by the contract (<= n_points² / 2), so
    // a sorted-array median is the right shape: one aggregate, exact
    // order statistics by index — the distributed value-CDF would spend
    // ~15 local-mode jobs per median on range exchanges this small-state
    // aggregate never needs (measured vs the CDF variant on the monthly
    // lineitem rollup)
    def medianBy(df: DataFrame, valueCol: String, out: String): DataFrame =
      df.groupBy(keys: _*)
        .agg(sort_array(collect_list(col(valueCol))).as("__a"))
        .select(keys ++ Seq(
          ((element_at(col("__a"),
              expr("CAST((size(__a) + 1) div 2 AS INT)")) +
            element_at(col("__a"),
              expr("CAST(size(__a) div 2 + 1 AS INT)"))) / 2).as(out),
          size(col("__a")).cast("long").as(s"${out}_n")): _*)
    // keys-sized (one row per key): eager-checkpoint so the pair-CDF
    // subtree runs ONCE instead of once per consumer (the residual
    // broadcast and the final join both read it)
    val slope = medianBy(pairs, "__s", "__m").localCheckpoint(true)
    val resid = pts.join(broadcast(slope), keyCols)
      .select(keys :+ (col("__y") - col("__m") * col("__x")).as("__r"): _*)
    val icept = medianBy(resid, "__r", "__b").localCheckpoint(true)
    slope.join(icept, keyCols)
      .select(keys ++ Seq(col("__b_n").as("n_points"),
        col("__m_n").as("n_pairs"),
        round(col("__m"), 6).as("slope"),
        round(col("__b"), 6).as("intercept")): _*)
      .orderBy(keys: _*)
  }

  /** Seasonal-naive forecast BACKTEST with the MASE scale-free error —
    * the standard "is my forecast better than doing nothing" gate run
    * before trusting any model of a metric series (Hyndman &
    * Koehler '06). Per key, over a (time-ordered, regularly indexed)
    * series: forecast value(t) by value(t−period) (seasonal naive) and
    * by value(t−1) (one-step naive, the MASE denominator); score both
    * by MAE over the rows where the seasonal lag exists.
    *
    * MASE = MAE_seasonal / MAE_naive1: < 1 means the seasonal pattern
    * carries real signal; the output keeps both MAEs so the ratio is
    * auditable.
    *
    * Determinism: absolute errors are fixed-point 1e6 longs before the
    * fold (truncation mirrored by trunc() in the oracle), so the sums
    * are order-independent; only the final divisions run in double.
    *
    * Scale: the lag windows run over per-key SERIES — the caller feeds
    * a bounded rollup (e.g. a daily metric per key), never raw events,
    * so each partition is the per-key series length, and the two lags
    * share one sort.
    */
  def backtestSeasonalNaive(df: DataFrame, keyCols: Seq[String],
      tCol: String, valueCol: String, period: Int): DataFrame = {
    require(period >= 2, s"seasonal period must be >= 2, got $period")
    val keys = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col(tCol))
    val v = col(valueCol)
    val fSeason = lag(v, period).over(w)
    val fNaive = lag(v, 1).over(w)
    def fp(c: Column): Column = (abs(c) * lit(1000000.0)).cast("long")
    df.select(keys :+ v.as("__v") :+ fp(v - fSeason).as("__es")
        :+ fp(v - fNaive).as("__e1"): _*)
      .where(col("__es").isNotNull) // first `period` points: no forecast
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_eval"),
        sum(col("__es")).as("__ses"), sum(col("__e1")).as("__se1"))
      .select(keys ++ Seq(col("n_eval"),
        round(col("__ses").cast("double") / (col("n_eval") * lit(1000000.0)), 6)
          .as("mae_seasonal"),
        round(col("__se1").cast("double") / (col("n_eval") * lit(1000000.0)), 6)
          .as("mae_naive"),
        when(col("__se1") === 0, lit(null).cast("double"))
          .otherwise(round(col("__ses").cast("double")
            / col("__se1").cast("double"), 6)).as("mase")): _*)
      .orderBy(keys: _*)
  }

  /** Welch's two-sample t-test (unequal variances) — the A/B companion
    * to [[abTest]]'s pooled z-test for metrics whose group variances
    * differ: t = (m̄₁−m̄₂)/√(s₁²/n₁+s₂²/n₂) with the Welch–Satterthwaite
    * effective degrees of freedom. One conditional-sum aggregate pass
    * (DECIMAL-exact power sums per side, no shuffle beyond the single
    * one-row agg); the statistic and df are the contract — the p-value
    * needs the incomplete beta, which differs across libm.
    *
    * Output: one row (n_a, n_b, mean_a, mean_b, t_stat, df_welch).
    */
  def welchTTest(df: DataFrame, valueCol: String, isB: Column): DataFrame = {
    val x = col(valueCol).cast("decimal(18,2)")
    val agg = df.where(col(valueCol).isNotNull).agg(
      sum(when(!isB, 1L).otherwise(0L)).as("n_a"),
      sum(when(!isB, x)).as("sx_a"),
      sum(when(!isB, (x * x).cast("decimal(38,4)"))).as("sxx_a"),
      sum(when(isB, 1L).otherwise(0L)).as("n_b"),
      sum(when(isB, x)).as("sx_b"),
      sum(when(isB, (x * x).cast("decimal(38,4)"))).as("sxx_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("sx_a").cast("double") / na
    val mb = col("sx_b").cast("double") / nb
    val va = (col("sxx_a").cast("double")
      - col("sx_a").cast("double") * col("sx_a").cast("double") / na) / (na - lit(1.0))
    val vb = (col("sxx_b").cast("double")
      - col("sx_b").cast("double") * col("sx_b").cast("double") / nb) / (nb - lit(1.0))
    val sea = va / na
    val seb = vb / nb
    val t = (ma - mb) / sqrt(sea + seb)
    val dfW = (sea + seb) * (sea + seb) /
      (sea * sea / (na - lit(1.0)) + seb * seb / (nb - lit(1.0)))
    agg.select(col("n_a"), col("n_b"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      round(t, 6).as("t_stat"), round(dfW, 6).as("df_welch"))
  }

  /** k-fold CROSS-VALIDATED simple linear regression in ONE data pass —
    * the distributed form of "train on k−1 folds, test on the held-out
    * fold": folds are the deterministic md5-hash assignment of
    * [[graft.ops.Sampling.foldAssign]], per-fold DECIMAL power sums are
    * one grouped aggregate, the train-side sums are totals MINUS the
    * fold (sufficient statistics, the same identity as
    * [[leaveOneGroupOutSlope]]), and the held-out MSE needs no per-row
    * scoring pass because Σ(y−a−bx)² expands over the SAME sums:
    * syy + n·a² + b²·sxx − 2a·sy − 2b·sxy + 2ab·sx.
    *
    * Output per fold: n_test, n_train, slope, intercept, mse_test —
    * the k-fold generalization audit of q_stats_linreg's fit, at the
    * cost of one shuffle regardless of k or data size.
    */
  def cvLinreg(df: DataFrame, idCol: String, xCol: String, yCol: String,
      k: Int): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val g = graft.ops.Sampling.foldAssign(df, idCol, k)
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_f"),
        sum(x).as("sx_f"), sum(y).as("sy_f"),
        sum((x * x).cast("decimal(38,4)")).as("sxx_f"),
        sum((x * y).cast("decimal(38,4)")).as("sxy_f"),
        sum((y * y).cast("decimal(38,4)")).as("syy_f"))
    val tot = g.agg(sum(col("n_f")).as("n"),
      sum(col("sx_f")).as("sx"), sum(col("sy_f")).as("sy"),
      sum(col("sxx_f")).as("sxx"), sum(col("sxy_f")).as("sxy"))
    val nt = (col("n") - col("n_f")).cast("double")
    val sx = (col("sx") - col("sx_f")).cast("double")
    val sy = (col("sy") - col("sy_f")).cast("double")
    val sxx = (col("sxx") - col("sxx_f")).cast("double")
    val sxy = (col("sxy") - col("sxy_f")).cast("double")
    val b = (nt * sxy - sx * sy) / (nt * sxx - sx * sx)
    val a = (sy - b * sx) / nt
    val nf = col("n_f").cast("double")
    val mse = (col("syy_f").cast("double") + nf * a * a
      + b * b * col("sxx_f").cast("double")
      - lit(2.0) * a * col("sy_f").cast("double")
      - lit(2.0) * b * col("sxy_f").cast("double")
      + lit(2.0) * a * b * col("sx_f").cast("double")) / nf
    g.crossJoin(broadcast(tot))
      .select(col("fold"), col("n_f").as("n_test"),
        (col("n") - col("n_f")).as("n_train"),
        round(b, 6).as("slope"), round(a, 6).as("intercept"),
        round(mse, 6).as("mse_test"))
      .orderBy("fold")
  }

  /** Leave-one-group-out OLS influence — data VALUATION for a training
    * mix: how much does each source/group move the fitted line? For
    * y ~ x fitted by least squares, report the full-data slope and, per
    * group g, the slope refitted WITHOUT g's rows, via the sufficient-
    * statistics identity (subtract g's power sums from the totals) — no
    * second pass over the data, one grouped aggregate in exact DECIMAL
    * and a broadcast of the (bounded) per-group sums.
    *
    * A large |influence| = slope_without − slope_full flags a group
    * whose data dominates the fit — the curation signal for "this
    * source is skewing the model".
    */
  def leaveOneGroupOutSlope(df: DataFrame, groupCol: String,
      xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_g"),
        sum(x).as("sx_g"), sum(y).as("sy_g"),
        sum((x * x).cast("decimal(38,4)")).as("sxx_g"),
        sum((x * y).cast("decimal(38,4)")).as("sxy_g"))
    val tot = g.agg(sum(col("n_g")).as("n"),
      sum(col("sx_g")).as("sx"), sum(col("sy_g")).as("sy"),
      sum(col("sxx_g")).as("sxx"), sum(col("sxy_g")).as("sxy"))
    def slope(n: Column, sx: Column, sy: Column, sxx: Column,
        sxy: Column): Column = {
      val nd = n.cast("double"); val sxd = sx.cast("double")
      val syd = sy.cast("double"); val sxxd = sxx.cast("double")
      val sxyd = sxy.cast("double")
      (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    }
    val full = slope(col("n"), col("sx"), col("sy"), col("sxx"), col("sxy"))
    val wo = slope(col("n") - col("n_g"), col("sx") - col("sx_g"),
      col("sy") - col("sy_g"), col("sxx") - col("sxx_g"),
      col("sxy") - col("sxy_g"))
    g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_g"),
        round(full, 6).as("slope_full"),
        round(wo, 6).as("slope_without"),
        round(wo - full, 6).as("influence"))
      .orderBy(col(groupCol))
  }
}
