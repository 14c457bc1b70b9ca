package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling (north-star extension; the reference has no
  * time-series surface — this is the distributed face of pandas'
  * `resample().mean()` + gap reindexing).
  */
object Resample {

  /** Downsample to fixed `binSeconds` buckets per key, then FILL THE GAPS:
    * every key gets one row per bin between its first and last event, with
    * n_events = 0 and avg_value = null for empty bins.
    *
    * Scale shape: the aggregation is one map-side-combinable groupBy on
    * (key, bin). The gap grid comes from a per-key (min, max) aggregate —
    * tiny — exploded via `sequence` into (key, bin) rows and left-joined
    * back. The grid explode is O(keys × spanBins), independent of event
    * count; the dense grid join shuffles only the already-aggregated bins,
    * never raw events. Keys whose span would explode the grid are the
    * caller's responsibility (choose binSeconds ≈ span / expected bins).
    *
    * Output: keyCols…, bin_start (epoch seconds), n_events, avg_value.
    */
  def resampleGapFill(df: DataFrame, tsCol: String, keyCols: Seq[String],
      valueCol: String, binSeconds: Long): DataFrame = {
    val bin = (floor(unix_timestamp(col(tsCol)) / binSeconds) * binSeconds).cast("long")
    val binned = df.withColumn("__bin", bin)
      .groupBy((keyCols.map(col) :+ col("__bin")): _*)
      .agg(count(lit(1)).as("n_events"),
        round(avg(col(valueCol)), 6).as("avg_value"))
    val spans = binned.groupBy(keyCols.map(col): _*)
      .agg(min(col("__bin")).as("__lo"), max(col("__bin")).as("__hi"))
    val grid = spans.select(
      (keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), lit(binSeconds))).as("__bin")): _*)
    grid.join(binned, keyCols :+ "__bin", "left")
      .select((keyCols.map(col) :+ col("__bin").as("bin_start") :+
        coalesce(col("n_events"), lit(0L)).as("n_events") :+
        col("avg_value")): _*)
  }

  /** Truncated adjusted EWMA (pandas `ewm(alpha).mean()` with `adjust=
    * True`, cut off after `lags` terms): per key, each point's smoothed
    * value is Σ (1−α)^i·x_{t−i} / Σ (1−α)^i over the available lags —
    * nulls are skipped (their weight is excluded from the denominator,
    * pandas `ignore_na=True`). Truncation makes the operator a FIXED
    * window of `lag()` columns sharing one keyed sort — exact, engine-
    * portable (the weights are compile-time constants; with α = 0.5 they
    * are exact powers of two), and never a running-state recursion Spark
    * can't distribute. The truncation error is (1−α)^lags — pick lags so
    * it's below the precision you report.
    *
    * Appends `<valueCol>_ewma`.
    */
  def ewma(df: DataFrame, valueCol: String, orderCol: String,
      keyCols: Seq[String], alpha: Double = 0.5, lags: Int = 7): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    require(lags >= 1, s"lags >= 1, got $lags")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val xs = (0 until lags).map { i =>
      val x = if (i == 0) col(valueCol) else lag(col(valueCol), i).over(w)
      (x, lit(math.pow(1.0 - alpha, i)))
    }
    val num = xs.map { case (x, c) => when(x.isNotNull, x * c).otherwise(lit(0.0)) }
      .reduce(_ + _)
    val den = xs.map { case (x, c) => when(x.isNotNull, c).otherwise(lit(0.0)) }
      .reduce(_ + _)
    df.withColumn(s"${valueCol}_ewma", when(den > 0.0, num / den))
  }
  /** OHLC candle resampling: per key and day, the open/high/low/close of
    * `valueCol` (open/close by (ts, tieCol) order — deterministic under
    * equal timestamps) plus the event count. The financial-bar shape of
    * downsampling, equally useful for any metric stream.
    *
    * Scale shape: one (key, day)-partitioned window sort serves BOTH
    * row_numbers (ascending + descending rank over the same exchange),
    * then a map-side-combinable aggregate on the same keys — one shuffle
    * total, partitions bounded by a key-day's events.
    */
  def ohlc(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val day = date_trunc("day", col(tsCol))
    // null values are dropped BEFORE ranking: otherwise open/close would
    // take the rank-1 row's value even when null while high/low skip
    // nulls — an inconsistent candle. All four stats (and n_events) are
    // therefore over value-bearing events only.
    val base = df.where(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), day.as("day"),
        col(tsCol).as("__ts"), col(tieCol).as("__tie"),
        col(valueCol).as("__v"))
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy("key", "day").orderBy(col("__ts"), col("__tie"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy("key", "day").orderBy(col("__ts").desc, col("__tie").desc)
    base
      .withColumn("__ra", row_number().over(wAsc))
      .withColumn("__rd", row_number().over(wDesc))
      .groupBy("key", "day")
      .agg(round(max(when(col("__ra") === 1, col("__v"))), 6).as("open"),
        round(max("__v"), 6).as("high"),
        round(min("__v"), 6).as("low"),
        round(max(when(col("__rd") === 1, col("__v"))), 6).as("close"),
        count(lit(1)).as("n_events"))
  }

  /** Lead–lag cross-correlation of two event streams: the Pearson
    * correlation of daily counts of `typeA` at day t against `typeB` at
    * day t+lag, for every lag in [−maxLag, maxLag] — positive-lag peaks
    * mean A leads B (e.g. clicks precede purchases by k days), the
    * causal-direction screen before any attribution model.
    *
    * Determinism: daily counts are exact integers (one wordcount-shaped
    * aggregate over the events table); each lag's moment sums
    * (n, Σa, Σb, Σa², Σb², Σab) ride DECIMAL(38,0) — order-invariant —
    * and only the final Pearson formula runs in double, shared with the
    * oracle. The per-lag pairing is an equi-join of the daily table with
    * itself on (day + lag): days×lags rows, independent of event count.
    *
    * CONTRACT — present-days-only pairing: a lag pair (t, t+lag)
    * contributes only when BOTH days appear in the daily table (>= 1
    * event of either type); calendar days with zero events of both types
    * are excluded rather than contributing (0, 0) pairs, so for sparse
    * streams the CCF deviates from the contiguous-axis textbook
    * definition (which zero-fills the axis). This is deliberate: the
    * zero-filled variant rewards co-absence — long dead stretches drive
    * every lag's correlation toward +1 — while the event-days-only CCF
    * measures co-intensity where activity exists. Callers who want the
    * dense-axis definition densify over [min, max] day with a bounded
    * `sequence` join before calling (the tCloseness dense-grid pattern).
    *
    * @return one row per lag: (lag, n_pairs, ccf round-6), ordered by lag
    */
  def crossCorrelation(df: DataFrame, tsCol: String, typeCol: String,
      typeA: String, typeB: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 60, s"maxLag out of range: $maxLag")
    val spark = df.sparkSession
    import spark.implicits._
    val day = floor(unix_timestamp(col(tsCol)).cast("double") / 86400d)
      .as("day")
    val daily = graft.Caches.register(df
      .where(col(typeCol).isin(typeA, typeB))
      .select(day, col(typeCol).as("__t"))
      .groupBy("day")
      .agg(sum(when(col("__t") === typeA, 1L).otherwise(0L)).as("a"),
        sum(when(col("__t") === typeB, 1L).otherwise(0L)).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val lags = broadcast((-maxLag to maxLag).toDF("lag"))
    // build (a at t, b at t+lag): cross the A side with the lag table,
    // equi-join the B side shifted back by the lag
    val paired = daily.select(col("day"), col("a"))
      .crossJoin(lags)
      .join(daily.select(col("day").as("__d2"), col("b")),
        col("__d2") === col("day") + col("lag"))
    // widen BEFORE multiplying: long×long would wrap past ~3e9 daily
    // events; decimal(19,0)² promotes to decimal(38,0) exactly
    val da = col("a").cast("decimal(19,0)")
    val db = col("b").cast("decimal(19,0)")
    val d0 = lit(0).cast("decimal(38,0)")
    def dsum(c: org.apache.spark.sql.Column) =
      coalesce(sum(c.cast("decimal(38,0)")), d0)
    paired.groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        dsum(da).as("sa"), dsum(db).as("sb"),
        dsum(da * da).as("saa"),
        dsum(db * db).as("sbb"),
        dsum(da * db).as("sab"))
      .select(col("lag"), col("n_pairs"),
        round(
          (col("n_pairs").cast("double") * col("sab").cast("double")
            - col("sa").cast("double") * col("sb").cast("double"))
          / sqrt(col("n_pairs").cast("double") * col("saa").cast("double")
            - col("sa").cast("double") * col("sa").cast("double"))
          / sqrt(col("n_pairs").cast("double") * col("sbb").cast("double")
            - col("sb").cast("double") * col("sb").cast("double")), 6)
          .as("ccf"))
      .orderBy("lag")
  }

}
