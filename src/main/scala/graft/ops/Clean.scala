package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cleaning / type-coercion operators (SURVEY §2.3).
  *
  * Reference: `Data_integration and harmonization.py:26-33` —
  * string-to-numeric coercion with unparseable values becoming null,
  * ±inf scrubbed to null, linear interpolation of interior nulls with
  * nearest-value fill at the edges, forward-fill, drop of all-null columns,
  * and `describe()`-style summary statistics.
  *
  * Order sensitivity: pandas interpolation/ffill operate over the positional
  * row index. Spark has no stable row order, so every order-sensitive op here
  * takes an explicit `orderCol` (and optional `partitionCols`). With
  * `partitionCols` empty the window is global — exact reference parity, but a
  * single-task sort; at 100 TB always pass a partitioning key (per source
  * file / per entity) so the sort distributes.
  */
object Clean {

  private def numericCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
    }.toIndexedSeq

  /** C1 — coerce string columns to double; unparseable values become null
    * (pandas `to_numeric(errors='coerce')`). `try_cast` keeps this safe under
    * ANSI mode (Spark 4 default) and pushes into codegen.
    */
  def coerceNumeric(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets =
      if (cols.nonEmpty) cols.toSet
      else df.schema.fields.filter(_.dataType == StringType).map(_.name).toSet
    df.select(df.columns.toIndexedSeq.map { c =>
      if (targets(c)) col(c).try_cast("double").as(c) else col(c)
    }: _*)
  }

  /** C2 — replace ±Infinity with null in floating-point columns. */
  def scrubInf(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets = if (cols.nonEmpty) cols else numericCols(df)
    val tset = targets.toSet
    df.select(df.columns.toIndexedSeq.map { c =>
      if (tset(c)) scrubInfCol(col(c)).as(c) else col(c)
    }: _*)
  }

  def scrubInfCol(c: Column): Column =
    when(c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity),
      lit(null).cast(DoubleType)).otherwise(c)

  /** C3 — linear interpolation over row positions, pandas
    * `interpolate(method='linear', limit_direction='both')`: interior null
    * runs are linearly interpolated between nearest non-null neighbours by
    * POSITION (pandas interpolates on the positional index, not on any value
    * column); leading nulls take the first valid value, trailing nulls the
    * last. Verified reference behavior:
    * `[nan,nan,1,nan,5,nan,nan] -> [1,1,1,3,5,5,5]`.
    *
    * Implementation: one `row_number` pass to pin positions, then per value
    * column two frame-bounded `last/first(ignoreNulls)` windows sharing the
    * same sort order (Catalyst reuses the exchange+sort across the window
    * expressions, so the data is sorted once per partitioning).
    */
  def interpolate(
      df: DataFrame,
      valueCols: Seq[String],
      orderCol: String,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val posCol = "__graft_pos"
    val base = Window.partitionBy(partitionCols.map(col): _*)
    val wPos = base.orderBy(col(orderCol))
    val wPrev = base.orderBy(col(posCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next non-null" is expressed as last-over-DESCENDING-order rather than
    // first-over-(currentRow, unboundedFollowing): Spark's unbounded-
    // FOLLOWING frame recomputes its aggregate from scratch for every row
    // (O(n^2) per partition — pathological on long null runs), while the
    // unbounded-PRECEDING frame is a single accumulating O(n) pass. The
    // price is one extra sort per partitioning, which Catalyst schedules
    // once for all reversed expressions together.
    val wNextRev = base.orderBy(col(posCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withPos = df.withColumn(posCol, row_number().over(wPos))
    val out = valueCols.foldLeft(withPos) { (acc, c) =>
      val v = col(c)
      val pos = col(posCol)
      val prevV = last(v, ignoreNulls = true).over(wPrev)
      val prevP = last(when(v.isNotNull, pos), ignoreNulls = true).over(wPrev)
      val nextV = last(v, ignoreNulls = true).over(wNextRev)
      val nextP = last(when(v.isNotNull, pos), ignoreNulls = true).over(wNextRev)
      val interp = when(v.isNotNull, v)
        .when(prevV.isNull, nextV)
        .when(nextV.isNull, prevV)
        .otherwise(prevV + (nextV - prevV) * (pos - prevP) / (nextP - prevP))
      acc.withColumn(c, interp)
    }
    out.drop(posCol)
  }

  /** C4 — forward fill (pandas `fillna(method='ffill')`): null takes the
    * previous non-null value in `orderCol` order within each partition.
    */
  def ffill(
      df: DataFrame,
      valueCols: Seq[String],
      orderCol: String,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** C5 — drop columns whose every value is null (pandas
    * `dropna(axis=1, how='all')`). Inherently two-phase on Spark: one
    * aggregate pass computes per-column non-null counts (a tiny single-row
    * result collected to the driver), then the projection drops the empty
    * columns. The aggregate is map-side combinable — one shuffle of one row.
    */
  def dropAllNullCols(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.toIndexedSeq.map(c =>
      count(col(c)).as(c)): _*).head()
    val dead = df.columns.filter(c => counts.getAs[Long](c) == 0L)
    if (dead.isEmpty) df else df.drop(dead.toIndexedSeq: _*)
  }

  /** C6 — summary statistics (pandas `describe()`): per numeric column
    * count, mean, sample std (ddof=1), min, exact linear-interpolated
    * quartiles, max. Single aggregate pass over all columns, reshaped to
    * long form with `stack`. Exact `percentile` matches pandas/DuckDB
    * `quantile_cont`; swap for `approx_percentile` at 100 TB if exactness
    * can be relaxed.
    */
  def summaryStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    // ONE exact-percentile accumulator per column (array of quantiles), not
    // three: the exact percentile buffers every distinct value, so separate
    // p25/p50/p75 aggregates would triple the memory the merge phase holds.
    val aggs = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(v).as(s"${c}__cnt"),
        round(avg(v), 6).as(s"${c}__mean"),
        round(stddev_samp(v), 6).as(s"${c}__std"),
        round(min(v).cast(DoubleType), 6).as(s"${c}__min"),
        percentile(v, array(lit(0.25), lit(0.5), lit(0.75))).as(s"${c}__pct"),
        round(max(v).cast(DoubleType), 6).as(s"${c}__max"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val one = agged.select(cols.flatMap { c =>
      Seq(col(s"${c}__cnt"), col(s"${c}__mean"), col(s"${c}__std"), col(s"${c}__min"),
        round(col(s"${c}__pct")(0), 6).as(s"${c}__p25"),
        round(col(s"${c}__pct")(1), 6).as(s"${c}__p50"),
        round(col(s"${c}__pct")(2), 6).as(s"${c}__p75"),
        col(s"${c}__max"))
    }: _*)
    val stackExpr = s"stack(${cols.size}, " + cols.map { c =>
      s"'$c', `${c}__cnt`, `${c}__mean`, `${c}__std`, `${c}__min`, " +
        s"`${c}__p25`, `${c}__p50`, `${c}__p75`, `${c}__max`"
    }.mkString(", ") +
      ") as (column_name, cnt, mean, std, min_v, p25, p50, p75, max_v)"
    one.select(expr(stackExpr)).orderBy("column_name")
  }

  /** C6 combined — pandas `describe(include='all')`: numeric stats and
    * string unique/top/freq in one long-form frame keyed by column_name
    * (full outer join of the two halves; stats that don't apply are null,
    * exactly like pandas' NaN-filled describe matrix).
    */
  def describeAll(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{NumericType, StringType}
    val nums = df.schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }.toIndexedSeq
    val strs = df.schema.fields.collect { case f if f.dataType == StringType => f.name }.toIndexedSeq
    (nums.nonEmpty, strs.nonEmpty) match {
      case (true, true) =>
        val s = summaryStatsStrings(df, strs).withColumnRenamed("cnt", "__cnt_str")
        summaryStats(df, nums).join(s, Seq("column_name"), "full_outer")
          .withColumn("cnt", coalesce(col("cnt"), col("__cnt_str")))
          .drop("__cnt_str")
          .orderBy("column_name")
      case (true, false) => summaryStats(df, nums)
      case (false, true) => summaryStatsStrings(df, strs)
      case _ => df.sparkSession.emptyDataFrame
    }
  }

  /** C6 (string half) — pandas `describe(include='all')` for object columns:
    * per column count, number of distinct values, the most frequent value
    * (`top`) and its frequency (`freq`). Ties on frequency break to the
    * lexicographically smallest value so the result is deterministic (pandas
    * itself is tie-order-dependent; we pin a total order).
    *
    * Scale shape: all string columns are melted into (column_name, value)
    * rows in ONE projection, then a single groupBy counts values — one
    * shuffle of n_cols × n_rows narrow rows, map-side combinable. The
    * per-column top is a window over the (tiny) distinct-value counts.
    */
  def summaryStatsStrings(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackExpr = s"stack(${cols.size}, " +
      cols.map(c => s"'$c', `$c`").mkString(", ") + ") as (column_name, value)"
    val long = df.select(expr(stackExpr)).where(col("value").isNotNull)
    val counts = long.groupBy("column_name", "value").agg(count(lit(1)).as("vfreq"))
    val w = Window.partitionBy("column_name").orderBy(col("vfreq").desc, col("value"))
    counts.withColumn("__rn", row_number().over(w))
      .groupBy("column_name").agg(
        sum("vfreq").as("cnt"),
        count(lit(1)).as("n_unique"),
        max(when(col("__rn") === 1, col("value"))).as("top"),
        max(when(col("__rn") === 1, col("vfreq"))).as("top_freq"))
      .orderBy("column_name")
  }
}
