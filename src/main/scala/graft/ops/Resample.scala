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
}
