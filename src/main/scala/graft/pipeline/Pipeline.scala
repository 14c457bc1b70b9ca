package graft.pipeline

import graft.ops.{Clean, Harmonize, Preprocess}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's composed end-to-end pipeline (SURVEY §3 EP1):
  * harmonize -> process (clean) -> preprocess, in the exact statement order
  * of `Data_integration and harmonization.py:160-202`.
  *
  * The pandas positional row index is replaced with an explicit ordering
  * column supplied by the caller (`orderCol`); order-sensitive fills run
  * within optional `partitionCols` so the sort distributes at scale.
  */
object Pipeline {

  /** `process_data` (DIH.py:26-33): coerce strings to numeric, scrub ±inf,
    * interpolate, forward-fill, drop all-null columns.
    */
  def process(df: DataFrame, orderCol: String,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val coerced = Clean.scrubInf(Clean.coerceNumeric(df))
    val fillable = coerced.schema.fields.collect {
      case f if (f.dataType == DoubleType || f.dataType == FloatType) && f.name != orderCol =>
        f.name
    }.toIndexedSeq
    val interp = Clean.interpolate(coerced, fillable, orderCol, partitionCols)
    val filled = Clean.ffill(interp, fillable, orderCol, partitionCols)
    Clean.dropAllNullCols(filled)
  }

  /** `preprocess_data` (DIH.py:36-52): z-score numeric columns, label-encode
    * the remaining string columns. NOTE the reference's fidelity trap
    * (SURVEY §2.3): in the composed pipeline no string columns survive
    * `process`, so label encoding is a no-op there — but it remains part of
    * the public surface for direct calls.
    */
  def preprocess(df: DataFrame, excludeCols: Set[String] = Set.empty): DataFrame = {
    val nums = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && !excludeCols(f.name) => f.name
    }.toIndexedSeq
    val scaled = if (nums.isEmpty) df else Preprocess.zscore(df, nums)
    Preprocess.labelEncodeAll(scaled)
  }

  /** Full EP1 flow over already-loaded frames. */
  def run(dfs: Seq[DataFrame]): DataFrame = {
    val unioned = Harmonize.unionByName(dfs)
      .withColumn("__ingest_order", monotonically_increasing_id())
    val processed = process(unioned, "__ingest_order")
    preprocess(processed, excludeCols = Set("__ingest_order"))
      .drop("__ingest_order")
  }
}
