package graft.ops

import org.apache.spark.sql.DataFrame

/** Integration / harmonization operators (SURVEY §2.2).
  *
  * Reference: `Data_integration and harmonization.py:20-23` — column-name
  * standardization (`lower().replace(' ','_')`) followed by union-by-name
  * concatenation (`pd.concat(dfs, ignore_index=True)`) where columns absent
  * from a frame become null.
  *
  * Scale notes: both ops are narrow (no shuffle). `unionByName` is a pure
  * plan-level concatenation of scan partitions; downstream wide operators
  * decide the shuffle. Null-fill of missing columns is a projection.
  */
object Harmonize {

  /** H1 — standardize column names: lowercase, spaces to underscores. */
  def standardizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(c => c.toLowerCase.replace(" ", "_")).toIndexedSeq: _*)

  /** H2 — union-by-name concat of N heterogeneous tables with null-fill.
    * Column order: first frame's schema order, right-only columns appended —
    * matching `pd.concat`'s alignment semantics.
    */
  def unionByName(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionByName needs at least one input")
    dfs.map(standardizeColumns).reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
