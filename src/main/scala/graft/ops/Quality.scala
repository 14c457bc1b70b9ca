package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality checks — the validation pass an integration pipeline runs
  * before (and after) harmonize/union, surfacing what the reference's
  * silent null-filling concat (`DIH.py:23`) would hide.
  *
  * Scale shape: every check is an aggregate (or anti-join + aggregate)
  * producing a handful of rows; nothing collects data to the driver.
  */
object Quality {

  /** One FK edge to validate: fact.fkCol should resolve in dim.pkCol. */
  case class FkEdge(name: String, fact: DataFrame, fkCol: String,
      dim: DataFrame, pkCol: String)

  /** Referential-integrity report: per edge, how many fact rows have a
    * non-null foreign key with no match in the dimension (SQL NOT EXISTS
    * semantics: a NULL fk never matches but is not an orphan).
    *
    * Each edge is a LEFT ANTI join — at scale the dim side broadcasts
    * when small, otherwise a shuffled hash join keyed on the fk; the
    * output is one row per edge, so the union is plan-level only.
    */
  def fkOrphans(edges: Seq[FkEdge]): DataFrame = {
    require(edges.nonEmpty, "fkOrphans needs at least one FK edge")
    edges.map { e =>
      e.fact.join(e.dim, e.fact(e.fkCol) === e.dim(e.pkCol), "left_anti")
        .where(e.fact(e.fkCol).isNotNull)
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(e.name).as("edge"), col("n_orphans"))
    }.reduce(_.unionByName(_))
  }

  /** Column-profile report: per column, distinct-value count and null
    * count — the distributed analogue of pandas `nunique()` + `isna().
    * sum()` that a schema-drift review reads next to [[Harmonize.
    * schemaDiff]].
    *
    * Deliberately ONE single-column aggregate pass per column (column-
    * pruned parquet scans + partial aggregation), NOT one multi-
    * countDistinct aggregate: Catalyst plans n distincts in one agg as an
    * Expand that replicates every row n times — a non-starter when the
    * fact table is the 100 TB side.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(
        count_distinct(col(c)).as("n_distinct"),
        (count(lit(1)) - count(col(c))).as("n_null"))
        .select(lit(c).as("column_name"), col("n_distinct"), col("n_null"))
    }.reduce(_.unionByName(_))
  }
}
