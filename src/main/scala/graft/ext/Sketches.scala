package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch over corpus terms — the bounded-state
  * frequency estimator (public algorithm: Cormode & Muthukrishnan 2005).
  * At 100 TB the full term-frequency table is vocabulary-sized; the
  * sketch is depth×width cells regardless of vocabulary, cells are plain
  * sums (map-side combinable, mergeable across shards/batches — the same
  * incremental-state story as `Merge.aggState`), and point estimates are
  * depth cell lookups.
  *
  * Hashing is the repo's md5 60-bit hex-slice idiom (hashingTf /
  * winnowing), seeded per row as `r:term` — no RNG, reproducible, and the
  * DuckDB oracle recomputes identical cells.
  */
object Sketches {

  import TextAnalysis.tokens

  private def bucket(r: Column, term: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(r.cast("string"), lit(":"), term)), 1, 15),
      16, 10).cast("long"), lit(width.toLong))

  /** The sketch itself: sparse (r, bucket, cnt) cells, depth rows ×
    * width buckets. One token scan, one (r, bucket) shuffle of at most
    * depth×width groups.
    */
  def countMinCells(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive: $depth, $width")
    df.select(explode(tokens(col(textCol))).as("term"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("term"))
      .select(col("r").cast("long").as("r"),
        bucket(col("r"), col("term"), width).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates vs ground truth for every corpus term: estimate =
    * min over the term's depth cells — never below the exact count (the
    * CMS one-sided error guarantee, asserted in the spec and visible in
    * the output as `overcount`).
    */
  def countMinEstimates(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    val cells = countMinCells(df, textCol, depth, width)
    val exact = df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact_count"))
    exact
      .select(col("term"), col("exact_count"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("term"), col("exact_count"), col("r").cast("long").as("r"),
        bucket(col("r"), col("term"), width).as("bucket"))
      .join(cells, Seq("r", "bucket"))
      .groupBy("term")
      .agg(min("exact_count").as("exact_count"),
        min("cnt").as("estimate"))
      .select(col("term"), col("exact_count"), col("estimate"),
        (col("estimate") - col("exact_count")).as("overcount"))
  }
}
