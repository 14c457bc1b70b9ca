package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (100 TB checklist: "skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's skew-join split handles most shuffle-join skew automatically in
  * Spark 4; these helpers cover the two cases it does not:
  *  - a skewed GROUP BY (one hot key funnels into one reduce task) —
  *    `saltedAggregate` runs a two-level aggregation: partial per
  *    (key, salt), then final per key. Correct for any algebraic
  *    aggregate expressed as (partial, merge) pairs.
  *  - a skewed join against a SMALL-but-not-broadcastable right side —
  *    `saltedJoin` explodes the right side `salt` ways so the hot left
  *    keys spread over `salt` reduce tasks.
  */
object Skew {

  /** Deterministic salt in [0, salt): hash of the whole row's key columns
    * plus a spreading column if provided; falls back to a random-free
    * spread via `spark_partition_id` mixing is deliberately avoided —
    * determinism keeps results verifiable.
    */
  private def saltCol(spread: Column, salt: Int): Column =
    pmod(xxhash64(spread), lit(salt)).cast("int")

  /** Two-level skew-safe sum/count/min/max aggregation.
    *
    * @param aggs (partialExpr, finalExpr, name): partial runs per
    *             (keys, salt); final merges partials per keys. E.g.
    *             (sum(x), sum, "sum_x").
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], spread: Column, salt: Int,
      aggs: Seq[(Column, Column => Column, String)]): DataFrame = {
    val salted = df.withColumn("__graft_salt", saltCol(spread, salt))
    val partial = salted.groupBy((keys :+ "__graft_salt").map(col): _*)
      .agg(aggs.head._1.as(s"__p_${aggs.head._3}"),
        aggs.tail.map(a => a._1.as(s"__p_${a._3}")): _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._2(col(s"__p_${aggs.head._3}")).as(aggs.head._3),
        aggs.tail.map(a => a._2(col(s"__p_${a._3}")).as(a._3)): _*)
  }

  /** Skew-safe equi-join: left rows get a deterministic salt from a spread
    * expression; the right side is exploded `salt` ways so every
    * (key, salt) bucket exists. Join output is identical to the unsalted
    * join; the hot key's rows land on `salt` tasks instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      spread: Column, salt: Int): DataFrame = {
    val l = left.withColumn("__graft_salt", saltCol(spread, salt))
    val r = right
      .withColumn("__graft_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__graft_salt", col("__graft_salt").cast("int"))
    l.join(r, on :+ "__graft_salt").drop("__graft_salt")
  }
}
