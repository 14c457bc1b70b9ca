package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph scoring over edge lists (north-star extension) —
  * complements [[Dedup.clusterNearDups]] (connected components) with an
  * importance measure: fixed-iteration PageRank. Use case in a training-
  * data pipeline: rank documents inside a near-dup/similarity graph so
  * dedup keeps the most-linked representative instead of min-id.
  *
  * Not oracle-gated: power iteration in SQL needs a recursive CTE over
  * floats — out of the dialect-shared subset — but a FIXED iteration count
  * makes the computation fully deterministic, so ScalaTests pin exact
  * invariants instead.
  */
object Graph {

  /** PageRank with `iters` power iterations and damping `d`.
    *
    * Scale shape: per iteration, ONE shuffle — contributions flow along
    * edges via a join keyed on src, then a groupBy on dst (map-side
    * combinable). Out-degrees are computed once. Dangling nodes (no out
    * edges) redistribute their mass uniformly — the standard correction,
    * computed as a one-row aggregate broadcast into the update. Ranks
    * localCheckpoint per iteration so the plan stays flat (the
    * clusterNearDups lesson).
    *
    * @param edges directed (src, dst) pairs
    * @param nodes one row per node id (isolated nodes keep base rank)
    * @return (id, rank), sum of ranks = number of nodes
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, idCol: String,
      iters: Int = 10, d: Double = 0.85): DataFrame = {
    val ids = nodes.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint(true)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint(true)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = ids.count()
    var ranks = ids.withColumn("rank", lit(1.0)).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val withDeg = ranks.join(outDeg, ranks("id") === outDeg("src"), "left")
      // mass from dangling nodes (deg null) spreads uniformly
      val danglingMass = withDeg.where(col("deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = withDeg.where(col("deg").isNotNull)
        .join(e, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("inflow"))
      ranks = ids.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - d) + lit(d) *
            (coalesce(col("inflow"), lit(0.0)) + lit(danglingMass / n))).as("rank"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }
}
