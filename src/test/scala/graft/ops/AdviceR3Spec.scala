package graft.ops

import graft.SparkSpec
import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** Regressions for the round-3 advice items: bloom-join type guard,
  * clusterNearDups convergence on long chains, TopKAgg null tolerance and
  * bounded-buffer fast path.
  */
class AdviceR3Spec extends SparkSpec {
  import spark.implicits._

  test("bloomPrunedJoin rejects join types that must keep unmatched probe rows") {
    val probe = Seq((1L, "a"), (2L, "b")).toDF("k", "pv")
    val build = Seq((1L, "x")).toDF("k", "bv")
    for (bad <- Seq("left", "left_outer", "full_outer", "left_anti"))
      intercept[IllegalArgumentException] {
        Joins.bloomPrunedJoin(probe, build, Seq("k"), joinType = bad)
      }
    // semantics-preserving types still work
    assert(Joins.bloomPrunedJoin(probe, build, Seq("k"), joinType = "left_semi")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("clusterNearDups converges on a 200-hop chain within default maxIter") {
    // path graph 0-1-2-...-200: plain min-label propagation needs 200
    // rounds; pointer jumping must finish inside the default maxIter=20
    val pairs = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ids = (0L to 200L).toDF("doc_id")
    val out = Dedup.clusterNearDups(pairs, ids, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 201)
    assert(out.forall(_._2 == 0L), s"unconverged labels: ${out.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("topKPerGroupAgg ignores null values and ids instead of crashing") {
    val df = Seq(
      ("g", Some(5.0), Some(1L)), ("g", None, Some(2L)),
      ("g", Some(9.0), None), ("g", Some(7.0), Some(4L)),
      ("g", Some(3.0), Some(5L))).toDF("k", "v", "id")
    val out = Joins.topKPerGroupAgg(df, Seq("k"), "v", "id", 2)
      .orderBy("rn").collect().map(r => (r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, 7.0, 4L), (2, 5.0, 1L)))
  }

  test("TopKAgg bounded buffer keeps the exact top-k under any input order") {
    val agg = new graft.functions.TopKAgg(3)
    // feed a shuffled sequence through reduce; expected = top 3 by (v desc, id asc)
    val inputs = Seq((5.0, 10L), (1.0, 1L), (5.0, 2L), (9.0, 7L), (2.0, 3L),
      (9.0, 4L), (8.0, 6L), (0.5, 9L))
    val buf = inputs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == Seq((9.0, 4L), (9.0, 7L), (8.0, 6L)))
    // merge path: two half-buffers combine to the same answer
    val (l, r) = inputs.splitAt(4)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == Seq((9.0, 4L), (9.0, 7L), (8.0, 6L)))
  }
}
