package graft.ext

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("a fully quoted doc has containment 1.0 toward the quoting doc") {
    val inner = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, inner),
      (2L, s"intro words here $inner closing words trail here now"),
      (3L, "completely different content about nothing shared at all ok")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "text", "doc_id",
      k = 5, thresh = 0.8, maxDf = 100).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getAs[Double]("contain_a") === 1.0)   // all of A's shingles in B
    assert(r.getAs[Double]("contain_b") < 1.0)
  }

  test("stop-shingles above maxDf are excluded from pair generation") {
    val glue = "common shared boiler plate phrase"
    val docs = Seq(
      (1L, s"$glue unique one text a"), (2L, s"$glue unique two text b"),
      (3L, s"$glue unique three text c")
    ).toDF("doc_id", "text")
    // the glue 5-shingle appears in 3 docs; with maxDf=2 it cannot glue
    val capped = Dedup.containmentPairs(docs, "text", "doc_id",
      k = 5, thresh = 0.1, maxDf = 2).collect()
    val uncapped = Dedup.containmentPairs(docs, "text", "doc_id",
      k = 5, thresh = 0.1, maxDf = 100).collect()
    assert(uncapped.nonEmpty)
    assert(capped.length < uncapped.length)
  }

  test("pair generation joins on the shingle — no cartesian in the plan") {
    val docs = Seq((1L, "a b c d e f"), (2L, "b c d e f g")).toDF("doc_id", "text")
    val plan = Dedup.containmentPairs(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }
}
