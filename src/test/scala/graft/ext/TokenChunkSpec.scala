package graft.ext

import graft.SparkSpec

class TokenChunkSpec extends SparkSpec {
  import spark.implicits._

  test("windows start every stride tokens, overlap, and cover every token") {
    // 10 tokens, winSize 4, stride 3 -> starts 1,4,7,10
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenWindowChunks(docs, "text", "doc_id", 4, 3)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getAs[Int]("start_tok")).toSeq === Seq(1, 4, 7, 10))
    assert(out.map(_.getAs[Int]("n_tokens")).toSeq === Seq(4, 4, 4, 1))
    // covered token positions = union of [start, start+n) = 1..10
    val covered = out.flatMap(r => r.getAs[Int]("start_tok") until
      r.getAs[Int]("start_tok") + r.getAs[Int]("n_tokens")).toSet
    assert(covered === (1 to 10).toSet)
  }

  test("a short doc yields exactly one chunk; empty docs none") {
    val docs = Seq((1L, "only three tokens"), (2L, "...")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenWindowChunks(docs, "text", "doc_id", 64, 48)
    val rows = out.collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("id") === 1L)
    assert(rows.head.getAs[Int]("n_tokens") === 3)
  }

  test("identical windows share a fingerprint; the plan is scan-local") {
    val docs = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenWindowChunks(docs, "text", "doc_id", 8, 8)
    val fps = out.select("chunk_fp").collect().map(_.getString(0))
    assert(fps.toSet.size === 1)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
