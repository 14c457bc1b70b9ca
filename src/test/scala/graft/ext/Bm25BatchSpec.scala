package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class Bm25BatchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple cherry cherry date"),
    (4L, "date elderberry")
  ).toDF("doc_id", "text")

  test("batched ranking equals the single-query ranking per query") {
    val queries = Seq((10L, Seq("apple")), (20L, Seq("cherry", "date")))
      .toDF("qid", "terms")
    val batch = Retrieval.bm25TopKBatch(docs, "text", "doc_id",
        queries, "qid", "terms", k = 4)
      .collect().groupBy(_.getAs[Long]("qid"))
    for ((qid, terms) <- Seq(10L -> Seq("apple"), 20L -> Seq("cherry", "date"))) {
      val single = Retrieval.bm25TopK(docs, "text", "doc_id", terms, k = 4)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      val b = batch(qid).sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      assert(b.toSeq === single.toSeq, s"qid $qid")
    }
  }

  test("absent terms drop out instead of poisoning the score") {
    val queries = Seq((1L, Seq("apple", "zzzmissing"))).toDF("qid", "terms")
    val out = Retrieval.bm25TopKBatch(docs, "text", "doc_id",
        queries, "qid", "terms", k = 4).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("matched_terms") === 1L))
    val alone = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("apple"), k = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(out.sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
      === alone.toSeq)
  }

  test("k bounds each query's list independently") {
    val queries = Seq((1L, Seq("apple")), (2L, Seq("cherry")))
      .toDF("qid", "terms")
    val out = Retrieval.bm25TopKBatch(docs, "text", "doc_id",
      queries, "qid", "terms", k = 1)
    assert(out.groupBy("qid").count().collect().forall(_.getLong(1) === 1L))
  }

  test("query terms are case-folded") {
    val queries = Seq((1L, Seq("APPLE"))).toDF("qid", "terms")
    val out = Retrieval.bm25TopKBatch(docs, "text", "doc_id",
      queries, "qid", "terms", k = 4)
    assert(out.where(col("doc_id") === 1L).count() === 1L)
  }
}
