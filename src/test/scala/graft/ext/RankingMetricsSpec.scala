package graft.ext

import graft.SparkSpec

class RankingMetricsSpec extends SparkSpec {
  import spark.implicits._

  // ranked list: docs 10, 20, 30, 40 at ranks 1..4
  private val ranked = Seq((10L, 1), (20L, 2), (30L, 3), (40L, 4))
    .toDF("id", "rank")

  test("perfect ranking scores ndcg 1.0 and mrr 1.0") {
    val rels = Seq((10L, 2L), (20L, 1L)).toDF("id", "rel")
    val r = Retrieval.rankingMetrics(ranked, "id", "rank", rels, "rel",
      Seq(4)).head()
    assert(approx(r.getAs[Double]("ndcg"), 1.0))
    assert(approx(r.getAs[Double]("mrr"), 1.0))
    assert(r.getAs[Long]("n_rel_topk") === 2L)
  }

  test("hand-computed ndcg for an imperfect ranking") {
    // rel(10)=0, rel(20)=2, rel(30)=1; dcg = 3/log2(3) + 1/log2(4)
    // idcg = 3/log2(2) + 1/log2(3)
    val rels = Seq((20L, 2L), (30L, 1L)).toDF("id", "rel")
    val r = Retrieval.rankingMetrics(ranked, "id", "rank", rels, "rel",
      Seq(4)).head()
    def d(i: Int) = Retrieval.ndcgDiscount(i)
    val dcg9 = 3L * d(2) + 1L * d(3)
    val idcg9 = 3L * d(1) + 1L * d(2)
    assert(approx(r.getAs[Double]("dcg"), math.rint(dcg9 / 1e9 * 1e6) / 1e6, 1e-6))
    assert(approx(r.getAs[Double]("ndcg"),
      BigDecimal(dcg9.toDouble / idcg9.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 1e-9))
    assert(approx(r.getAs[Double]("mrr"), 0.5)) // first relevant at rank 2
  }

  test("k truncation: rel beyond k contributes nothing; no rel -> null ndcg/mrr") {
    val rels = Seq((40L, 2L)).toDF("id", "rel") // only rank 4 is relevant
    val out = Retrieval.rankingMetrics(ranked, "id", "rank", rels, "rel",
      Seq(2, 4)).orderBy("k").collect()
    val k2 = out(0)
    assert(k2.getAs[Long]("n_rel_topk") === 0L)
    assert(k2.isNullAt(k2.fieldIndex("mrr")))
    assert(approx(k2.getAs[Double]("dcg"), 0.0))
    val k4 = out(1)
    assert(k4.getAs[Long]("n_rel_topk") === 1L)
    assert(approx(k4.getAs[Double]("mrr"), 0.25))
  }

  test("ideal ranking comes from the full qrels, not the ranked list") {
    // a rel-2 doc the ranker MISSED must still inflate idcg and cap ndcg
    val rels = Seq((99L, 2L), (10L, 1L)).toDF("id", "rel")
    val r = Retrieval.rankingMetrics(ranked, "id", "rank", rels, "rel",
      Seq(4)).head()
    // dcg = 1*d(1); idcg = 3*d(1) + 1*d(2) -> ndcg well below 1
    assert(r.getAs[Double]("ndcg") < 0.5)
  }

  test("discounts are monotone decreasing integers") {
    val ds = (1 to 15).map(Retrieval.ndcgDiscount)
    assert(ds.head === 1000000000L) // 1/log2(2) = 1
    assert(ds === ds.sorted.reverse)
  }
}
