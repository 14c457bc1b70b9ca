package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BlocklistPairhistSpec extends SparkSpec {
  import spark.implicits._

  test("keywordTag: counts occurrences, lists distinct sorted, skips clean docs") {
    val df = Seq(
      (1L, "bad words and more bad things"),
      (2L, "perfectly clean text here"),
      (3L, "worse than BAD, Bad and worse")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.keywordTag(df, "text", "doc_id", Seq("bad", "worse"))
      .collect()
    assert(r.length === 2) // doc 2 emits nothing
    val d1 = r(0); val d3 = r(1)
    assert(d1.getLong(0) === 1L && d1.getAs[Long]("n_matches") === 2L &&
      d1.getAs[String]("matched") === "bad")
    assert(d3.getLong(0) === 3L && d3.getAs[Long]("n_matches") === 4L &&
      d3.getAs[String]("matched") === "bad,worse")
  }

  test("keywordTag: dictionary is case-folded and deduplicated") {
    val df = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val r = TextAnalysis.keywordTag(df, "text", "doc_id",
      Seq("ALPHA", "alpha", "Alpha")).collect()
    assert(r.length === 1 && r.head.getAs[Long]("n_matches") === 1L)
  }

  test("keywordTag plan: dictionary joins broadcast, corpus never shuffles to it") {
    val df = (1 to 50).map(i => (i.toLong, s"word$i common filler")).toDF("doc_id", "text")
    val q = TextAnalysis.keywordTag(df, "text", "doc_id", Seq("common"))
    assert(q.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("rougeN: identical pair scores 1, disjoint pair scores 0") {
    val df = Seq(
      (0L, "alpha beta gamma delta"), (1L, "alpha beta gamma delta"),
      (2L, "one two three four"), (3L, "five six seven eight")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.rougeN(df, "text", "doc_id", n = 2).collect()
      .map(x => x.getLong(0) -> (x.getAs[Long]("overlap"),
        x.getAs[Double]("rouge_f"))).toMap
    assert(r(0L) === ((3L, 1.0)))
    assert(r(2L) === ((0L, 0.0)))
  }

  test("rougeN: clipped counts — repeated grams count min(ref, cand) times") {
    // ref has "a b" twice, cand once -> overlap clipped to 1
    val df = Seq((0L, "a b a b"), (1L, "a b c d")).toDF("doc_id", "text")
    val r = TextAnalysis.rougeN(df, "text", "doc_id", n = 2).head()
    // ref bigrams: {a b:2, b a:1}; cand: {a b:1, b c:1, c d:1}
    assert(r.getAs[Long]("overlap") === 1L)
    assert(r.getAs[Double]("rouge_r") === 0.333333)
    assert(r.getAs[Double]("rouge_p") === 0.333333)
  }

  test("rougeN: a too-short side drops the pair (no gram basis)") {
    val df = Seq((0L, "single"), (1L, "alpha beta gamma")).toDF("doc_id", "text")
    assert(TextAnalysis.rougeN(df, "text", "doc_id", n = 2).count() === 0L)
  }

  test("pairCosineHistogram: identical vectors land in the top bin with mean 1") {
    val v = Array(1.0f, 0.0f, 0.0f)
    val df = (0L to 9L).map(i => (i, v)).toDF("vec_id", "embedding")
    val r = Similarity.pairCosineHistogram(df, "vec_id", "embedding").collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("bin") === 9L)
    assert(r.head.getAs[Long]("n_pairs") === 5L) // (0,1)(2,3)(4,5)(6,7)(8,9)
    assert(r.head.getAs[Double]("mean_cos") === 1.0)
  }

  test("pairCosineHistogram: orthogonal pairs land mid-range") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), // cos 0
      (2L, Array(1.0f, 0.0f)), (3L, Array(-1.0f, 0.0f)) // cos -1
    ).toDF("vec_id", "embedding")
    val r = Similarity.pairCosineHistogram(df, "vec_id", "embedding")
      .collect().map(x => x.getAs[Long]("bin") -> x.getAs[Long]("n_pairs")).toMap
    assert(r === Map(0L -> 1L, 5L -> 1L)) // cos -1 -> bin 0; cos 0 -> bin 5
  }

  test("pairCosineHistogram is partitioning-invariant") {
    val df = (0L until 100L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val a = Similarity.pairCosineHistogram(df.repartition(1), "vec_id", "embedding")
      .collect().toSeq
    val b = Similarity.pairCosineHistogram(df.repartition(7), "vec_id", "embedding")
      .collect().toSeq
    assert(a === b)
  }
}
