package graft.ext

import graft.SparkSpec

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("dsirWeights ranks target-like docs above off-domain docs") {
    // target talks about spark; corpus has two spark-ish docs and two
    // about cooking — the spark docs must carry higher log ratios
    val target = Seq(
      (100L, "spark catalyst optimizer plans spark shuffle exchange"),
      (101L, "spark dataset joins broadcast spark partitions")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "spark catalyst plans and spark shuffle details"),
      (2L, "broadcast joins in spark datasets"),
      (3L, "slow cooked onion soup with butter and thyme"),
      (4L, "whisk eggs with sugar then fold in flour")
    ).toDF("doc_id", "text")
    val w = Importance.dsirWeights(corpus, "text", "doc_id", target, "text",
        dim = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 4)
    assert(w(1L) > w(3L) && w(1L) > w(4L), s"spark doc must outrank cooking: $w")
    assert(w(2L) > w(3L) && w(2L) > w(4L), s"spark doc must outrank cooking: $w")
  }

  test("dsirSelect keeps the k highest-ratio docs deterministically") {
    val target = Seq((100L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta"),
      (3L, "delta epsilon zeta"),
      (4L, "eta theta iota")
    ).toDF("doc_id", "text")
    val kept = Importance.dsirSelect(corpus, "text", "doc_id", target, "text",
        k = 2, dim = 64)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"target-like docs must be selected: $kept")
  }

  test("dsirWeights: zero-gram docs score 0.0 with n_grams = 0") {
    val target = Seq((9L, "alpha beta")).toDF("doc_id", "text")
    val corpus = Seq((1L, "alpha beta"), (2L, "???!!!")).toDF("doc_id", "text")
    val rows = Importance.dsirWeights(corpus, "text", "doc_id", target, "text",
        dim = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(2L) == ((0L, 0.0)), s"punctuation-only doc: ${rows(2L)}")
    assert(rows(1L)._1 == 3L) // 2 unigrams + 1 bigram
  }
}
