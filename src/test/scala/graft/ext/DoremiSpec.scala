package graft.ext

import graft.SparkSpec

class DoremiSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // domain "rare" uses vocabulary the corpus model barely sees ->
    // highest cross-entropy -> DoReMi upweights it
    val common = (1 to 40).map(i => (i.toLong, "alpha beta gamma delta", "common"))
    val rare = (41 to 44).map(i => (i.toLong, "zeppelin quark axion", "rare"))
    (common ++ rare).toDF("doc_id", "text", "domain")
  }

  test("doremiMixture starts uniform and upweights the high-loss domain") {
    val out = Importance.doremiMixture(corpus, "text", "domain",
      steps = 6, eta = 1.0, dim = 32).collect()
    val byStep = out.groupBy(_.getLong(0))
    // step 0: uniform
    assert(byStep(0L).forall(_.getDouble(3) === 0.5))
    // alphas sum to ~1 at every step
    byStep.values.foreach { rows =>
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-5)
    }
    // the rare domain's weight strictly grows with t
    val rareTraj = out.filter(_.getString(1) == "rare")
      .sortBy(_.getLong(0)).map(_.getDouble(3)).toSeq
    assert(rareTraj.zip(rareTraj.tail).forall { case (a, b) => b > a })
    // its excess loss is positive, the common domain's is zero
    assert(out.filter(_.getString(1) == "rare").head.getDouble(2) > 0)
    assert(out.filter(_.getString(1) == "common").head.getDouble(2) === 0.0)
  }

  test("doremiMixture trajectory matches the closed form") {
    val out = Importance.doremiMixture(corpus, "text", "domain",
      steps = 4, eta = 0.5, dim = 32).collect()
    val excess = out.map(r => r.getString(1) -> r.getDouble(2)).toMap
    out.foreach { r =>
      val t = r.getLong(0)
      val expected = {
        val ws = excess.map { case (d, e) => d -> math.exp(t * 0.5 * e) }
        ws(r.getString(1)) / ws.values.sum
      }
      assert(math.abs(r.getDouble(3) - expected) < 1e-4)
    }
  }

  test("doremiMixture rejects bad hyperparameters") {
    intercept[IllegalArgumentException] {
      Importance.doremiMixture(corpus, "text", "domain", steps = 0, eta = 1.0)
    }
  }
}
