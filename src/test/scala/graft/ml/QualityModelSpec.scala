package graft.ml

import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // separable fixture: positives are normal prose-like token soup, the
  // negatives fail the quality rule (high non-alnum ratio) AND carry
  // distinctive junk tokens the hashed features can latch onto
  private def fixture = {
    val good = (0L until 40L).map { i =>
      (i, s"the quick brown fox jumps over the lazy dog number $i and runs far away")
    }
    val bad = (100L until 140L).map { i =>
      (i, s"zzqx$i spamspam !!!! #### $$$$ %%%% &&&& **** @@@@ ^^^^ ~~~~ ????")
    }
    (good ++ bad).toDF("doc_id", "text")
  }

  test("scoreQuality: labels mirror the heuristic rule on the fixture") {
    val out = QualityModel.scoreQuality(fixture, "text", "doc_id").collect()
    assert(out.length == 80)
    out.foreach { r =>
      val expect = if (r.getLong(0) < 100L) 1 else 0
      assert(r.getInt(1) == expect, s"doc ${r.getLong(0)} label")
    }
  }

  test("scoreQuality: trained scores rank positives above negatives") {
    val out = QualityModel.scoreQuality(fixture, "text", "doc_id")
      .select("label", "score").collect()
    val pos = out.filter(_.getInt(0) == 1).map(_.getDouble(1))
    val neg = out.filter(_.getInt(0) == 0).map(_.getDouble(1))
    val mp = pos.sum / pos.length
    val mn = neg.sum / neg.length
    assert(mp > mn, s"mean positive score $mp should exceed mean negative $mn")
    // pairwise ranking (AUC): a random positive should usually outscore a
    // random negative once the model has separated the two token pools
    val auc = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.length * neg.length)
    assert(auc > 0.8, s"AUC $auc should exceed 0.8 on the separable fixture")
  }

  test("scoreQuality: scores stay in (0,1) and pred thresholds at 0.5") {
    val out = QualityModel.scoreQuality(fixture, "text", "doc_id").collect()
    out.foreach { r =>
      val s = r.getDouble(2)
      assert(s > 0.0 && s < 1.0, s"score $s out of range")
      assert(r.getInt(3) == (if (s >= 0.5) 1 else 0), "pred/score mismatch")
    }
  }

  test("C2ST: separable domains score high AUC, identical domains ~0.5") {
    import org.apache.spark.sql.functions._
    // domain = the junk half: trivially separable on hashed features
    val sep = QualityModel.trainScore(fixture, "text", "doc_id",
      when(col("doc_id") >= 100L, 1.0).otherwise(0.0), iters = 3)
    val aucSep = Eval.aucExact(sep, "score", col("label") === 1)
      .head().getAs[Double]("auc")
    assert(aucSep > 0.9, s"separable domains should be detectable: $aucSep")
    // domain = doc parity WITHIN the same text distribution: no signal
    val same = QualityModel.trainScore(fixture, "text", "doc_id",
      when(col("doc_id") % 2 === 0, 1.0).otherwise(0.0), iters = 3)
    val aucSame = Eval.aucExact(same, "score", col("label") === 1)
      .head().getAs[Double]("auc")
    assert(aucSame < 0.9, s"parity split should not separate cleanly: $aucSame")
  }
}
