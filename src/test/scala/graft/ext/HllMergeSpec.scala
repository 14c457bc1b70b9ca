package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllMergeSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (1 to 120).map { i =>
      (i.toLong, s"grp${i % 3}",
        s"alpha$i beta${i % 40} gamma${i % 11} shared common tokens")
    }.toDF("id", "grp", "text")
  }

  test("per-group HLL registers max-merge into the global sketch exactly") {
    val grouped = Sketches.hllRegistersBy(docs, "grp", "text")
      .groupBy("bucket").agg(max("register").as("register"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val global = Sketches.hllRegisters(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grouped === global)
  }

  test("per-group estimates carry the same raw-regime estimator") {
    val by = Sketches.hllEstimateBy(docs, "grp", "text").collect()
    assert(by.length === 3)
    by.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(2)
      // 64 registers -> ~13% standard error; allow 4 sigma
      assert(math.abs(est - exact) / exact < 0.55, s"est=$est exact=$exact")
    }
  }
}
