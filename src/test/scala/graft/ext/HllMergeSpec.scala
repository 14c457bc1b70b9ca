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

  test("set ops: union sketch equals the sketch of the union; bounds sane") {
    val out = Sketches.hllSetOps(docs, "grp", "text", "grp0", "grp1").collect()
    assert(out.length === 1)
    val r = out.head
    val (exactA, exactB, exactU, exactI) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val (estA, estB, estU, estI) =
      (r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))
    // exact inclusion–exclusion must hold by construction
    assert(exactU === exactA + exactB - exactI)
    // union estimate = estimate over the physically-unioned corpus
    val merged = docs.where(col("grp").isin("grp0", "grp1"))
    val direct = Sketches.hllEstimate(merged, "text")
      .select("hll_estimate").collect().head.getDouble(0)
    assert(estU === direct)
    // estimator identity: est_i is the inclusion–exclusion of the three
    assert(math.abs(estI - (estA + estB - estU)) < 1e-6)
    // raw-regime accuracy envelope (64 registers, 4 sigma)
    assert(math.abs(estU - exactU) / exactU < 0.55)
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
