package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, levenshtein, lower}

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq(
    "plush", "blush", "flush", // substitution chain, all pairwise ed=1? (p/b/f)
    "plus",                    // deletion of 'h' from plush
    "pplush",                  // insertion
    "alpha", "omega",          // far from everything
    "Plush"                    // case-folds into plush (distinct collapses)
  ).toDF("w")

  test("finds exactly the brute-force ed<=1 pairs") {
    val got = Harmonize.editDistance1Pairs(words, "w")
      .select("w_a", "w_b").as[(String, String)].collect().toSet
    val vals = words.select(lower(col("w")).as("w"))
      .where(org.apache.spark.sql.functions.length(col("w")) >= 2).distinct()
    val brute = vals.toDF("a").crossJoin(vals.toDF("b"))
      .where(col("a") < col("b") && levenshtein(col("a"), col("b")) <= 1)
      .as[(String, String)].collect().toSet
    assert(got === brute)
    assert(got.contains(("blush", "plush")))   // substitution
    assert(got.contains(("plus", "plush")))    // deletion
    assert(got.contains(("plush", "pplush")))  // insertion
    assert(!got.exists(p => p._1 == "alpha" || p._2 == "omega" && p._1 == "alpha"))
  }

  test("blocking recall is total on the real supplier names") {
    val sup = spark.read
      .parquet("/root/testdata/sf0.001/supplier.parquet").select("s_name")
    val got = Harmonize.editDistance1Pairs(sup, "s_name")
      .select("w_a", "w_b").as[(String, String)].collect().toSet
    val vals = sup.select(lower(col("s_name")).as("w")).distinct()
    val brute = vals.toDF("a").crossJoin(vals.toDF("b"))
      .where(col("a") < col("b") && levenshtein(col("a"), col("b")) <= 1)
      .as[(String, String)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty, "fixture should contain ed<=1 name pairs")
  }

  test("candidates come from a variant equi-join, never a cartesian") {
    val plan = Harmonize.editDistance1Pairs(words, "w")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }
}
