package graft.ops

import graft.SparkSpec

class FuzzyTrigramSpec extends SparkSpec {
  import spark.implicits._

  private val names = Seq("jonathan smith", "maria garcia", "wei zhang")
    .toDF("name")

  test("a tail-perturbed twin matches its source above threshold") {
    val twins = Seq("jonathan smiht", "completely different").toDF("twin")
    val out = Harmonize.fuzzyJoinTrigram(names, "name", twins, "twin",
        threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("jonathan smith", "jonathan smiht")))
  }

  test("pairs sharing no trigram are not found (the blocking contract)") {
    val twins = Seq("xqvxqvxqv").toDF("twin")
    val out = Harmonize.fuzzyJoinTrigram(names, "name", twins, "twin", 0.1)
    assert(out.count() === 0)
  }

  test("matching is case-insensitive") {
    val twins = Seq("JONATHAN SMITH").toDF("twin")
    val out = Harmonize.fuzzyJoinTrigram(names, "name", twins, "twin", 0.99)
      .collect()
    assert(out.length === 1 && out.head.getDouble(2) === 1.0)
  }

  test("the stop-gram cap excludes hot grams from candidate generation") {
    // 50 left values all sharing the gram "aaa" + distinct tails; the
    // right twin matches ONLY through "aaa"-overlap -> capped out
    val l = (0 until 50).map(i => f"aaa$i%04d").toDF("name")
    val r = Seq("aaazzzz").toDF("twin")
    val uncapped = Harmonize.fuzzyJoinTrigram(l, "name", r, "twin", 0.1)
    assert(uncapped.count() > 0) // blocked through the hot gram
    val capped = Harmonize.fuzzyJoinTrigram(l, "name", r, "twin", 0.1,
      maxDf = 10)
    assert(capped.count() === 0) // deterministic exclusion
  }

  test("short strings block on themselves") {
    val l = Seq("ab").toDF("name")
    val r = Seq("ab", "ba").toDF("twin")
    val out = Harmonize.fuzzyJoinTrigram(l, "name", r, "twin", 0.5)
      .collect().map(_.getString(1))
    assert(out.toSeq === Seq("ab")) // "ba" shares no block with "ab"
  }

  test("candidate generation is an equi-join, never a cartesian") {
    val plan = Harmonize.fuzzyJoinTrigram(names, "name", names, "name", 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }
}
