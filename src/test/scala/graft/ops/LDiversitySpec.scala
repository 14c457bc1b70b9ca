package graft.ops

import graft.SparkSpec

class LDiversitySpec extends SparkSpec {

  test("lDiversityViolations flags k-anonymous classes with constant sensitive") {
    import spark.implicits._
    // class A: 10 rows, 1 sensitive value  -> k-anonymous (k=10) but leaks
    // class B: 10 rows, 5 sensitive values -> diverse
    val df = ((1 to 10).map(i => ("A", s"s1")) ++
      (1 to 10).map(i => ("B", s"s${i % 5}"))).toDF("qi", "sens")
    val v = Quality.lDiversityViolations(df, Seq("qi"), "sens", l = 3)
      .collect()
    assert(v.map(_.getString(0)).toSeq === Seq("A"))
    assert(v.head.getLong(1) === 10L && v.head.getLong(2) === 1L)
    // the same class passes k-anonymity — the gap l-diversity closes
    assert(Quality.kAnonymityViolations(df, Seq("qi"), k = 10).count() === 0)
  }

  test("lDiversityViolations ignores null sensitive values in the count") {
    import spark.implicits._
    val df = Seq(("A", Some("x")), ("A", None), ("A", None),
      ("B", Some("x")), ("B", Some("y")), ("B", Some("z")))
      .toDF("qi", "sens")
    val v = Quality.lDiversityViolations(df, Seq("qi"), "sens", l = 2)
      .collect()
    assert(v.length === 1 && v.head.getString(0) === "A")
    assert(v.head.getLong(2) === 1L) // nulls don't count as diversity
  }
}
