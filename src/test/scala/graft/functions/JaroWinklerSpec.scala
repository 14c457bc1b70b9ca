package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JwImpl.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("graft_jw matches the published Jaro-Winkler reference values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
    assert(jw("", "") === 0.0)       // DuckDB convention: empty -> 0
    assert(jw("a", "") === 0.0)
    assert(jw("ab", "ba") === 0.0)   // window 0: no matches
  }

  test("prefix boost applies only above the 0.7 jaro threshold") {
    assert(jw("abcdxxxxxx", "abcdyyyyyy") === 0.6)          // not boosted
    assert(math.abs(jw("aXbcd", "aYbcd") - 0.88) < 1e-15)   // boosted, l=1
    // prefix capped at 4
    assert(math.abs(jw("abcdefghij", "abcdefghxx") - 0.92) < 1e-15)
  }

  test("graft_jw runs through SQL and codegen with null propagation") {
    import spark.implicits._
    val df = Seq(("MARTHA", Some("MARHTA")), ("DWAYNE", None))
      .toDF("a", "b")
    val out = df.select(expr("graft_jw(a, b)").as("s")).collect()
    assert(math.abs(out(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(out(1).isNullAt(0))
    // non-string inputs fail analysis, not execution
    intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(expr("graft_jw(a, b)")).collect()
    }
  }
}
