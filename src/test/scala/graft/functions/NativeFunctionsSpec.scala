package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native `graft_dot` Catalyst expression (registered via
  * GraftExtensions) must agree bit-for-bit with the higher-order-function
  * formulation and honor zip_with-style null semantics.
  */
class NativeFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot is registered and callable from SQL") {
    val r = spark.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head().getDouble(0)
    assert(approx(r, 11.0))
  }

  test("native dot equals HOF dot bit-for-bit on float arrays") {
    val vecs = (0 until 100).map { i =>
      (i.toLong, Array.tabulate(64)(d => (math.sin(i * 31 + d) * 3).toFloat),
        Array.tabulate(64)(d => (math.cos(i * 17 + d) * 2).toFloat))
    }
    val df = vecs.toDF("id", "a", "b")
    val both = df.select(
      VectorOps.dot(col("a"), col("b")).as("hof"),
      VectorOps.dotNative(col("a"), col("b")).as("nat")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
  }

  test("graft_dot null semantics: null array, length mismatch") {
    val r1 = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").head()
    assert(r1.isNullAt(0))
    val r2 = spark.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))").head()
    assert(r2.isNullAt(0))
  }

  test("graft_dot rejects non-array inputs at analysis time") {
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(1, 2)").collect()
    }
  }

  test("cosineNative equals cosine on the embeddings fixture") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val q = e.select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val both = e.select(
      VectorOps.cosine(col("embedding"), typedLit(q)).as("hof"),
      VectorOps.cosineNative(col("embedding"), typedLit(q)).as("nat")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_cos zero-norm and null semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0))),   // zero norm -> 0.0
      (None, Some(Seq(1.0, 2.0))),                  // null array -> null
      (Some(Seq(1.0)), Some(Seq(1.0, 2.0))),        // length mismatch -> null
      (Some(Seq(3.0, 4.0)), Some(Seq(3.0, 4.0)))    // identical -> 1.0
    ).toDF("a", "b")
    val out = df.select(VectorOps.cosineNative(col("a"), col("b")).as("c")).collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
    assert(math.abs(out(3).getDouble(0) - 1.0) < 1e-12)
  }
}
