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

  test("graft_nfc unifies composed and decomposed forms, identity on ASCII") {
    import spark.implicits._
    val composed = "café"                    // é as one code point
    val decomposed = "café"                 // e + combining acute
    val df = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"))
      .toDF("id", "t")
    val out = df.select(col("id"), call_function("graft_nfc", col("t")).as("n"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == composed, "already-NFC input unchanged")
    assert(out(1).getString(1) == composed, "decomposed input composes to NFC")
    assert(out(2).getString(1) == "plain ascii", "ASCII fast path is identity")
  }

  test("graft_nfc null propagates; non-string rejected at analysis") {
    import spark.implicits._
    val out = Seq(Option.empty[String]).toDF("t")
      .select(call_function("graft_nfc", col("t"))).head()
    assert(out.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_nfc(42)").collect()
    }
  }

  test("graft_nfc codegen and interpreted paths agree") {
    import spark.implicits._
    val rows = Seq("áb̈c", "Ångström", "x",
      "ȩ́mixed")
    val df = rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
    val viaCodegen = df.select(col("id"), call_function("graft_nfc", col("t")).as("n"))
      .orderBy("id").collect().map(_.getString(1))
    val expected = rows.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(viaCodegen.toSeq == expected)
  }

  test("decontaminateSemantic flags exactly the corpus rows within tau of an eval vec") {
    import spark.implicits._
    val eval = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.9, 0.1, 0.0)),    // cos ~0.994 -> flagged
      (2L, Seq(0.0, 1.0, 0.0)),    // cos 0      -> clean
      (3L, Seq(-1.0, 0.0, 0.0))    // cos -1     -> clean
    ).toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.decontaminateSemantic(
        corpus, eval, "vec_id", "embedding", tau = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L), s"expected only vec 1 flagged, got $out")
  }
}
