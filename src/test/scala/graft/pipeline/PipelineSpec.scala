package graft.pipeline

import graft.SparkSpec
import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("ingest: mixed csv + parquet inputs flow through the full pipeline") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    graft.Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$tmp/customer.csv")
    graft.Tables.load(spark, "/root/testdata/sf0.001", "supplier")
      .write.mode("overwrite").parquet(s"$tmp/supplier.parquet")
    val out = Pipeline.ingest(spark,
      Seq(s"$tmp/customer.csv", s"$tmp/supplier.parquet"),
      df => col(df.columns.head))
    assert(out.count() == 160) // 150 customers + 10 suppliers at sf0.001
    // string columns coerced->all-null->dropped; survivors are z-scored numerics + tags
    assert(!out.columns.contains("c_name") && !out.columns.contains("s_name"))
  }

  test("ingest rejects empty inputs with an explicit error") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Seq.empty[(Long, String)].toDF("id", "s").write.mode("overwrite").parquet(s"$tmp/empty.parquet")
    intercept[IllegalArgumentException] {
      Pipeline.ingest(spark, Seq(s"$tmp/empty.parquet"), df => lit(1))
    }
  }

  test("ffill after both-direction interpolate is the identity (r20 pass elision proof)") {
    // the property Pipeline.process relies on to skip its ffill pass:
    // interpolate(limit_direction='both') leaves a null ONLY where the
    // whole (group, column) slice is null — exactly where ffill is also
    // powerless. Includes an all-null slice (group "b", column y), edge
    // nulls, interior runs, and a group confined to one partition.
    val df = Seq[(String, Long, Option[Double], Option[Double])](
      ("a", 1L, None, Some(1.0)), ("a", 2L, Some(2.0), None),
      ("a", 3L, None, Some(3.0)), ("a", 4L, None, None),
      ("a", 5L, Some(10.0), Some(7.0)),
      ("b", 1L, Some(4.0), None), ("b", 2L, None, None),
      ("b", 3L, Some(6.0), None),
      ("c", 1L, None, Some(9.0))
    ).toDF("g", "ord", "x", "y")
    val interp = graft.ops.Clean.interpolate(df, Seq("x", "y"), "ord", Seq("g"))
    val refilled = graft.ops.Clean.ffill(interp, Seq("x", "y"), "ord", Seq("g"))
    val key = (r: org.apache.spark.sql.Row) => r.toString
    assert(refilled.orderBy("g", "ord").collect().map(key).toSeq
      === interp.orderBy("g", "ord").collect().map(key).toSeq)
    // and the surviving nulls are exactly the all-null slices:
    // (b, y) and (c, x); every other (group, column) slice is fully filled
    val nullCells = interp.select(col("g"), col("ord"),
        col("x").isNull.as("xn"), col("y").isNull.as("yn"))
      .collect()
      .flatMap(r => Seq("x" -> r.getBoolean(2), "y" -> r.getBoolean(3))
        .collect { case (c, true) => (r.getString(0), c) })
      .toSet
    assert(nullCells === Set(("b", "y"), ("c", "x")))
  }

  test("qualityFilter keeps good docs and drops repetitive/short ones") {
    val docs = Seq(
      (1L, "a solid document with plenty of distinct informative tokens spread across the text body"),
      (2L, "short"),
      (3L, ("spam " * 40).trim)).toDF("doc_id", "text")
    val kept = TextAnalysis.qualityFilter(docs, "text", minTokens = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L)) // 2 too short, 3 fails distinct-token ratio
  }
}
