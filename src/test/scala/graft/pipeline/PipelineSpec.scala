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
