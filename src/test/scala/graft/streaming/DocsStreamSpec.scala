package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming document near-dup ingest (r13): stateless band-probe of a
  * static corpus index, batch ≡ stream (after the documented sink-side
  * distinct on the per-band-hit stream).
  */
class DocsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"

  private def corpus = Seq(
    (100L, base),
    (101L, "completely unrelated corpus text about catalyst optimizer internals"),
    (102L, base + " with a small suffix tweak")
  ).toDF("doc_id", "text")

  private def arrivals = Seq(
    (1L, base),                                        // near-dups 100 (and 102)
    (2L, "novel arrival sharing nothing with the corpus rows at all"),
    (3L, base + " with a small suffix tweak")           // near-dups 102 (and 100)
  ).toDF("doc_id", "text")

  test("streaming near-dup matches equal the batch result (stream-static band probe)") {
    val (bandsIdx, shIdx) = DocsStream.corpusIndex(corpus, "text", "doc_id")
    val batchOut = DocsStream.nearDupMatches(arrivals, "text", "doc_id",
        bandsIdx, shIdx, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchOut.nonEmpty && batchOut.exists(t => t._1 == 1L && t._2 == 100L))
    assert(!batchOut.exists(_._1 == 2L), s"novel doc must not match: $batchOut")

    val tmp = java.nio.file.Files.createTempDirectory("graft_docstream").toString
    arrivals.write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val q = DocsStream.nearDupMatches(
        spark.readStream.schema(schema).parquet(tmp), "text", "doc_id",
        bandsIdx, shIdx, threshold = 0.5)
      .writeStream.format("memory").queryName("docs_neardup")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    // per-band duplicate rows are the documented stateless contract —
    // sink-side distinct collapses them
    val streamOut = spark.table("docs_neardup").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamOut == batchOut,
      s"stream $streamOut != batch $batchOut")
  }

  test("the stream-side plan is stateless (no state store operators)") {
    val (bandsIdx, shIdx) = DocsStream.corpusIndex(corpus, "text", "doc_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft_docstream2").toString
    arrivals.write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val q = DocsStream.nearDupMatches(
        spark.readStream.schema(schema).parquet(tmp), "text", "doc_id",
        bandsIdx, shIdx)
      .writeStream.format("memory").queryName("docs_stateless")
      .outputMode("append").start()
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()
    assert(progress == null || progress.stateOperators.isEmpty,
      s"expected a stateless plan, got ${progress.stateOperators.length} state operators")
  }
}
