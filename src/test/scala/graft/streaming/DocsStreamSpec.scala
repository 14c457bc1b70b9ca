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

  test("streaming blocklist tagging equals the batch keywordTag (complete mode)") {
    val docs = Seq((1L, "bad words and more bad things"),
      (2L, "perfectly clean text"), (3L, "worse and BAD")).toDF("doc_id", "text")
    val batchOut = graft.ext.TextAnalysis
      .keywordTag(docs, "text", "doc_id", Seq("bad", "worse"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val tmp = java.nio.file.Files.createTempDirectory("graft_blockstream").toString
    docs.write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val q = graft.ext.TextAnalysis.keywordTag(
        spark.readStream.schema(schema).parquet(tmp), "text", "doc_id",
        Seq("bad", "worse"))
      .writeStream.format("memory").queryName("block_stream")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamOut = spark.table("block_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamOut === batchOut, s"stream $streamOut != batch $batchOut")
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

  test("streaming term stats equal the batch termStats across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // duplicate terms inside a doc AND the same doc id re-tokenized in a
    // later micro-batch: occurrences count every hit, doc_freq counts
    // each (term, doc) once — state must merge across batches
    val b1 = Seq((1L, "alpha alpha beta"), (2L, "beta gamma"))
    val b2 = Seq((3L, "alpha beta beta"), (1L, "alpha delta"))
    val all = (b1 ++ b2).toDF("doc_id", "text")
    val batch = graft.ext.TextAnalysis.termStats(all, "text", "doc_id")
      .select("term", "occurrences", "doc_freq")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF.toDF("doc_id", "text")
    val qOcc = DocsStream.termOccurrences(src, "text")
      .writeStream.format("memory").queryName("ts_occ")
      .outputMode("complete").start()
    val qDf = DocsStream.termDocFreq(src, "text", "doc_id")
      .writeStream.format("memory").queryName("ts_df")
      .outputMode("complete").start()
    mem.addData(b1: _*); qOcc.processAllAvailable(); qDf.processAllAvailable()
    mem.addData(b2: _*); qOcc.processAllAvailable(); qDf.processAllAvailable()
    qOcc.stop(); qDf.stop()
    val streamed = spark.table("ts_occ")
      .join(spark.table("ts_df"), Seq("term"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch, s"stream $streamed != batch $batch")
    // spot-check the interesting cells: alpha twice in doc 1's first
    // batch + once in each later hit; doc_freq ignores the repeats
    assert(streamed.contains(("alpha", 4L, 2L)))
    assert(streamed.contains(("beta", 4L, 3L)))
  }
}
