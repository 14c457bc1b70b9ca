package graft.ext

import graft.SparkSpec

class CdcChunkSpec extends SparkSpec {

  private val body = (1 to 120).map(i => s"tok${i % 37}x$i").mkString(" ")

  test("CDC boundaries are content-local: a prepended token realigns chunks") {
    import spark.implicits._
    val docs = Seq((1L, body), (2L, "INSERTED " + body)).toDF("doc_id", "text")
    val out = SubstringDedup.contentDefinedChunks(docs, "text", "doc_id",
        window = 4, divisor = 8)
      .collect().groupBy(_.getLong(0))
    val fp1 = out(1L).map(_.getString(4)).toSet
    val fp2 = out(2L).map(_.getString(4)).toSet
    // all but the head chunk(s) re-align and fingerprint identically
    val shared = fp1.intersect(fp2)
    assert(shared.size >= fp1.size - 2,
      s"expected near-total chunk reuse, shared=${shared.size} of ${fp1.size}")
    // while fixed-width chunking would share (almost) nothing
    val fixed1 = body.split(" ").grouped(8).map(_.mkString(" ")).toSet
    val fixed2 = ("INSERTED " + body).split(" ").grouped(8).map(_.mkString(" ")).toSet
    assert(fixed1.intersect(fixed2).size <= 1)
  }

  test("CDC chunk lengths average near the divisor and cover every token") {
    import spark.implicits._
    val docs = Seq((1L, body)).toDF("doc_id", "text")
    val chunks = SubstringDedup.contentDefinedChunks(docs, "text", "doc_id",
        window = 4, divisor = 8)
      .orderBy("chunk_idx").collect()
    assert(chunks.map(_.getLong(3)).sum === 120L) // all tokens chunked
    assert(chunks.head.getLong(2) === 0L)         // first chunk starts at 0
    val mean = 120.0 / chunks.length
    assert(mean > 2 && mean < 40, s"mean chunk len $mean")
    // contiguous coverage: each chunk starts where the previous ended
    chunks.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) === a.getLong(2) + a.getLong(3))
    }
  }

  test("short documents form one chunk") {
    import spark.implicits._
    val docs = Seq((1L, "only two")).toDF("doc_id", "text")
    val chunks = SubstringDedup.contentDefinedChunks(docs, "text", "doc_id")
      .collect()
    assert(chunks.length === 1 && chunks.head.getLong(3) === 2L)
  }
}
