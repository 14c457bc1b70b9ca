package graft.ext

import graft.SparkSpec

class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("scan", "sc", "an", "win", "dow", "spark", "ab")
  private val vset = vocab.toSet
  private val maxLen = vocab.map(_.length).max

  test("segmentWord takes the longest match, falls back per character") {
    def seg(w: String) = Tokenize.segmentWord(w, vset, maxLen)
    assert(seg("scan") == Seq("scan"))            // whole word beats sc+an
    assert(seg("scanner") == Seq("scan", "n", "e", "r"))
    assert(seg("window") == Seq("win", "dow"))
    assert(seg("zzz") == Seq("z", "z", "z"))      // pure fallback
    assert(seg("abscan") == Seq("ab", "scan"))
    assert(seg("") == Seq.empty)
    // concat(pieces) == word, always
    for (w <- Seq("scan", "scanner", "window", "zzz", "abscan", "sparkly"))
      assert(seg(w).mkString == w)
  }

  test("subwordStats fingerprints the in-order piece stream per doc") {
    val df = Seq((1L, "window scan"), (2L, "scan window"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Tokenize.subwordStats(df, "text", "doc_id", vocab)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 0L)
    assert(out(1).getLong(1) == 3L)
    // same pieces, different order -> different fingerprint
    assert(out(0).getString(3) != out(1).getString(3))
    // empty doc: zero pieces, md5 of empty string
    assert(out(2).getLong(1) == 0L &&
      out(2).getString(3) == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("pieceStats weights by word frequency and marks fallback pieces") {
    val df = Seq((1L, "scanner scanner window")).toDF("doc_id", "text")
    val out = Tokenize.pieceStats(df, "text", "doc_id", vocab)
      .orderBy("piece").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // "scanner" occurs twice -> its pieces carry weight 2
    assert(out("scan") == ((2L, 1L, true)))
    assert(out("n") == ((2L, 1L, false)))
    assert(out("win") == ((1L, 1L, true)))
  }
}
