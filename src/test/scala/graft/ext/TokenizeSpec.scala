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

  test("learnBpeMerges replays the classic trainer rounds deterministically") {
    val df = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val m = Tokenize.learnBpeMerges(df, "text", "doc_id", numMerges = 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: a|b appears twice per "abab", word count 2 -> weight 4
    // round 2: the merged ab|ab pair; round 3: only c|d remains
    assert(m.toSeq == Seq((1L, "a", "b", 4L), (2L, "ab", "ab", 2L), (3L, "c", "d", 1L)))
  }

  test("bpeSegment applies the learned merges to the corpus in order") {
    val df = Seq((1L, "abab cd"), (2L, "cd abab")).toDF("doc_id", "text")
    // merges learned on this corpus: a+b (w=2 each word -> cnt 4),
    // then ab+ab (cnt 2) -> "abab" segments to [abab], "cd" to [c, d]
    val out = Tokenize.bpeSegment(df, "text", "doc_id", numMerges = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2L) // n_words
    assert(out(0).getLong(2) == 3L) // abab + c + d
    // same pieces, reversed doc order -> different fingerprints
    assert(out(0).getString(3) != out(1).getString(3))
    assert(out(1).getLong(2) == 3L)
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
  test("subwordCoverage: fallback rate rolls up by group") {
    // vocab covers "scan"/"window" fully; "zzz" is pure fallback
    val df = Seq((1L, "scan window", "en"), (2L, "zzz", "xx"))
      .toDF("doc_id", "text", "lang")
    val out = Tokenize.subwordCoverage(df, "text", "doc_id", "lang", vocab)
      .orderBy("grp").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out("en") == ((3L, 0L, 0.0)))  // scan + win + dow
    assert(out("xx") == ((3L, 3L, 1.0)))  // z z z all fallback
  }

  test("learnBpeMerges stops cleanly when the pair supply runs out (r12 advice)") {
    import spark.implicits._
    // "ab" has exactly one adjacent pair; after merging it into <ab>
    // there are no pairs left — numMerges=5 must stop at 1, not throw
    val df = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Tokenize.learnBpeMerges(df, "text", "doc_id", numMerges = 5)
      .collect()
    assert(merges.length == 1)
    assert((merges(0).getString(1), merges(0).getString(2)) == (("a", "b")))
    // an empty corpus learns zero merges, same clean stop
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Tokenize.learnBpeMerges(empty, "text", "doc_id", 3).count() == 0L)
  }

  /** Reference DP mirroring viterbiSegment's objective exactly: fewest
    * pieces, tie-break max Σfreq (cost = big - freq per edge), backpointer
    * = smallest start j achieving dp[i].
    */
  private def refSegment(word: String, freq: Map[String, Long],
      vocab2: Set[String], maxPieceLen: Int, big: Long): Seq[String] = {
    val L = word.length
    val dp = Array.fill(L + 1)(Long.MaxValue); dp(0) = 0L
    val bp = Array.fill(L + 1)(-1)
    for (i <- 1 to L; len <- 1 to math.min(maxPieceLen, i)) {
      val j = i - len
      val p = word.substring(j, i)
      val ok = len == 1 || vocab2(p)
      if (ok && dp(j) != Long.MaxValue) {
        val c = dp(j) + (big - freq.getOrElse(p, 0L))
        if (c < dp(i) || (c == dp(i) && j < bp(i))) { dp(i) = c; bp(i) = j }
      }
    }
    var i = L; var acc = List.empty[String]
    while (i > 0) { acc = word.substring(bp(i), i) :: acc; i = bp(i) }
    acc
  }

  test("viterbiSegment matches a reference lattice DP word for word") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcd abcd bcd bcd bcd scanner window merge"),
      (2L, "window window merge scanner bcd ab ab"),
      (3L, "the customer table stream query abcd")).toDF("doc_id", "text")
    val out = Tokenize.viterbiSegment(docs, "text",
        maxPieceLen = 4, topV = 10, maxWordLen = 16, minWordCount = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getString(3)))).toMap
    // rebuild the same vocab the engine derives: all substrings of
    // length <= 16 words, weighted by occurrences, top-10 of len >= 2
    val words = docs.select(org.apache.spark.sql.functions.explode(
        graft.ext.TextAnalysis.tokens(org.apache.spark.sql.functions.col("text"))))
      .as[String].collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter(_._1.length <= 16)
    val freq = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; j <- 0 until w.length;
         len <- 1 to math.min(4, w.length - j)) {
      val p = w.substring(j, j + len)
      freq(p) = freq.getOrElse(p, 0L) + c
    }
    val vocab2 = freq.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(10).map(_._1).toSet
    for ((w, c) <- words) {
      val expected = refSegment(w, freq.toMap, vocab2, 4, 1000000000000L)
      val (wcnt, np, pieces) = out(w)
      assert(wcnt === c, s"wcnt for $w")
      assert(pieces === expected.mkString(" "), s"segmentation of $w")
      assert(np === expected.length, s"n_pieces of $w")
      assert(pieces.replace(" ", "") === w, s"concat(pieces) != $w")
    }
  }

  test("viterbiSegment beats greedy longest-match where greedy strands a suffix") {
    import spark.implicits._
    // len>=2 piece freqs: ab/bc/bcd/cd all 7, abc/abcd 1; topV = 3 keeps
    // {ab, bc, bcd} (tie breaks ascending) and EXCLUDES cd — greedy
    // longest-match on "abcd" would take "ab" then shatter "cd" into
    // two fallback chars (3 pieces); the DP finds a + bcd (2 pieces)
    val docs = Seq((1L, ("ab " * 6 + "bcd " * 6 + "abcd").trim))
      .toDF("doc_id", "text")
    val out = Tokenize.viterbiSegment(docs, "text",
        maxPieceLen = 4, topV = 3, maxWordLen = 16, minWordCount = 1L)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out("abcd") === "a bcd")
    assert(out("ab") === "ab")
    assert(out("bcd") === "bcd")
  }
}
