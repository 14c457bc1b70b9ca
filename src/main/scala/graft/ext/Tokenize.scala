package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real subword tokenization: greedy longest-match segmentation against a
  * fixed piece vocabulary (the public WordPiece/BPE-inference algorithm —
  * at each position take the longest vocabulary piece prefixing the
  * remainder, else emit one character and advance). North-star extension;
  * upgrades [[TextAnalysis.subwordCount]]'s ceil(len/4) heuristic to an
  * actual vocabulary-driven segmentation.
  *
  * Scale design: the matcher NEVER runs on corpus rows. Words are
  * aggregated to the DISTINCT-word table first (the Zipf-bounded side —
  * the standard wordcount shuffle), each distinct word is segmented
  * exactly once, and the piece arrays are joined back onto the (doc, pos,
  * word) token stream (AQE broadcasts the word table when it fits). The
  * per-word matcher is a plain Scala function behind a UDF — justified
  * because it executes |vocabulary| times, not |corpus| times; the corpus
  * hot path is tokenize → shuffle → join, all codegen'd.
  */
object Tokenize {

  import TextAnalysis.tokens

  /** The registered demo vocabulary — one definition shared by SparkEntry
    * and OracleSql so engine and oracle segment identically. Mixes whole
    * words with overlapping shorter pieces ("scan" vs "sc"+"an") so the
    * longest-match rule is actually exercised.
    */
  val DemoVocab: Seq[String] = Seq(
    "scan", "sc", "an", "order", "or", "der", "spark", "sp", "ark",
    "win", "dow", "mer", "ge", "cust", "omer", "tab", "le", "str", "eam",
    "que", "ry", "fil", "ter", "jo", "in", "ha", "sh", "ba", "tch",
    "gro", "up", "co", "lumn", "va", "lue", "vec", "tor", "part", "the")

  /** Greedy longest-match segmentation of one word. Pure + total:
    * characters not covered by any piece come out as single-char
    * fallback pieces, so concat(pieces) == word always holds.
    */
  def segmentWord(word: String, vocab: Set[String], maxPieceLen: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      var len = math.min(maxPieceLen, word.length - i)
      while (len > 1 && !vocab.contains(word.substring(i, i + len))) len -= 1
      val piece = word.substring(i, i + len)
      if (vocab.contains(piece)) { out += piece; i += len }
      else { out += word.substring(i, i + 1); i += 1 }
    }
    out.result()
  }

  /** Per-document subword stream stats: (doc_id, n_pieces, n_fallback,
    * fp) where fp = md5 of the space-joined piece stream in document
    * order (the cheap equality witness for the full sequence) and
    * n_fallback counts pieces outside the vocabulary (unk-char rate — the
    * standard "is this vocabulary adequate for this corpus" signal).
    * Every input document appears (empty docs: 0/0/md5('')).
    */
  def subwordStats(df: DataFrame, textCol: String, docIdCol: String,
      vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    require(vocab.forall(_.nonEmpty), "vocab pieces must be non-empty")
    val vset = vocab.toSet
    val maxLen = vocab.map(_.length).max
    val seg = udf((w: String) => segmentWord(w, vset, maxLen))
    val tok = df.select(col(docIdCol).as("doc_id"),
        posexplode(tokens(col(textCol))))
      .toDF("doc_id", "pos", "word")
    val words = tok.select("word").distinct()
      .withColumn("pieces", seg(col("word")))
    val perDoc = tok.join(words, Seq("word"))
      .groupBy("doc_id")
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("pos"), col("pieces")))),
        x => x.getField("pieces"))).as("pl"))
    val inVocab: Column => Column = p => p.isInCollection(vset)
    df.select(col(docIdCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(size(col("pl")), lit(0)).cast("long").as("n_pieces"),
        coalesce(size(filter(col("pl"), p => !inVocab(p))), lit(0)).cast("long")
          .as("n_fallback"),
        md5(coalesce(concat_ws(" ", col("pl")), lit(""))).as("fp"))
  }

  /** Corpus piece frequencies under the same segmentation: one row per
    * piece with total occurrences (weighted by word frequency) and the
    * number of distinct words it appears in — the "which merges earn
    * their vocabulary slot" report. Same distinct-word trick; corpus
    * rows only feed the wordcount.
    */
  def pieceStats(df: DataFrame, textCol: String, docIdCol: String,
      vocab: Seq[String]): DataFrame = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    val vset = vocab.toSet
    val maxLen = vocab.map(_.length).max
    val seg = udf((w: String) => segmentWord(w, vset, maxLen))
    val wc = df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("__wc"))
    wc.withColumn("piece", explode(seg(col("word"))))
      .groupBy("piece")
      .agg(sum("__wc").as("occurrences"),
        countDistinct("word").as("n_words"))
      // a piece string is either in the vocabulary or a fallback char —
      // constant per group, so derive it after the aggregate
      .withColumn("in_vocab", col("piece").isInCollection(vset))
  }
}
