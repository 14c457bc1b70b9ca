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

  /** BPE merge LEARNING (the training side of byte-pair encoding, public
    * algorithm: Sennrich et al. 2016): `numMerges` rounds of "count all
    * adjacent piece pairs, merge the most frequent everywhere".
    *
    * Scale formulation: pair counting runs over the DISTINCT-word table
    * weighted by word frequency — the classic scalable BPE trainer (the
    * corpus is touched once for the wordcount; every round after that
    * aggregates the Zipf-bounded word table). Each round's winner is a
    * bounded driver decision point (the kmeans-centroid pattern); the
    * merge itself is a codegen'd literal string replace.
    *
    * Piece state is the marker encoding `<p1><p2>...` so pair patterns
    * are unambiguous at piece boundaries and replace() cannot consume a
    * neighbor's separator. Ties in pair counts break on the joined
    * `p1|p2` string ascending (documented convention, mirrored by the
    * oracle). Output: (merge_rank, p1, p2, pair_count).
    */
  def learnBpeMerges(df: DataFrame, textCol: String, docIdCol: String,
      numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    learnInternal(df, textCol, numMerges)._1
      .toDF("merge_rank", "p1", "p2", "pair_count")
  }

  /** Trainer core shared with [[bpeSegment]]: returns the learned merges
    * and the word table AFTER all merges were applied (word, wcnt, final
    * marker string).
    */
  private def learnInternal(df: DataFrame, textCol: String, numMerges: Int):
      (Seq[(Long, String, String, Long)], DataFrame) = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    // distinct words with frequencies, each word as marker-wrapped chars
    val base = graft.Caches.register(df
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .withColumn("s", concat(lit("<"), concat_ws("><",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))), lit(">")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var words: DataFrame = base
    for (r <- 1 to numMerges) {
      val pieces = split(expr("substr(s, 2, length(s) - 2)"), "><")
      val prs = words.select(col("wcnt"),
          explode(when(size(pieces) >= 2,
            transform(sequence(lit(1), size(pieces) - 1),
              i => concat(element_at(pieces, i), lit("|"), element_at(pieces, i + 1))))
            .otherwise(array())).as("p"))
        .groupBy("p").agg(sum("wcnt").as("cnt"))
      // headOption, not head(): a corpus whose distinct adjacent pairs run
      // out before numMerges (or an empty corpus) stops the merge loop
      // cleanly at the exhausted round instead of throwing a bare
      // NoSuchElementException mid-training
      val topOpt = prs.orderBy(col("cnt").desc, col("p")).limit(1)
        .collect().headOption
      if (topOpt.isEmpty) return (merges.result(), words)
      val top = topOpt.get
      val Array(p1, p2) = top.getString(0).split('|')
      merges += ((r.toLong, p1, p2, top.getLong(1)))
      words = words.withColumn("s",
        replace(col("s"), lit(s"<$p1><$p2>"), lit(s"<$p1$p2>")))
    }
    (merges.result(), words)
  }

  /** Learn `numMerges` BPE merges, then segment the whole corpus with
    * them — the train→apply loop in one operator. Output per document:
    * (doc_id, n_words, n_pieces, fp) with fp = md5 of the space-joined
    * piece stream in document order. The apply side is the same
    * distinct-word join-back as [[subwordStats]]; the merge applications
    * are codegen'd literal replaces, no UDF anywhere.
    */
  def bpeSegment(df: DataFrame, textCol: String, docIdCol: String,
      numMerges: Int): DataFrame = {
    // each word's segmentation rides the join as ONE pre-joined string
    // plus a piece count — the doc aggregate then concatenates strings in
    // position order instead of flattening arrays (same fingerprint,
    // lighter shuffle rows, no per-doc array surgery)
    val words = learnInternal(df, textCol, numMerges)._2
      .withColumn("pieces", split(expr("substr(s, 2, length(s) - 2)"), "><"))
      .select(col("word"), array_join(col("pieces"), " ").as("ps"),
        size(col("pieces")).cast("long").as("np"))
    val tok = df.select(col(docIdCol).as("doc_id"),
        posexplode(tokens(col(textCol))))
      .toDF("doc_id", "pos", "word")
    val perDoc = tok.join(words, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("np").as("n_pieces"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("pos"), col("ps")))),
          x => x.getField("ps"))).as("body"))
    df.select(col(docIdCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        md5(coalesce(col("body"), lit(""))).as("fp"))
  }

  /** Vocabulary-coverage report: [[subwordStats]] rolled up by a grouping
    * column (language, source) — fallback rate per group is THE signal
    * for "is this vocabulary adequate for that slice of the corpus"
    * (high fallback = the tokenizer shatters that language to chars).
    */
  def subwordCoverage(df: DataFrame, textCol: String, docIdCol: String,
      groupCol: String, vocab: Seq[String]): DataFrame =
    subwordStats(df, textCol, docIdCol, vocab)
      .join(df.select(col(docIdCol).as("doc_id"), col(groupCol).as("grp")),
        Seq("doc_id"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_pieces").as("n_pieces"),
        sum("n_fallback").as("n_fallback"))
      .select(col("grp"), col("n_docs"), col("n_pieces"), col("n_fallback"),
        when(col("n_pieces") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_fallback").cast("double") / col("n_pieces"), 6))
          .as("fallback_rate"))

  /** Optimal subword segmentation as a lattice shortest path (Viterbi
    * DP) with exact integer costs: segment every distinct corpus word
    * into the FEWEST pieces, breaking ties toward the highest total
    * piece frequency — each lattice edge (j, i) costs `big − freq(w[j..i])`,
    * so minimizing the additive cost orders by piece count first (big
    * dominates any frequency sum) and by −Σfreq second. The vocabulary
    * is data-derived: the top `topV` substrings of length 2..maxPieceLen
    * by corpus occurrence weight (ties to the lexicographically smaller
    * piece) plus EVERY single character (the always-available fallback
    * tier), so concat(pieces) == word holds for every word. Unlike
    * [[segmentWord]]'s greedy longest-match (which can strand a suffix:
    * take "abcd" with vocab {a, bcd, ab}: greedy eats "ab" and shatters
    * "cd"; the DP finds a+bcd), the lattice path is globally optimal.
    *
    * Scale shape: everything after the word count runs on the DISTINCT-
    * word table (Zipf-bounded; corpus rows are touched once); the
    * lattice has ≤ maxWordLen·maxPieceLen edges per word; and the DP is
    * min-plus PATH DOUBLING — R_{k+1}(j,i) = min(R_k(j,i),
    * min_m R_k(j,m) + R_k(m,i)) — so covering maxWordLen pieces takes
    * ⌈log₂ maxWordLen⌉ self-join rounds, not maxWordLen sequential
    * relaxations; the piece-string reconstruction is pointer doubling
    * over the backpointer table (the same ⌈log₂⌉ rounds). O(log L)
    * shuffle rounds end to end — the shape that survives a cluster
    * where per-stage latency, not per-row work, dominates.
    *
    * Determinism: costs are exact integers; the backpointer at position
    * i is the SMALLEST start j achieving dp[i] (documented tie rule).
    * The oracle replays the same final dp by plain unrolled relaxation —
    * shortest-path VALUES are algorithm-independent, so doubling here
    * and linear relaxation there meet on identical numbers.
    *
    * Words longer than maxWordLen are excluded from the lattice and the
    * vocabulary weights (the far Zipf tail; a production run raises the
    * cap). `big` must exceed any piece frequency (10¹² here — raise it
    * with corpus scale; costs stay ≤ maxWordLen·big, far under Long.Max).
    *
    * @return (word, wcnt, n_pieces, pieces) for words with
    *   wcnt >= minWordCount; pieces space-joined left to right
    */
  def viterbiSegment(df: DataFrame, textCol: String,
      maxPieceLen: Int = 4, topV: Int = 200, maxWordLen: Int = 16,
      minWordCount: Long = 5L, big: Long = 1000000000000L): DataFrame = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2: $maxPieceLen")
    require(maxWordLen >= maxPieceLen, "maxWordLen must cover maxPieceLen")
    val spark = df.sparkSession
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // eager checkpoint + RDD rebuild: severs lineage AND the origin plan's
    // constraints (the clusterNearDups pattern — repeated self-joins over
    // checkpointed unions otherwise crash constraint rewriting)
    def sever(d: DataFrame): DataFrame = {
      val c = d.localCheckpoint(true)
      spark.createDataFrame(c.rdd, c.schema)
    }
    val words = graft.Caches.register(df
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .where(length(col("word")) <= maxWordLen)
      .persist(mad))
    // every (word, start, len) substring occurrence — the lattice edge
    // candidates AND the vocabulary weight rows (one table, two reads)
    val cand = graft.Caches.register(words
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("j"))
      .select(col("word"), col("wcnt"), col("j"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("j")))).as("len"))
      .select(col("word"), col("wcnt"), col("j"),
        (col("j") + col("len")).as("i"),
        expr("substring(word, j + 1, len)").as("piece"))
      .persist(mad))
    val pfreq = cand.groupBy("piece").agg(sum("wcnt").as("pfreq"))
    val vocab = pfreq.where(length(col("piece")) >= 2)
      .orderBy(col("pfreq").desc, col("piece")).limit(topV)
      .unionByName(pfreq.where(length(col("piece")) === 1))
    val edges = graft.Caches.register(cand
      .join(broadcast(vocab), Seq("piece"))
      .select(col("word"), col("j"), col("i"),
        (lit(big) - col("pfreq")).as("ecost"))
      .persist(mad))
    val rounds = math.max(1, 32 - Integer.numberOfLeadingZeros(maxWordLen - 1))
    // min-plus doubling: after round k, r holds the best cost over paths
    // of <= 2^k pieces for every reachable (word, j, i) interval
    var r = edges
    for (_ <- 1 to rounds) {
      val a = r.select(col("word"), col("j"),
        col("i").as("__m"), col("ecost").as("__c1"))
      val b = r.select(col("word"), col("j").as("__m"),
        col("i"), col("ecost").as("__c2"))
      val comp = a.join(b, Seq("word", "__m"))
        .select(col("word"), col("j"), col("i"),
          (col("__c1") + col("__c2")).as("ecost"))
      r = sever(r.unionByName(comp)
        .groupBy("word", "j", "i").agg(min("ecost").as("ecost")))
    }
    val dp = sever(r.where(col("j") === 0)
      .select(col("word"), col("i").as("pos"), col("ecost").as("cost"))
      .unionByName(words.select(col("word"),
        lit(0).as("pos"), lit(0L).as("cost"))))
    // backpointer: the smallest start j whose edge closes dp[i] exactly
    val bp = sever(edges
      .join(dp.select(col("word"), col("pos").as("j"),
        col("cost").as("__ca")), Seq("word", "j"))
      .join(dp.select(col("word"), col("pos").as("i"),
        col("cost").as("__cb")), Seq("word", "i"))
      .where(col("__ca") + col("ecost") === col("__cb"))
      .groupBy("word", "i").agg(min(col("j")).as("bj")))
    // pointer doubling: f(i) = (position 2^k backpointer hops earlier,
    // the pieces crossed, in order); the identity at 0 saturates shorter
    // paths so every position lands on dest = 0
    var f = sever(bp
      .select(col("word"), col("i"), col("bj").as("dest"),
        expr("substring(word, bj + 1, i - bj)").as("str"))
      .unionByName(words.select(col("word"), lit(0).as("i"),
        lit(0).as("dest"), lit("").as("str"))))
    for (_ <- 1 to rounds) {
      val hi = f.select(col("word"), col("i"),
        col("dest").as("__m"), col("str").as("__shi"))
      val lo = f.select(col("word"), col("i").as("__m"),
        col("dest"), col("str").as("__slo"))
      f = sever(hi.join(lo, Seq("word", "__m"))
        .select(col("word"), col("i"), col("dest"),
          when(col("__slo") === "", col("__shi"))
            .when(col("__shi") === "", col("__slo"))
            .otherwise(concat(col("__slo"), lit(" "), col("__shi")))
            .as("str")))
    }
    f.where(col("dest") === 0)
      .join(words, Seq("word"))
      .where(col("i") === length(col("word")) &&
        col("wcnt") >= minWordCount)
      .select(col("word"), col("wcnt"),
        size(split(col("str"), " ")).as("n_pieces"),
        col("str").as("pieces"))
      .orderBy("word")
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
