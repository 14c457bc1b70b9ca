package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication — the "dedup duplicated SPANS, not whole
  * documents" operator of LLM-corpus curation (public method: Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better", which
  * removes every substring of >= N tokens that occurs verbatim more than
  * once in the corpus). No reference counterpart (north-star extension);
  * built on the same tokenizer as [[TextAnalysis.tokens]] so detect /
  * remove / oracle all agree on token identity.
  *
  * Method (sliding k-token grams instead of a suffix array — the
  * shuffle-friendly formulation of the same predicate): a token span is
  * duplicated iff every k-gram inside it is duplicated; maximal duplicated
  * spans are exactly the maximal runs of consecutive duplicated gram start
  * positions p..q, covering tokens p .. q+k-1.
  *
  * Scale shape (100 TB): the gram table is ~tokens-per-corpus rows of
  * (doc_id, pos, hash64) — grams ride the document-frequency shuffle as
  * 64-bit hashes, never as strings. The duplicated-gram set (df >= 2) is
  * the genuinely small side of the join back (AQE broadcasts it when it
  * fits); islands-merge is one doc-keyed window over only the duplicated
  * positions. No all-pairs anything, no driver materialization.
  */
object SubstringDedup {

  import TextAnalysis.tokens

  /** One row per row of `df`: (doc_id, __tk) with short docs kept (they
    * simply produce no grams).
    */
  private def tokenized(df: DataFrame, textCol: String, docIdCol: String) =
    df.select(col(docIdCol).as("doc_id"), tokens(col(textCol)).as("__tk"))

  /** Content-defined chunking (the rsync/LBFS device — Muthitacharoen et
    * al. 2001 — applied to token streams): a chunk boundary falls AFTER
    * token position p whenever the hash of the `window`-token gram ending
    * at p is ≡ 0 mod `divisor`. Because boundaries depend only on LOCAL
    * content, an insertion early in a document shifts at most one chunk —
    * every later chunk re-aligns and fingerprints identically, which is
    * what makes chunk-level dedup robust to edits (fixed-width chunking
    * would shift every subsequent chunk). Expected chunk length ≈
    * `divisor` tokens.
    *
    * Hashing is the md5 60-bit hex-slice idiom so the boundary decision
    * replays in the oracle. Scale shape: one token explode, one windowed
    * gram concat + running boundary count (both inside the single
    * doc-keyed sort), one (doc, chunk) aggregate — all map-side friendly,
    * nothing global.
    *
    * @return (doc_id, chunk_idx, start_pos, n_tokens, chunk_fp)
    */
  def contentDefinedChunks(df: DataFrame, textCol: String, docIdCol: String,
      window: Int = 4, divisor: Int = 8): DataFrame = {
    require(window >= 1 && divisor >= 1, "window and divisor must be >= 1")
    val tk = tokenized(df, textCol, docIdCol)
      .where(size(col("__tk")) >= 1)
      .select(col("doc_id"), posexplode(col("__tk")).as(Seq("pos", "tok")))
    val wOrd = Window.partitionBy("doc_id").orderBy("pos")
    val gram = concat_ws(" ",
      collect_list(col("tok")).over(wOrd.rowsBetween(-(window - 1), 0)))
    val bnd = when(col("pos") >= window - 1 &&
        pmod(conv(substring(md5(gram), 1, 15), 16, 10).cast("long"),
          lit(divisor.toLong)) === 0, 1L).otherwise(0L)
    tk.withColumn("__b", bnd)
      .withColumn("chunk_idx", coalesce(
        sum(col("__b")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .groupBy("doc_id", "chunk_idx")
      .agg(min(col("pos")).cast("long").as("start_pos"),
        count(lit(1)).as("n_tokens"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")))).as("chunk_fp"))
  }

  /** (doc_id, pos, h): xxhash64 of each k-token gram, pos 0-based. */
  private def gramTable(tk: DataFrame, k: Int): DataFrame =
    tk.where(graft.ops.Plans.noPushdown(size(col("__tk")) >= k))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("__tk")) - k),
          i => xxhash64(concat_ws(" ", slice(col("__tk"), i + 1, lit(k)))))))
      .toDF("doc_id", "pos", "h")

  /** Gram start positions whose gram occurs in >= minDocFreq distinct
    * documents. distinct (doc, h) first so the document-frequency
    * aggregate stays a plain map-side-combinable count.
    */
  private def dupPositions(grams0: DataFrame, minDocFreq: Long): DataFrame = {
    // the gram table feeds the document-frequency branch AND the join
    // back; the gram-hash lambda is an interpreted HOF, so pin the table
    // rather than evaluate it twice (operator convention; released via
    // graft.Caches)
    val grams = graft.Caches.register(
      grams0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val viral = grams.select("doc_id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("__ndocs"))
      .where(col("__ndocs") >= minDocFreq)
      .select("h")
    grams.join(viral, Seq("h")).select("doc_id", "pos")
  }

  /** Detection: maximal cross-document duplicated token spans.
    *
    * Output: (doc_id, start_tok, end_tok, span_tokens, n_grams) — token
    * positions 0-based inclusive; `n_grams` = duplicated gram starts
    * merged into the span. A span means tokens start_tok..end_tok of this
    * document appear verbatim (k-gram-wise) in >= `minDocFreq` documents.
    */
  def duplicateSpans(df: DataFrame, textCol: String, docIdCol: String,
      gramTokens: Int = 10, minDocFreq: Long = 2): DataFrame = {
    require(gramTokens > 0, s"gramTokens must be positive: $gramTokens")
    require(minDocFreq >= 2, s"minDocFreq must be >= 2: $minDocFreq")
    val dup = dupPositions(
      gramTable(tokenized(df, textCol, docIdCol), gramTokens), minDocFreq)
    // islands: consecutive duplicated positions share (pos - row_number)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    dup.withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy("doc_id", "__grp")
      .agg(min("pos").cast("long").as("start_tok"),
        (max("pos") + gramTokens - 1).cast("long").as("end_tok"),
        (max("pos") - min("pos") + gramTokens).cast("long").as("span_tokens"),
        count(lit(1)).as("n_grams"))
      .drop("__grp")
  }

  /** The APPLY step: drop every token covered by a duplicated span and
    * reassemble each document from its surviving tokens in order.
    *
    * Output: (doc_id, n_tokens, removed_tokens, text_clean) for EVERY
    * input document (docs with no duplicated span — or too short to carry
    * a gram — keep their full tokenized text). text_clean is the
    * space-joined surviving tokens, i.e. the same normalization the
    * tokenizer applies.
    *
    * Scale: covered positions explode from the (small) span table, so the
    * anti-join's right side is |duplicated tokens|, not |corpus|; the
    * reassembly aggregate is doc-keyed with a buffer bounded by document
    * size (the same bound any per-document operator carries).
    */
  def removeDuplicateSpans(df: DataFrame, textCol: String, docIdCol: String,
      gramTokens: Int = 10, minDocFreq: Long = 2): DataFrame = {
    // base feeds gram generation AND token rows AND the final per-doc
    // frame — pin it so the regex tokenizer runs once (operator
    // convention; released via graft.Caches)
    val base = graft.Caches.register(tokenized(df, textCol, docIdCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val spans = {
      val dup = dupPositions(gramTable(base, gramTokens), minDocFreq)
      val w = Window.partitionBy("doc_id").orderBy("pos")
      dup.withColumn("__grp", col("pos") - row_number().over(w))
        .groupBy("doc_id", "__grp")
        .agg(min("pos").as("__s"), (max("pos") + gramTokens - 1).as("__e"))
    }
    // island coverage windows can overlap (two islands < gramTokens
    // apart) — the anti-join collapses duplicate covered positions
    val covered = spans.select(col("doc_id"),
      explode(sequence(col("__s"), col("__e"))).as("pos"))
    val toks = base.select(col("doc_id"), posexplode(col("__tk")))
      .toDF("doc_id", "pos", "tok")
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__nkept"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("__body"))
    base.select(col("doc_id"), size(col("__tk")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__nkept"), lit(0L))).cast("long")
          .as("removed_tokens"),
        coalesce(col("__body"), lit("")).as("text_clean"))
  }
}
