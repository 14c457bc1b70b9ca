package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse (lexical) retrieval over a document corpus: inverted-index
  * postings and BM25 ranking. North-star extension (no reference
  * counterpart) — the keyword-search complement to the dense
  * embedding stack in [[Similarity]]; formulas are the public
  * Robertson/Sparck-Jones BM25 as used by Lucene.
  *
  * Shares [[TextAnalysis.tokens]] so term identity agrees with the rest of
  * the text stack (and with the DuckDB oracle).
  */
object Retrieval {

  import TextAnalysis.tokens

  /** Indexed case-insensitive SUBSTRING search: every document whose
    * text contains `query`, with the 1-based first match position — the
    * arbitrary-substring complement to token-based retrieval (a query
    * like "tion proc" crosses token boundaries and no inverted index
    * can serve it).
    *
    * Plan: a character-k-gram hash PRE-FILTER (the winnowing gram — the
    * same 60-bit md5-prefix hash, computed post-explode so it codegens)
    * keeps only documents containing EVERY distinct k-gram of the query
    * — a necessary condition for containment — and the survivors are
    * verified with an exact `instr`. The query's gram hashes are
    * plan-time literals (computed driver-side with the identical md5
    * construction), so the pre-filter is one codegen'd `isin` over the
    * exploded gram stream + one doc-keyed aggregate; the corpus is
    * never string-searched outside the (tiny) candidate set. At 100 TB
    * the gram→doc index is the thing you precompute and bucket by hash;
    * the shape here — explode, filter against literals, aggregate,
    * semi-join — is exactly the probe that index serves. Queries
    * shorter than `k` fall back to the direct scan (documented: the
    * pre-filter needs at least one full gram).
    */
  def substringSearch(df: DataFrame, textCol: String, idCol: String,
      query: String, k: Int = 8): DataFrame = {
    require(query.nonEmpty, "query must be non-empty")
    val q = query.toLowerCase(java.util.Locale.ROOT)
    val verified = df
      .select(col(idCol), instr(lower(col(textCol)), q).as("pos"))
      .where(col("pos") > 0)
    if (q.length < k) return verified
    val md = java.security.MessageDigest.getInstance("MD5")
    def gramHash(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val qHashes = (0 to q.length - k).map(i => gramHash(q.substring(i, i + k)))
      .distinct
    val cand = df
      .select(col(idCol), lower(col(textCol)).as("__t"))
      .where(length(col("__t")) >= k)
      .select(col(idCol), col("__t"),
        explode(sequence(lit(1), length(col("__t")) - (k - 1))).as("__i"))
      .select(col(idCol),
        expr(s"CAST(conv(substring(md5(substring(__t, __i, $k)), 1, 15), 16, 10) AS BIGINT)")
          .as("__h"))
      .where(col("__h").isin(qHashes: _*))
      .groupBy(idCol).agg(countDistinct(col("__h")).as("__n"))
      .where(col("__n") === qHashes.length)
      .select(col(idCol))
    df.join(cand, Seq(idCol), "left_semi")
      .select(col(idCol), instr(lower(col(textCol)), q).as("pos"))
      .where(col("pos") > 0)
  }

  /** Inverted-index posting lists: one row per term with document
    * frequency, total occurrences, and the first `maxPostings` doc ids
    * (ascending). `minDocFreq` prunes hapax terms before the sort.
    *
    * Scale shape: one (term, doc_id) shuffle with map-side partial
    * counts; the postings window and the final term aggregate share that
    * hash distribution, so no second exchange. The collect_list buffer is
    * bounded by `maxPostings` — rows past the cap contribute to the
    * counts but are nulled before collection, so a hub term ("the", df in
    * the billions at 100 TB) costs a bounded buffer, not an OOM.
    */
  def invertedIndex(df: DataFrame, textCol: String, docIdCol: String,
      maxPostings: Int = 20, minDocFreq: Long = 2): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive: $maxPostings")
    val td = df
      .select(col(docIdCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy("term").orderBy("doc_id")
    td.withColumn("__rn", row_number().over(w))
      .groupBy("term")
      .agg(count(lit(1)).as("doc_freq"),
        sum("__cnt").as("occurrences"),
        sort_array(collect_list(
          when(col("__rn") <= maxPostings, col("doc_id")))).as("postings"))
      .where(col("doc_freq") >= minDocFreq)
  }

  /** BM25 top-k: score every document against a bag of query terms and
    * keep the best `k`.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (Lucene's non-negative
    * variant).
    *
    * Scale shape: tokens are filtered to the query bag BEFORE the
    * (doc, term) aggregate, so the shuffle carries only matching terms —
    * a handful of rows per document, not the corpus vocabulary. Corpus
    * stats (N, avgdl) are a 1-row aggregate cross-joined in (broadcast);
    * per-term document frequencies are a |query|-row table (broadcast).
    * The final top-k is a TakeOrderedAndProject, never a full sort.
    */
  def bm25TopK(df: DataFrame, textCol: String, docIdCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive: $k")
    val q = queryTerms.map(_.toLowerCase).distinct
    // docs feeds lengths AND term matches — cheap narrow projections of
    // one scan; the length frame is tiny (doc_id, dl)
    val docs = df.select(col(docIdCol).as("doc_id"), tokens(col(textCol)).as("__tk"))
    val lens = docs.select(col("doc_id"), size(col("__tk")).cast("long").as("dl"))
    val corpus = lens.agg(count(lit(1)).as("n_docs"),
      sum("dl").cast("double").as("sum_dl"))
    val tf = docs.select(col("doc_id"),
        explode(filter(col("__tk"), t => t.isInCollection(q))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__norm",
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / (col("sum_dl") / col("n_docs"))))
      .withColumn("__s",
        col("__idf") * col("tf") * lit(k1 + 1.0) / (col("tf") + col("__norm")))
      // the per-doc score folds left-to-right over the term-sorted list —
      // order-defined double addition, so an external oracle replaying the
      // same fold gets the bit-identical sum (the tokenEntropy idiom); the
      // buffer is bounded by |queryTerms|
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("term"), col("__s")))).as("__l"),
        count(lit(1)).as("matched_terms"))
      .withColumn("__score",
        aggregate(col("__l"), lit(0.0), (a, x) => a + x.getField("__s")))
    scored
      .select(col("doc_id"), round(col("__score"), 6).as("score"),
        col("matched_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Windowed inverted-index term statistics, batch/streaming-agnostic:
    * per (event-time window, term) document frequency and total
    * occurrences. On a streaming input a watermark is applied, so this
    * runs as ONE stateful aggregation in update (or append/complete)
    * mode with state evicted as event time advances — the streaming
    * flavor of [[invertedIndex]]'s stats half (posting lists stay a
    * batch product; an unbounded per-term id list has no place in
    * streaming state).
    *
    * The trick that keeps it to a single stateful operator: doc_freq
    * normally needs count(DISTINCT doc_id) — a second aggregation level,
    * which Structured Streaming disallows. But each document arrives as
    * ONE row, so per-doc term counts are computed statelessly INSIDE the
    * row (array expressions over the token array) and the only stateful
    * step is the final (window, term) aggregate: doc_freq = count of
    * contributing rows, occurrences = sum of in-row counts.
    *
    * Scale shape: the in-row distinct+count is O(len²) interpreted
    * per document (Spark has no codegen'd array histogram) — pure
    * scan-local CPU that parallelizes perfectly and adds no shuffle; the
    * stateful agg's state is |active windows| × |vocabulary| (Zipf-
    * bounded), the exact-stats complement to [[Sketches]]' fixed-size CMS.
    */
  def termStatsWindowed(df: DataFrame, textCol: String, docIdCol: String,
      tsCol: String, windowDuration: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    wm.select(col(tsCol).as("__ts"), col(docIdCol).as("doc_id"),
        tokens(col(textCol)).as("__tk"))
      .select(col("__ts"),
        explode(transform(array_distinct(col("__tk")),
          t => struct(t.as("term"),
            size(filter(col("__tk"), x => x === t)).cast("long").as("cnt"))))
          .as("__tc"))
      .select(col("__ts"), col("__tc.term").as("term"), col("__tc.cnt").as("cnt"))
      .groupBy(window(col("__ts"), windowDuration).as("__w"), col("term"))
      .agg(count(lit(1)).as("doc_freq"), sum("cnt").as("occurrences"))
      .select(col("__w").getField("start").as("window_start"), col("term"),
        col("doc_freq"), col("occurrences"))
  }

  /** 1-based rank column over an already-top-k result list. The window
    * is unpartitioned BY DESIGN: the input is a bounded top-k list (≤ k
    * rows), never a corpus-scale frame — same bounded-window contract as
    * the bottom-k sketch's rank pick.
    */
  def withRank(list: DataFrame,
      order: Seq[org.apache.spark.sql.Column]): DataFrame =
    list.withColumn("rank", row_number().over(Window.orderBy(order: _*)))

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    * several top-k lists — the standard hybrid-search combiner for
    * lexical (BM25) + dense (embedding cosine) retrieval:
    * score(d) = Σ_lists 1/(c + rank_list(d)). Rank-based, so the two
    * engines' incomparable score scales never mix; c=60 is the published
    * default.
    *
    * Scale shape: inputs are already-reduced top-k lists (each the
    * result of its own distributed ranking), so fusion runs on ≤ Σk
    * rows — union, one tiny aggregate, TakeOrdered. The per-doc sum
    * folds in list-index order over a collect_list bounded by the
    * number of lists (the bm25TopK idiom), keeping the double sum
    * order-defined for the oracle.
    *
    * @param rankings frames each carrying `idCol` and a 1-based `rank`
    *                 (see [[withRank]])
    * @return (id, rrf_score, n_lists) top-k by (rrf_score desc, id)
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
      c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rankings must be non-empty")
    require(k > 0 && c >= 0, s"bad k/c: $k, $c")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol).as("id"), col("rank").cast("long").as("rank"),
        lit(i).as("__list"))
    }.reduce(_ unionByName _)
    tagged
      .withColumn("__contrib",
        lit(1.0) / (lit(c.toDouble) + col("rank").cast("double")))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("__list"), col("__contrib"))))
          .as("__l"),
        count(lit(1)).as("n_lists"))
      .withColumn("rrf_score",
        round(aggregate(col("__l"), lit(0.0),
          (a, x) => a + x.getField("__contrib")), 6))
      .select(col("id"), col("rrf_score"), col("n_lists"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(k)
  }

  /** BATCHED BM25 top-k — one ranking per row of a QUERY TABLE, the
    * production serving shape ([[bm25TopK]] is the single-query case):
    * score(q, d) over every (query, matching doc) pair, keep each
    * query's best `k`.
    *
    * Scale shape: the query batch is judgment-sized and BROADCASTS as a
    * (qid, term) table; corpus tokens are filtered against the UNION of
    * all batch terms BEFORE the (doc, term) aggregate, so the one
    * corpus-sized shuffle carries only matching terms — per-term df and
    * corpus stats are computed once for the whole batch, not per query.
    * Per-query ranking is a (qid)-keyed window over the scored pairs
    * (bounded by matches, not the corpus); the per-doc score folds
    * left-to-right over the term-sorted list (the [[bm25TopK]] idiom) so
    * replays sum bit-identically.
    *
    * @param queries (qidCol, termsCol array<string>) — the batch
    * @return (qid, rank 1-based, doc_id, score round-6, matched_terms)
    */
  def bm25TopKBatch(df: DataFrame, textCol: String, docIdCol: String,
      queries: DataFrame, qidCol: String, termsCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val qt = queries.select(col(qidCol).as("qid"),
        explode(array_distinct(transform(col(termsCol),
          t => lower(t)))).as("term"))
    val docs = df.select(col(docIdCol).as("doc_id"),
      tokens(col(textCol)).as("__tk"))
    val lens = docs.select(col("doc_id"), size(col("__tk")).cast("long").as("dl"))
    val corpus = lens.agg(count(lit(1)).as("n_docs"),
      sum("dl").cast("double").as("sum_dl"))
    // the union bag of ALL batch terms — a broadcast semi-join filter, so
    // the corpus-side explode only emits terms some query asked for
    val bag = qt.select("term").distinct()
    val tf = docs.select(col("doc_id"), explode(col("__tk")).as("term"))
      .join(broadcast(bag), Seq("term"), "left_semi")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val scored = tf
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__norm",
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / (col("sum_dl") / col("n_docs"))))
      .withColumn("__s",
        col("__idf") * col("tf") * lit(k1 + 1.0) / (col("tf") + col("__norm")))
      .groupBy("qid", "doc_id")
      .agg(sort_array(collect_list(struct(col("term"), col("__s")))).as("__l"),
        count(lit(1)).as("matched_terms"))
      .withColumn("score",
        round(aggregate(col("__l"), lit(0.0), (a, x) => a + x.getField("__s")), 6))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"),
        col("matched_terms"))
  }

  /** Fixed-point 1e9 NDCG discount for 1-based rank i: ⌊1e9 / log₂(i+1)⌋.
    * Computed driver-side so engine and oracle share IDENTICAL integer
    * literals — log never executes inside either query.
    */
  def ndcgDiscount(rank: Int): Long = {
    require(rank >= 1, s"rank must be >= 1: $rank")
    math.floor(1e9 / (math.log(rank + 1.0) / math.log(2.0))).toLong
  }

  /** Ranking-quality metrics — NDCG@k (exponential gains, standard
    * Järvelin–Kekäläinen form) and MRR@k — for ONE ranked list against a
    * graded relevance table: the eval tier of the retrieval stack (what
    * AUC/confusion are to the classifier stack). A retrieval change at
    * corpus scale ships on these numbers, not on eyeballing top-10.
    *
    * Determinism: per-rank discounts ⌊1e9/log₂(i+1)⌋ are plan-time
    * integer literals ([[ndcgDiscount]]); DCG and IDCG are exact integer
    * sums of gain·discount (gain = 2^rel − 1 ≤ bounded by the rel
    * scale), so aggregation order cannot drift — only the final
    * ndcg/mrr divisions run in double, one shared DAG. IDCG ranks the
    * FULL relevance table by (rel desc, id asc) — the standard ideal —
    * through one row_number window over qrels (judgment-scale, not
    * corpus-scale). MRR uses the best (smallest) rank among rel > 0
    * docs in the top-k.
    *
    * Scale shape: everything after the two inputs is bounded by k and
    * |qrels| — the ranked list is top-k by construction and qrels are
    * judgment-sized; nothing corpus-scale is touched here.
    *
    * @param ranked (idCol, rankCol 1-based) — a top-k list
    * @param rels   (idCol, relCol integer grades >= 0) — the qrels;
    *               ids absent from it count as rel 0
    * @return one row per k in `ks`: (k, n_rel_topk, dcg, idcg, ndcg, mrr)
    */
  def rankingMetrics(ranked: DataFrame, idCol: String, rankCol: String,
      rels: DataFrame, relCol: String, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1: $ks")
    val maxK = ks.max
    val disc = typedLit((1 to maxK).map(ndcgDiscount))
    // 2^rel − 1 in exact longs; shiftleft's bits arg must be a column, so
    // spell it in SQL (both frames carry the grade as a column named rel)
    val gainOfRel =
      expr("shiftleft(cast(1 as bigint), cast(rel as int)) - cast(1 as bigint)")
    val r = ranked.select(col(idCol).as("id"),
        col(rankCol).cast("int").as("rank"))
      .where(col("rank") <= maxK)
      .join(rels.select(col(idCol).as("id"),
        col(relCol).cast("long").as("rel")), Seq("id"), "left")
      .select(col("rank"), coalesce(col("rel"), lit(0L)).as("rel"))
    val ideal = rels.select(col(relCol).cast("long").as("rel"),
        col(idCol).as("id"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rel").desc, col("id"))))
      .where(col("rank") <= maxK)
    ks.sorted.map { k =>
      val dcg9 = r.where(col("rank") <= k)
        .agg(coalesce(sum(gainOfRel *
            element_at(disc, col("rank"))), lit(0L)).as("__dcg9"),
          coalesce(sum(when(col("rel") > 0, 1L).otherwise(0L)), lit(0L))
            .as("n_rel_topk"),
          min(when(col("rel") > 0, col("rank"))).as("__first"))
      val idcg9 = ideal.where(col("rank") <= k)
        .agg(coalesce(sum(gainOfRel *
          element_at(disc, col("rank"))), lit(0L)).as("__idcg9"))
      dcg9.crossJoin(broadcast(idcg9))
        .select(lit(k).as("k"), col("n_rel_topk"),
          round(col("__dcg9").cast("double") / 1e9, 6).as("dcg"),
          round(col("__idcg9").cast("double") / 1e9, 6).as("idcg"),
          round(when(col("__idcg9") > 0L,
            col("__dcg9").cast("double") / col("__idcg9").cast("double")),
            6).as("ndcg"),
          round(when(col("__first").isNotNull,
            lit(1.0) / col("__first").cast("double")), 6).as("mrr"))
    }.reduce(_ unionByName _)
  }
}
