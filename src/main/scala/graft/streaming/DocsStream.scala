package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming flavor of the document-dedup stack: new documents arrive as
  * a stream and are checked against a STATIC already-curated corpus —
  * the production ingest shape (the batch equivalent is
  * [[graft.ext.Dedup.incrementalDedup]]'s probe side).
  *
  * Everything on the stream side is STATELESS row-local projection
  * (tokenize → shingle → minhash → band explode), so the pipeline runs
  * in append mode with no state store and no watermark requirement; the
  * corpus side enters as two static frames (band index + shingle sets)
  * that Spark broadcasts or shuffle-joins per micro-batch exactly like
  * any stream-static join. At 100 TB the corpus band index is the thing
  * you keep partitioned by (band_idx, band_key) on disk; each arriving
  * micro-batch probes only the buckets its documents hash into — never
  * an all-pairs comparison.
  */
object DocsStream {

  /** Static corpus index for [[nearDupMatches]]: (bands, shingles).
    * Build once, reuse across micro-batches (persist both in a long-
    * running job). Parameters must match the stream side's.
    */
  def corpusIndex(corpus: DataFrame, textCol: String, idCol: String,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4): (DataFrame, DataFrame) = {
    val sh = graft.ext.Dedup.shingleTable(corpus, textCol, idCol, k)
    (graft.ext.Dedup.bandTable(sh, numHashes, bands), sh)
  }

  /** Near-duplicate MATCH stream: for each arriving document, the corpus
    * documents sharing an LSH band bucket, exact-Jaccard-verified.
    * Returns (id, corpus_id, jaccard) in append mode — rows for docs
    * with no match never appear (feed the output to an anti-join sink to
    * implement "drop matched arrivals", mirroring incrementalDedup's
    * corpus-drop step).
    *
    * STATELESS contract: a pair matching in several of the `bands`
    * buckets emits up to `bands` identical rows (same jaccard — the
    * value is a pure function of the pair). Collapsing them in-stream
    * would need a stateful distinct (unbounded pair state on an
    * unbounded stream); the right place is the micro-batch sink — a
    * batch-local `.distinct()` inside foreachBatch — or, for a batch
    * frame, here: when `docs` is not streaming the candidate set IS
    * distinct-ed before verification.
    *
    * `docs` may be a streaming OR batch frame — the plan is otherwise
    * identical (the batch ≡ stream equivalence test rests on this).
    */
  def nearDupMatches(docs: DataFrame, textCol: String, idCol: String,
      corpusBands: DataFrame, corpusShingles: DataFrame,
      k: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"bad threshold $threshold")
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val sh = graft.ext.Dedup.shingleTable(docs, textCol, idCol, k)
    // the stream side carries its shingle set THROUGH the band explode in
    // ONE linear projection chain — joining the band table back to the
    // shingle table would be a streaming SELF-join, which Spark plans as
    // a stateful symmetricHashJoin (unbounded state); with sh riding
    // along, the only joins below are stream-static against the corpus
    // frames (the stateless-plan spec pins this)
    val rows = numHashes / bands
    val sig = sh.select(col("id"), col("sh"),
      graft.ext.Dedup.minhashSignatureFromHashes(
        graft.ext.Dedup.shingleHashes(col("sh")), numHashes).as("__sig"))
    val banded = sig.select(col("id"), col("sh"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band_idx"),
            md5(concat_ws("|", slice(col("__sig"), b * rows + lit(1), lit(rows))
              .cast("array<string>"))).as("band_key")))).as("band"))
      .select(col("id"), col("sh"), col("band.band_idx"), col("band.band_key"))
    val cand = banded
      .join(corpusBands.select(col("band_idx"), col("band_key"),
        col("id").as("corpus_id")), Seq("band_idx", "band_key"))
      .select(col("id"), col("corpus_id"), col("sh"))
    val cand1 = if (docs.isStreaming) cand else cand.distinct()
    cand1
      .join(corpusShingles.select(col("id").as("corpus_id"),
        col("sh").as("__csh")), Seq("corpus_id"))
      .withColumn("jaccard",
        round(size(array_intersect(col("sh"), col("__csh"))).cast("double")
          / size(array_union(col("sh"), col("__csh"))), 6))
      .where(col("jaccard") >= threshold)
      .select(col("id"), col("corpus_id"), col("jaccard"))
  }

  /** Streaming corpus term OCCURRENCE counts — the retrieval stack's
    * term statistics (graft.ext.Retrieval) maintained incrementally as
    * documents arrive: one stateful aggregation whose state is
    * vocabulary-sized (Zipf-bounded), emitted in update/complete mode.
    * Works identically on a batch frame (the equivalence test's basis).
    */
  def termOccurrences(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.ext.TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("occurrences"))

  /** Streaming DOCUMENT FREQUENCY (the BM25 idf input): distinct-doc
    * counts via the dedup-then-count pattern — a streaming `count
    * (DISTINCT)` is not supported, so dropDuplicates carries the
    * (term, doc) pairs as dedup state and a plain count follows. State
    * is bounded by distinct (term, doc) pairs; a long-running ingest
    * would add an ingest-time watermark column before the dropDuplicates
    * to age that state out (same contract as streamingDedup).
    */
  def termDocFreq(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(graft.ext.TextAnalysis.tokens(col(textCol))).as("term"))
      .dropDuplicates("term", "doc_id")
      .groupBy("term").agg(count(lit(1)).as("doc_freq"))
}
