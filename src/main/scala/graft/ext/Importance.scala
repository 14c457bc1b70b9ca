package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling", arXiv
  * 2302.03169): score every raw-corpus document by the log-likelihood
  * ratio of a hashed bag-of-ngrams model fit on a TARGET domain vs the
  * raw corpus, then keep the highest-ratio documents. This is the
  * standard "make web data look like the target domain" curation tier
  * between heuristic filters and a learned classifier.
  *
  * Model: unigrams AND bigrams hashed into `dim` buckets (the paper's
  * hashed n-gram features; md5-prefix buckets so the oracle replays the
  * hash exactly — the q_text_hashtf device). Bucket b's log-ratio with
  * add-1 smoothing:
  *
  *   λ_b = [ln(c_t[b]+1) − ln(N_t+dim)] − [ln(c_r[b]+1) − ln(N_r+dim)]
  *
  * and a document scores  log w(x) = Σ_b n_b(x)·λ_b.
  *
  * DETERMINISM TIER: the only libm in the pipeline is the ln in λ_b.
  * The bucket tables are BOUNDED (`dim` rows) decision points: counts
  * are collected, λ_b is computed driver-side, rounded to 6 decimals
  * (mirroring SQL round(x,6): BigDecimal HALF_UP on the shortest
  * representation) and re-emitted as an EXACT fixed-point long
  * λ6_b = λ_b·1e6 — document scoring is then pure integer arithmetic
  * (order-invariant long sums), bit-identical across engines and
  * partitionings. The oracle recomputes λ_b with DuckDB's ln through the
  * IDENTICAL expression DAG; ln disagrees with Java in the last ulp for
  * ~3e-5 of integer arguments (measured over 1..2M), which flips a
  * round-6 value only within ~1e-15 of a boundary — per-bucket risk
  * ~1e-9, the same tier the rolling-mean contract accepts.
  *
  * Scale shape: two map-side-combinable gram-count aggregates (target +
  * corpus, `dim` cells each), one broadcast of the λ6 table, one
  * (doc, bucket) aggregate over the corpus — the hashingTf shuffle. No
  * all-pairs, no driver loops over corpus rows.
  */
object Importance {

  /** md5-prefix bucket of a term (same device as hashingTf's buckets). */
  private def bucket(term: Column, dim: Int): Column =
    pmod(conv(substring(md5(term), 1, 15), 16, 10).cast("long"), lit(dim.toLong))

  /** (key..., bucket) — one row per unigram and per bigram occurrence. */
  private def gramBuckets(df: DataFrame, textCol: String, keep: Seq[Column],
      dim: Int): DataFrame = {
    val tk = df.select(keep :+ TextAnalysis.tokens(col(textCol)).as("__tk"): _*)
    val uni = tk.select(keep :+ explode(col("__tk")).as("__g"): _*)
    val bi = tk.where(graft.ops.Plans.noPushdown(size(col("__tk")) >= 2))
      .select(keep :+ explode(TextAnalysis.ngramsRaw(col("__tk"), 2)).as("__g"): _*)
    uni.union(bi).select(keep :+ bucket(col("__g"), dim).as("bucket"): _*)
  }

  /** round(x, 6)·1e6 as an EXACT long: HALF_UP over the shortest decimal
    * representation (the repo-wide rounding contract), scaled in decimal
    * arithmetic so no float multiply can slip an ulp. The oracle's
    * `CAST(round(x,6)*1000000 AS BIGINT)` lands on the same integer:
    * DuckDB's cast rounds to nearest, absorbing the float-multiply ulp.
    */
  private def micro6(x: Double): Long =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(6).longValueExact()

  /** Per-document DSIR log-importance weights.
    *
    * @param corpus the raw corpus to score
    * @param target documents defining the target domain (same text
    *               semantics; typically a small curated set)
    * @return (doc_id, n_grams, log_w) — log_w rounded to 6 decimals;
    *         docs with zero grams score 0.0 with n_grams = 0
    */
  def dsirWeights(corpus: DataFrame, textCol: String, idCol: String,
      target: DataFrame, targetTextCol: String, dim: Int = 256): DataFrame = {
    require(dim > 0, s"dim must be positive: $dim")
    val cg = gramBuckets(corpus, textCol, Seq(col(idCol).as("doc_id")), dim)
    val tg = gramBuckets(target, targetTextCol, Nil, dim)
    // bounded decision points: dim cells per side
    val rawCounts = cg.groupBy("bucket").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tgtCounts = tg.groupBy("bucket").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nR = rawCounts.values.sum.toDouble
    val nT = tgtCounts.values.sum.toDouble
    val lam6: Seq[(Long, Long)] = (0 until dim).map { b =>
      val ct = tgtCounts.getOrElse(b.toLong, 0L).toDouble
      val cr = rawCounts.getOrElse(b.toLong, 0L).toDouble
      val lam = (math.log(ct + 1.0) - math.log(nT + dim)) -
        (math.log(cr + 1.0) - math.log(nR + dim))
      (b.toLong, micro6(lam))
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val lamDf = lam6.toDF("bucket", "lam6")
    val perDocBucket = cg.groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
    val scored = perDocBucket.join(broadcast(lamDf), Seq("bucket"))
      .groupBy("doc_id").agg(
        sum(col("n")).as("n_grams"),
        sum(col("n") * col("lam6")).as("__s6"))
      .select(col("doc_id"), col("n_grams"),
        round(col("__s6").cast("double") / 1e6, 6).as("log_w"))
    corpus.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("log_w"), lit(0.0)).as("log_w"))
  }

  /** Deterministic top-k selection by DSIR weight (the paper's
    * importance-resampling step, taken at temperature→0: highest
    * log-ratio first, doc_id tie-break). Returns the kept documents'
    * (doc_id, log_w).
    */
  def dsirSelect(corpus: DataFrame, textCol: String, idCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      dim: Int = 256): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    dsirWeights(corpus, textCol, idCol, target, targetTextCol, dim)
      .orderBy(col("log_w").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("log_w"))
  }
}
