package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality classifier — the "model-based filter" tier of the LLM
  * curation stack (the fastText-style pattern: distill a labeling rule
  * into a linear model over cheap text features, then score the whole
  * corpus with one projection). Reference has no counterpart; north-star
  * extension alongside TextAnalysis.qualityFilter.
  *
  * Features are the existing [[graft.ext.TextAnalysis.hashingTf]] buckets
  * normalized by document length, plus a bias term. Labels are the
  * heuristic quality rule itself (same thresholds as q_curation_pipeline),
  * so the model learns to mimic the hand-written filter — the classic
  * bootstrap before human labels exist.
  *
  * DETERMINISM (the whole point of this trainer): ml.LogisticRegression's
  * L-BFGS is order- and implementation-dependent, so instead training is
  * `iters` fixed steps of batch gradient descent with
  *  - the ALGEBRAIC sigmoid  σ(z) = 0.5·(1 + z/(1+|z|))  — only +,*,/,abs,
  *    all correctly-rounded IEEE ops, zero libm, so both engines compute
  *    bit-identical values;
  *  - order-invariant fixed-point sums (floor(v·1e12) / floor(v·1e9)
  *    longs) for the per-doc dot product and the per-bucket gradient, the
  *    same device as DimReduce's PCA moment pass;
  *  - weights collected to the driver each step (a bounded decision
  *    point: dim+1 doubles) and re-emitted as plan-time literals.
  * The DuckDB oracle replays the ENTIRE training loop unrolled in SQL and
  * hash-matches the final scores.
  *
  * Scale shape: the feature table is one (doc, bucket) shuffle, persisted
  * once; each GD step is one agg (dot products) + one join-agg (gradient)
  * over it — 2 bounded jobs per step, never a per-row collect. At 100 TB
  * the same loop runs with executors doing all row work; only dim+1
  * gradient cells ever reach the driver per step.
  */
object QualityModel {

  import graft.ext.TextAnalysis.{hashingTf, tokens}

  private def sigmoid(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /** 0/1 label from the heuristic quality rule (thresholds shared with
    * q_curation_pipeline / qualityFilter). Only docs with ≥1 token are
    * labeled — token-free docs have no feature rows (and fail the rule
    * trivially), so they are excluded from training AND scoring.
    */
  private def qualityLabel(textCol: String): Column = {
    val t = col(textCol)
    val tk = tokens(t)
    when(size(tk) >= 5 &&
      round((length(t) - length(regexp_replace(lower(t), "[^a-z0-9]", "")))
        .cast("double") / length(t), 6) <= 0.4 &&
      round(size(array_distinct(tk)).cast("double") / size(tk), 6) >= 0.3 &&
      round(aggregate(tk, lit(0L), (acc, x) => acc + length(x))
        .cast("double") / size(tk), 6) >= 2.0,
      lit(1.0)).otherwise(lit(0.0))
  }

  /** (doc_id, y) for every doc with ≥1 token; `label` is any 0.0/1.0
    * expression over the source row (the heuristic rule, a domain flag,
    * …) — evaluated behind the pushdown barrier alongside the token
    * guard so it can't be inlined into the scan.
    */
  private def labelTable(df: DataFrame, textCol: String, idCol: String,
      label: Column): DataFrame =
    df.select(col(idCol).as("doc_id"), label.as("__y"),
        tokens(col(textCol)).as("__tk"))
      .where(graft.ops.Plans.noPushdown(size(col("__tk")) > 0))
      .select(col("doc_id"), col("__y").as("y"))

  /** Sparse normalized feature rows (doc_id, j, x): tf buckets divided by
    * token count, plus one bias row per doc at j = dim with x = 1.
    */
  private def featureTable(df: DataFrame, textCol: String, idCol: String,
      dim: Int): DataFrame = {
    val n = df.select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("__n"))
      .where(col("__n") > 0)
    val tf = hashingTf(df, textCol, idCol, dim)
    tf.join(n, Seq("doc_id"))
      .select(col("doc_id"), col("bucket").cast("int").as("j"),
        (col("cnt").cast("double") / col("__n").cast("double")).as("x"))
      .union(n.select(col("doc_id"), lit(dim).as("j"), lit(1.0).as("x")))
  }

  /** Train + score in one call: returns (doc_id, label, score, pred) for
    * every doc with ≥1 token. `score` is σ(w·x) rounded to 6 decimals;
    * `pred` is computed from the UNROUNDED score (σ monotone ⇒ pred ⇔
    * w·x ≥ 0, identical in both engines).
    */
  def scoreQuality(df: DataFrame, textCol: String, idCol: String,
      dim: Int = 64, iters: Int = 8): DataFrame =
    trainScore(df, textCol, idCol, qualityLabel(textCol), dim, iters)

  /** Classifier two-sample test scorer: same GD trainer, but the label
    * is an arbitrary 0/1 domain flag (reference vs current batch, source
    * A vs source B). Feed the scores into [[Eval.aucExact]] — AUC ≈ 0.5
    * means the domains are indistinguishable on these features (no
    * drift); AUC near 1 means a classifier separates them easily.
    */
  def trainScore(df: DataFrame, textCol: String, idCol: String,
      label: Column, dim: Int = 64, iters: Int = 8): DataFrame = {
    require(dim > 0 && iters >= 0, s"bad dim=$dim / iters=$iters")
    // r13: fold the label ONTO the feature rows once, co-partitioned by
    // doc_id, BEFORE persisting — one cached table satisfies every
    // per-iteration requirement (the per-doc dot-product agg reads x AND
    // y from the same rows; the gradient fetch join is co-partitioned),
    // so each GD step is ONE driver-blocking job whose only exchange is
    // the 65-key gradient aggregate. The previous shape broadcast a
    // separate persisted labels table into the error join, which
    // rebuilt a broadcast exchange (an extra job) EVERY step — ~2x the
    // loop's job count for zero data reasons.
    val feat = graft.Caches.register(
      featureTable(df, textCol, idCol, dim)
        .join(labelTable(df, textCol, idCol, label), Seq("doc_id"))
        .repartition(col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // every labeled doc has exactly one bias row (j = dim) — counting
    // them counts docs, off the same cache that the loop reads
    val nDocs = feat.where(col("j") === dim).count().toDouble
    val w = Array.fill(dim + 1)(0.0)
    // The loop's plans are tiny and fixed-shape; AQE's stage-by-stage
    // materialization turns each step into ~5 driver-blocking jobs of
    // pure scheduling latency. Pin the strategy instead: AQE off for the
    // training steps only (restored after — the returned scoring plan
    // runs under the session's normal config); with y folded into the
    // co-partitioned cache each step is exactly one job.
    // CONCURRENCY CAVEAT: spark.sql.adaptive.enabled is SESSION-wide
    // runtime conf — any query planned concurrently on this same
    // SparkSession during the (short) training loop would also plan
    // without AQE. The registry/bench/verify harnesses run queries
    // sequentially on one session, which is the assumed mode; a caller
    // embedding this trainer in a multi-threaded session should wrap it
    // in `df.sparkSession.newSession()`-scoped frames instead.
    val sess = df.sparkSession
    val aqeWas = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    // weights enter each step as a broadcast 65-row TABLE, not literals:
    // the plan (and its generated code) is then byte-identical across
    // iterations, so Janino's codegen cache hits from step 2 on — with
    // literal weights every step paid a fresh ~0.4 s compile
    import sess.implicits._
    try {
      for (_ <- 0 until iters) {
        val wDf = w.toIndexedSeq.zipWithIndex
          .map { case (v, j) => (j, v) }.toDF("j", "w")
        // per-doc dot product as an order-invariant fixed-point long sum;
        // y rides the same aggregate (constant per doc — max is exact)
        val z = feat.join(broadcast(wDf), Seq("j"))
          .groupBy("doc_id").agg(
            (sum(floor(col("w") * col("x") * lit(1e12))) / lit(1e12)).as("z"),
            max(col("y")).as("y"))
        val err = z
          .select(col("doc_id"), (sigmoid(col("z")) - col("y")).as("e"))
        // per-bucket gradient cells — ≤ dim+1 rows reach the driver
        val grads = feat.join(err, Seq("doc_id"))
          .groupBy("j").agg(sum(floor(col("e") * col("x") * lit(1e9))).as("s"))
          .collect()
        grads.foreach { r =>
          val j = r.getInt(0)
          w(j) = w(j) - r.getLong(1).toDouble / 1e9 / nDocs
        }
      }
    } finally sess.conf.set("spark.sql.adaptive.enabled", aqeWas)
    val wl = typedLit(w.toIndexedSeq)
    val zf = feat.groupBy("doc_id").agg(
      (sum(floor(element_at(wl, col("j") + 1) * col("x") * lit(1e12)))
        / lit(1e12)).as("z"),
      max(col("y")).as("y"))
    zf.select(col("doc_id"), col("y").cast("int").as("label"),
        round(sigmoid(col("z")), 6).as("score"),
        when(sigmoid(col("z")) >= 0.5, 1).otherwise(0).as("pred"))
  }
}
