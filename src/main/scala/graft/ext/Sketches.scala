package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch over corpus terms — the bounded-state
  * frequency estimator (public algorithm: Cormode & Muthukrishnan 2005).
  * At 100 TB the full term-frequency table is vocabulary-sized; the
  * sketch is depth×width cells regardless of vocabulary, cells are plain
  * sums (map-side combinable, mergeable across shards/batches — the same
  * incremental-state story as `Merge.aggState`), and point estimates are
  * depth cell lookups.
  *
  * Hashing is the repo's md5 60-bit hex-slice idiom (hashingTf /
  * winnowing), seeded per row as `r:term` — no RNG, reproducible, and the
  * DuckDB oracle recomputes identical cells.
  */
object Sketches {

  import TextAnalysis.tokens

  private def bucket(r: Column, term: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(r.cast("string"), lit(":"), term)), 1, 15),
      16, 10).cast("long"), lit(width.toLong))

  /** The sketch itself: sparse (r, bucket, cnt) cells, depth rows ×
    * width buckets. One token scan, one (r, bucket) shuffle of at most
    * depth×width groups.
    */
  def countMinCells(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive: $depth, $width")
    df.select(explode(tokens(col(textCol))).as("term"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("term"))
      .select(col("r").cast("long").as("r"),
        bucket(col("r"), col("term"), width).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates vs ground truth for every corpus term: estimate =
    * min over the term's depth cells — never below the exact count (the
    * CMS one-sided error guarantee, asserted in the spec and visible in
    * the output as `overcount`).
    */
  def countMinEstimates(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    val cells = countMinCells(df, textCol, depth, width)
    val exact = df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact_count"))
    exact
      .select(col("term"), col("exact_count"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("term"), col("exact_count"), col("r").cast("long").as("r"),
        bucket(col("r"), col("term"), width).as("bucket"))
      .join(cells, Seq("r", "bucket"))
      .groupBy("term")
      .agg(min("exact_count").as("exact_count"),
        min("cnt").as("estimate"))
      .select(col("term"), col("exact_count"), col("estimate"),
        (col("estimate") - col("exact_count")).as("overcount"))
  }

  // ---- HyperLogLog (Flajolet et al. 2007) ------------------------------

  /** Registers per bucket for a deterministic HyperLogLog over corpus
    * terms — THE distinct-count sketch at 100 TB: fixed `m`-register
    * state regardless of cardinality, registers merge by max (shards,
    * batches, streams — same story as the CMS cells; max is also a valid
    * single stateful streaming aggregation).
    *
    * Derivation is integer-exact and engine-portable, no RNG, no libm:
    * the md5 60-bit hex-slice hash splits as bucket = h mod m and
    * q = h div m (m a power of two, so q is the exact 60−log2(m)-bit
    * suffix); rho = (bit width of q) − bitlen(q) + 1 counts q's leading
    * zeros via LENGTH(BIN(q)) — a string-length bit-length, identical in
    * Spark and DuckDB — with the q = 0 row taking the max rank.
    * Duplicate terms need no pre-distinct: max(rho) is idempotent.
    */
  def hllRegisters(df: DataFrame, textCol: String, m: Int = 64): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    val qBits = 60 - java.lang.Integer.numberOfTrailingZeros(m)
    df.select(explode(tokens(col(textCol))).as("term"))
      .select(conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long").as("__h"))
      .select(pmod(col("__h"), lit(m.toLong)).as("bucket"),
        expr(s"__h div ${m}L").as("__q"))
      .select(col("bucket"),
        when(col("__q") === 0L, lit(qBits + 1))
          .otherwise(lit(qBits + 1) - length(bin(col("__q"))))
          .cast("long").as("__rho"))
      .groupBy("bucket").agg(max("__rho").as("register"))
  }

  /** The HLL raw estimate next to the exact distinct count:
    * E = α_m · m² / Σ_j 2^(−M_j), empty buckets contributing 2^0.
    * The harmonic sum is EXACT: Σ 2^(56−M_j) in longs (M_j ≤ 56, so each
    * term is an exact power of two and the 64-term sum is far below
    * overflow), then one IEEE division by the plan-time constant
    * C = α_m · m² · 2^56 — bit-identical in both engines. Raw regime
    * only (no small-range linear counting — that needs ln): the corpus
    * vocabulary is far above the 2.5·m bias cutoff, and `n_exact` sits
    * beside the estimate so the error is measured, not trusted.
    */
  def hllEstimate(df: DataFrame, textCol: String, m: Int = 64): DataFrame = {
    val regs = hllRegisters(df, textCol, m)
    val alpha = 0.7213 / (1.0 + 1.079 / m) // published α_m for m >= 64
    val c = alpha * m * m * math.pow(2.0, 56) // plan-time literal (exact 2^56)
    // integer `div`, never double division: partial sums of mixed 2^k
    // terms exceed 2^53 and would round order-dependently as doubles
    val harm = regs
      .select(expr("72057594037927936L div shiftleft(1L, cast(register as int))")
        .as("__t"))
      .agg(sum("__t").as("__s"), count(lit(1)).as("__nb"))
      // empty buckets (no term hashed there) contribute 2^56 each
      .select((col("__s") + (lit(m.toLong) - col("__nb")) * lit(72057594037927936L))
        .as("__s"))
    val exact = df.select(explode(tokens(col(textCol))).as("term"))
      .agg(countDistinct("term").as("n_exact"))
    harm.crossJoin(exact)
      .select(lit(m).as("m"), col("n_exact"),
        round(lit(c) / col("__s"), 6).as("hll_estimate"),
        round(abs(lit(c) / col("__s") - col("n_exact")) / col("n_exact"), 6)
          .as("rel_error"))
  }

  /** Per-group HLL registers — one m-register sketch per `groupCol`
    * value. Registers are max-aggregates, so group sketches MERGE into
    * coarser groupings (or the global sketch) by a plain per-bucket max:
    * the incremental-state story for "distinct terms per shard/day,
    * roll up on demand" with m longs per group instead of a vocabulary-
    * sized distinct. Map-side combinable: the one exchange carries at
    * most groups×m rows.
    */
  def hllRegistersBy(df: DataFrame, groupCol: String, textCol: String,
      m: Int = 64): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    val qBits = 60 - java.lang.Integer.numberOfTrailingZeros(m)
    df.select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("term"))
      .select(col("grp"),
        conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long").as("__h"))
      .select(col("grp"), pmod(col("__h"), lit(m.toLong)).as("bucket"),
        expr(s"__h div ${m}L").as("__q"))
      .select(col("grp"), col("bucket"),
        when(col("__q") === 0L, lit(qBits + 1))
          .otherwise(lit(qBits + 1) - length(bin(col("__q"))))
          .cast("long").as("__rho"))
      .groupBy("grp", "bucket").agg(max("__rho").as("register"))
  }

  /** Per-group HLL estimates + exact per-group distinct for the error
    * column (same raw-regime estimator and exact integer harmonic sum
    * as [[hllEstimate]]).
    */
  def hllEstimateBy(df: DataFrame, groupCol: String, textCol: String,
      m: Int = 64): DataFrame = {
    val regs = hllRegistersBy(df, groupCol, textCol, m)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val c = alpha * m * m * math.pow(2.0, 56)
    val harm = regs
      .select(col("grp"),
        expr("72057594037927936L div shiftleft(1L, cast(register as int))")
          .as("__t"))
      .groupBy("grp").agg(sum("__t").as("__s"), count(lit(1)).as("__nb"))
      .select(col("grp"), (col("__s") +
        (lit(m.toLong) - col("__nb")) * lit(72057594037927936L)).as("__s"))
    val exact = df.select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("grp").agg(countDistinct("term").as("n_exact"))
    harm.join(exact, Seq("grp"))
      .select(col("grp"), col("n_exact"),
        round(lit(c) / col("__s"), 6).as("hll_estimate"),
        round(abs(lit(c) / col("__s") - col("n_exact")) / col("n_exact"), 6)
          .as("rel_error"))
  }

  /** HLL set algebra between two groups' sketches: union by per-bucket
    * register MAX (exact for HLL — the union sketch IS the sketch of the
    * union), intersection by inclusion–exclusion on the three estimates.
    * This is why the sketch wins at 100 TB: overlap between any pair of
    * shards/days/sources comes from merging m-register states — no
    * re-scan, no distinct-join of vocabularies. Exact counts ride along
    * so the error is measured, not trusted.
    *
    * Determinism: three exact integer harmonic sums (same fixed-point
    * construction as [[hllEstimate]]), then one shared double DAG
    * C/s_a + C/s_b − C/s_u mirrored verbatim in the oracle.
    */
  def hllSetOps(df: DataFrame, groupCol: String, textCol: String,
      grpA: String, grpB: String, m: Int = 64): DataFrame = {
    val regs = graft.Caches.register(hllRegistersBy(
      df.where(col(groupCol).isin(grpA, grpB)), groupCol, textCol, m))
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val c = alpha * m * m * math.pow(2.0, 56)
    // harmonic sum of one register set (empty buckets contribute 2^56)
    def harm(r: DataFrame, name: String): DataFrame = r
      .select(expr("72057594037927936L div shiftleft(1L, cast(register as int))")
        .as("__t"))
      .agg(sum("__t").as("__s"), count(lit(1)).as("__nb"))
      .select((col("__s") + (lit(m.toLong) - col("__nb")) *
        lit(72057594037927936L)).as(name))
    val sa = harm(regs.where(col("grp") === grpA), "sa")
    val sb = harm(regs.where(col("grp") === grpB), "sb")
    val su = harm(regs.groupBy("bucket").agg(max("register").as("register")), "su")
    val toks2 = df.where(col(groupCol).isin(grpA, grpB))
      .select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("term"))
      .distinct()
    val exact = toks2.groupBy("term")
      .agg(max(when(col("grp") === grpA, 1).otherwise(0)).as("ina"),
        max(when(col("grp") === grpB, 1).otherwise(0)).as("inb"))
      .agg(sum("ina").cast("long").as("exact_a"),
        sum("inb").cast("long").as("exact_b"),
        count(lit(1)).as("exact_union"),
        sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L))
          .cast("long").as("exact_intersect"))
    sa.crossJoin(sb).crossJoin(su).crossJoin(exact)
      .select(lit(m).as("m"),
        col("exact_a"), col("exact_b"), col("exact_union"),
        col("exact_intersect"),
        round(lit(c) / col("sa"), 6).as("est_a"),
        round(lit(c) / col("sb"), 6).as("est_b"),
        round(lit(c) / col("su"), 6).as("est_union"),
        round(lit(c) / col("sa") + lit(c) / col("sb") - lit(c) / col("su"), 6)
          .as("est_intersect"))
  }

  /** Bottom-k quantile sketch: a deterministic uniform sample — the k
    * rows with the SMALLEST md5 hash of their stable id — from which any
    * quantile is estimated by rank (lower interpolation, floor(q·(n−1))).
    * This is the mergeable alternative to the exact distributed-CDF
    * quantiles (`Clean.exactQuantiles`): bottom-k sets are closed under
    * union (bottom-k of a union of shards = bottom-k of the union of
    * their bottom-k sets), so per-shard/per-day sketches combine exactly,
    * and the hash-order sample is a pure function of the data — no RNG,
    * no partitioning dependence (same story as `Sampling.hashSample`,
    * upgraded from a rate to an exact-k summary).
    *
    * Scale: the sort+limit plans as TakeOrderedAndProject — every
    * partition keeps a k-item heap, ONE k-sized merge follows; nothing
    * global is sorted. Everything after operates on ≤ k rows. Standard
    * sampling theory gives rank error O(1/√k) — k=10⁴ ≈ 1 % rank error
    * at ANY corpus size; raise k, not the scan count, for tighter bands.
    *
    * @return one row per requested quantile: (q, estimate, sample_n)
    */
  def bottomKQuantiles(df: DataFrame, valueCol: String, idCol: String,
      k: Int, qs: Seq[Double]): DataFrame =
    quantilesFromBottomK(bottomKSketch(df, valueCol, idCol, k), qs)

  /** The bottom-k SUMMARY itself — (v, i, h), the k rows with the
    * smallest md5 hash — as a first-class mergeable artifact: build one
    * per shard/day, store it (k rows, kilobytes), and combine with
    * [[mergeBottomK]] instead of rescanning history. Deterministic by
    * the (h, i) total order, so shard-built and globally-built sketches
    * are bit-identical, not just statistically equivalent.
    */
  def bottomKSketch(df: DataFrame, valueCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.select(col(valueCol).cast("double").as("v"),
        col(idCol).cast("string").as("i"))
      .where(col("v").isNotNull)
      .withColumn("h",
        conv(substring(md5(col("i")), 1, 15), 16, 10).cast("long"))
      .orderBy(col("h"), col("i")).limit(k)
  }

  /** EXACT merge of bottom-k sketches (r15): bottom-k sets are closed
    * under union — the k smallest hashes of a union are among the
    * per-shard k smallest — so re-trimming the unioned summaries yields
    * the SAME sketch a global build would (ids are unique and the (h, i)
    * order is total, so this is set equality, not approximation; the
    * q_sketch_merge_shards oracle replays the global build to gate it).
    * Cost: |shards|·k rows through one TakeOrdered — history-scale
    * re-aggregation without touching history.
    */
  def mergeBottomK(sketches: Seq[DataFrame], k: Int): DataFrame = {
    require(sketches.nonEmpty && k > 0, "need sketches and k > 0")
    sketches.reduce(_ unionByName _).orderBy(col("h"), col("i")).limit(k)
  }

  /** Rank-estimate quantiles off a built/merged bottom-k summary (lower
    * interpolation, floor(q·(n−1)) — the [[bottomKQuantiles]] tail).
    * Everything runs on ≤ k rows; the unpartitioned window is bounded.
    */
  def quantilesFromBottomK(sketch: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be in [0, 1]")
    val sample = sketch
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v"), col("i"))
    val ranked = sample.withColumn("rnk", row_number().over(w))
    val targets = sample.agg(count(lit(1)).as("sample_n"))
      .select(col("sample_n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("target",
        (floor(col("q") * (col("sample_n") - 1)) + 1).cast("int"))
    targets.join(ranked, col("target") === col("rnk"))
      .select(col("q"), col("v").as("estimate"), col("sample_n"))
  }

  /** Bounded distributed top-k term frequencies — the TPUT shape (Cao &
    * Wang 2004): when counts for one word are SPLIT across shards (data
    * is partitioned by document, not by word), ship only each shard's
    * top-k partial counts and derive per-word bounds instead of the full
    * per-shard vocabulary:
    *   lb(w) = Σ reported partials;  ub(w) = lb + Σ_{shards silent on w} t_b,
    * where t_b is shard b's k-th partial count (a silent shard can hide at
    * most t_b occurrences; a shard reporting fewer than k words hides
    * nothing, t_b = 0). Any word whose true count exceeds Σ t_b is
    * guaranteed to surface as a candidate (pigeonhole over shards).
    *
    * Scale shape: the only corpus-scale job is the (bucket, word) count
    * (map-side combinable); everything after runs on ≤ buckets·k candidate
    * rows — the exchange carries top-k summaries, never shard
    * vocabularies. Shards are md5-hash buckets of the doc id so the
    * oracle replays them bit-identically.
    *
    * @return topN rows (word, lb, ub, is_exact) by (lb desc, word asc)
    */
  def boundedTopK(df: DataFrame, textCol: String, docIdCol: String,
      buckets: Int = 16, k: Int = 8, topN: Int = 20): DataFrame = {
    require(buckets > 0 && k > 0 && topN > 0,
      s"buckets/k/topN must be positive: $buckets, $k, $topN")
    val w = df.select(
      pmod(conv(substring(md5(col(docIdCol).cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(buckets.toLong)).as("bucket"),
      explode(tokens(col(textCol))).as("word"))
    val cnt = w.groupBy("bucket", "word").agg(count(lit(1)).as("c"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("c").desc, col("word").asc)
    val rep = cnt.withColumn("rn", row_number().over(win))
      .where(col("rn") <= k).drop("rn")
    val tb = rep.groupBy("bucket").agg(
      when(count(lit(1)) === k, min(col("c"))).otherwise(lit(0L)).as("t"))
    val grid = broadcast(rep.select("word").distinct()).crossJoin(broadcast(tb))
    val parts = grid.join(
      rep.select(col("bucket").as("rb"), col("word").as("rw"), col("c")),
      col("bucket") === col("rb") && col("word") === col("rw"), "left")
    parts.groupBy("word")
      .agg(sum(coalesce(col("c"), lit(0L))).as("lb"),
        sum(coalesce(col("c"), col("t"))).as("ub"))
      .select(col("word"), col("lb").cast("long").as("lb"),
        col("ub").cast("long").as("ub"))
      .withColumn("is_exact", col("lb") === col("ub"))
      .orderBy(col("lb").desc, col("word").asc).limit(topN)
  }
}
