package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality checks — the validation pass an integration pipeline runs
  * before (and after) harmonize/union, surfacing what the reference's
  * silent null-filling concat (`DIH.py:23`) would hide.
  *
  * Scale shape: every check is an aggregate (or anti-join + aggregate)
  * producing a handful of rows; nothing collects data to the driver.
  */
object Quality {

  /** One FK edge to validate: fact.fkCol should resolve in dim.pkCol. */
  case class FkEdge(name: String, fact: DataFrame, fkCol: String,
      dim: DataFrame, pkCol: String)

  /** Referential-integrity report: per edge, how many fact rows have a
    * non-null foreign key with no match in the dimension (SQL NOT EXISTS
    * semantics: a NULL fk never matches but is not an orphan).
    *
    * Each edge is a LEFT ANTI join — at scale the dim side broadcasts
    * when small, otherwise a shuffled hash join keyed on the fk; the
    * output is one row per edge, so the union is plan-level only.
    */
  /** Per-partition data FRESHNESS report — the ingestion-SLO readout a
    * 100 TB feed is monitored by: for every key (source, feed,
    * event type), the row count, the lag of its newest record behind
    * the corpus-wide newest (exact integer seconds), and a staleness
    * flag at `staleSec`. One grouped aggregate + a one-row broadcast;
    * the fact table is scanned once.
    *
    * @return (key, n_rows, lag_sec, is_stale) ordered by key
    */
  def freshness(df: DataFrame, keyCol: String, tsCol: String,
      staleSec: Long): DataFrame = {
    require(staleSec > 0, s"staleSec must be positive: $staleSec")
    val per = df.where(col(tsCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"),
        max(unix_micros(col(tsCol))).as("__mx"))
    val g = per.agg(max(col("__mx")).as("__gmx"))
    per.crossJoin(broadcast(g))
      .select(col(keyCol), col("n_rows"),
        expr("(__gmx - __mx) div 1000000").as("lag_sec"))
      .withColumn("is_stale", col("lag_sec") > staleSec)
      .orderBy(keyCol)
  }

  def fkOrphans(edges: Seq[FkEdge]): DataFrame = {
    require(edges.nonEmpty, "fkOrphans needs at least one FK edge")
    edges.map { e =>
      e.fact.join(e.dim, e.fact(e.fkCol) === e.dim(e.pkCol), "left_anti")
        .where(e.fact(e.fkCol).isNotNull)
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(e.name).as("edge"), col("n_orphans"))
    }.reduce(_.unionByName(_))
  }

  /** Categorical-column profile: per column, distinct count, Gini
    * impurity 1 - Σ p², and the modal value with its share. Gini (not
    * entropy) deliberately: it is pure ratio arithmetic on exact counts,
    * so it hash-matches across engines where Σ p·ln p would differ in
    * libm ulps.
    *
    * One groupBy per column (column-pruned scan, map-side combinable);
    * the per-value table is category-cardinality sized, and everything
    * after it is a tiny re-aggregation.
    */
  def categoricalProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "categoricalProfile needs at least one column")
    cols.map { c =>
      val counts = df.where(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("v")).agg(count(lit(1)).as("n"))
      counts.agg(
        count(lit(1)).as("n_distinct"),
        sum(col("n")).as("total"),
        sum(col("n") * col("n")).as("sum_sq"),
        max(struct(col("n"), col("v").as("value"))).as("top"))
        .select(lit(c).as("column_name"),
          col("n_distinct"),
          round(lit(1.0) - col("sum_sq").cast("double") /
            (col("total").cast("double") * col("total").cast("double")), 6).as("gini"),
          col("top.value").as("top_value"),
          round(col("top.n").cast("double") / col("total").cast("double"), 6).as("top_share"))
    }.reduce(_.unionByName(_))
  }

  /** Benford first-significant-digit profile of a numeric column with
    * |value| ≥ 1 — the classic fabricated-data screen. Emits observed
    * counts and shares per digit 1-9 (compare against log10(1+1/d)
    * downstream; the expected curve is a constant table, not computed
    * here, keeping the output pure exact-count ratios).
    *
    * First digit via a power-of-ten CASE ladder, floor(v/p) for the
    * largest decimal literal p ≤ v: every branch is one IEEE comparison
    * + division + floor of identical double constants, so it is
    * engine-exact where floor(v/10^floor(log10 v)) is not (log10 differs
    * in the last ulp across libm implementations). Values in (0, 1) are
    * excluded by the ladder's v ≥ 1 floor — extend with negative-power
    * literals if a sub-1 domain needs screening.
    */
  def benfordProfile(df: DataFrame, c: String): DataFrame = {
    val v = abs(col(c).cast("double"))
    val ladder = Seq(1e15, 1e14, 1e13, 1e12, 1e11, 1e10, 1e9, 1e8, 1e7,
      1e6, 1e5, 1e4, 1e3, 1e2, 1e1, 1e0)
    // foldRight nests smallest-power checks innermost, so the evaluated
    // CASE tests v >= 1e15 first and takes the LARGEST power <= v
    val firstDigit = ladder.map(p => (p, floor(v / lit(p)).cast("int")))
      .foldRight(lit(null).cast("int")) { case ((p, d), els) =>
        when(v >= lit(p), d).otherwise(els)
      }
    // the ladder tops out at 1e15: values >= 1e16 would yield floor(v/1e15)
    // in 10..99 — not a digit — so they are out of the supported magnitude
    // range and excluded (as is infinity). Extend the ladder if a column
    // genuinely carries >= 1e16 magnitudes.
    val counts = df.where(col(c).isNotNull && v >= 1.0 && v < 1e16)
      .select(firstDigit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).cast("double").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("share"))
      .orderBy("digit")
  }

  /** Column-profile report: per column, distinct-value count and null
    * count — the distributed analogue of pandas `nunique()` + `isna().
    * sum()` that a schema-drift review reads next to [[Harmonize.
    * schemaDiff]].
    *
    * Deliberately ONE single-column aggregate pass per column (column-
    * pruned parquet scans + partial aggregation), NOT one multi-
    * countDistinct aggregate: Catalyst plans n distincts in one agg as an
    * Expand that replicates every row n times — a non-starter when the
    * fact table is the 100 TB side.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(
        count_distinct(col(c)).as("n_distinct"),
        (count(lit(1)) - count(col(c))).as("n_null"))
        .select(lit(c).as("column_name"), col("n_distinct"), col("n_null"))
    }.reduce(_.unionByName(_))
  }

  /** Per-group DISTRIBUTION DRIFT via the exact two-sample
    * Kolmogorov-Smirnov statistic: for every `keyCol` group,
    * D = sup_v |F_group(v) − F_rest(v)| of `valueCol` — the
    * "has this source's length/quality distribution diverged from the
    * rest of the corpus" screen. Entirely count-ratio arithmetic (no
    * libm), so an external SQL oracle reproduces it bit-for-bit.
    *
    * Exactness: both empirical CDFs are step functions, so the supremum
    * is attained at a jump point — evaluating at EVERY distinct value of
    * the whole corpus (a superset of both samples' jump points) is
    * exact, not a grid approximation. F_rest comes from the global and
    * group cumulative counts (cum_g − cum_k over n_g − n_k): the rest
    * sample never needs its own pass.
    *
    * Scale shape: one groupBy for per-(group, value) counts, the global
    * distinct-value grid cross-joined with the (broadcast-small) group
    * list, and ONE running-sum window per group over the grid — cost
    * O(|groups| × |distinct values|) rows, windows keyed by group, no
    * corpus sort. Output: keyCol, n (group size), ks.
    */
  def ksDrift(df: DataFrame, valueCol: String, keyCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val base = df.where(v.isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("k"), v.as("v"))
    val perKV = base.groupBy("k", "v").agg(count(lit(1)).as("c"))
    val keys = base.groupBy("k").agg(count(lit(1)).as("nk"))
    val grid = base.select("v").distinct()
      .crossJoin(broadcast(keys))
      .join(perKV, Seq("k", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val w = Window.partitionBy("k").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = base.agg(count(lit(1)).as("ng"))
    // the global cum needs no pass of its own: per-key cums at a value
    // partition the corpus, so cumg(v) = Σ_k cumk(v) — one value-keyed
    // window over the grid (distributed by value, never a global sort)
    val wv = Window.partitionBy("v")
    grid
      .withColumn("cumk", sum(col("c")).over(w))
      .withColumn("cumg", sum(col("cumk")).over(wv))
      .crossJoin(broadcast(total))
      .where(col("ng") > col("nk")) // degenerate single-source corpus
      .withColumn("__d", abs(
        col("cumk").cast("double") / col("nk").cast("double") -
          (col("cumg") - col("cumk")).cast("double") /
            (col("ng") - col("nk")).cast("double")))
      .groupBy(col("k").as(keyCol))
      .agg(max(col("nk")).as("n"), round(max(col("__d")), 6).as("ks"))
  }

  /** Population stability index between a reference and a current sample
    * — the standard production drift monitor next to [[ksDrift]]'s
    * two-sample KS. `bins` equal-frequency bins are cut at the
    * reference's exact quantiles (pandas-interpolation, via the
    * distributed CDF); each sample is histogrammed into them and every
    * bin contributes (p−q)·ln(p/q) with both proportions clamped at
    * `eps` (the standard zero-bin guard). Output is one row per bin —
    * the headline PSI is the sum of `psi_term`, but per-bin rows keep
    * every term row-local (exact integer counts, one division, one ln —
    * no order-dependent accumulation) and show WHERE the drift sits.
    *
    * Scale shape: one CDF pass over the reference (range-partitioned,
    * no global sort), the ~`bins` edges broadcast as literals, then one
    * map-side-combinable histogram aggregate per sample. A value equal
    * to an edge falls in the lower bin.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int = 10, eps: Double = 1e-4): DataFrame = {
    require(bins >= 2, s"need at least 2 bins: $bins")
    val probs = (1 until bins).map(_.toDouble / bins)
    val qrow = graft.ops.Clean.exactQuantiles(ref, Seq(valueCol), probs).head()
    val edges = probs.indices.map(i => qrow.getDouble(qrow.fieldIndex(s"q$i")))
    def binned(df: DataFrame, name: String) = {
      val x = col(valueCol).cast("double")
      val bin = edges.map(e => when(x > lit(e), 1L).otherwise(0L)).reduce(_ + _)
      df.where(x.isNotNull).select(bin.as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(name))
    }
    val allBins = ref.sparkSession.range(bins).select(col("id").as("bin"))
    val joined = allBins
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
    val tot = joined.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
    val pr = col("n_ref").cast("double") / col("tr")
    val pc = col("n_cur").cast("double") / col("tc")
    val prC = greatest(pr, lit(eps))
    val pcC = greatest(pc, lit(eps))
    joined.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(pr, 6).as("p_ref"), round(pc, 6).as("p_cur"),
        round((prC - pcC) * log(prC / pcC), 6).as("psi_term"))
  }

  /** One declarative expectation: a named boolean predicate over rows.
    * Null predicate results (e.g. a comparison touching a null) count as
    * FAILURES — an expectation must affirmatively hold.
    */
  case class Expectation(name: String, predicate: org.apache.spark.sql.Column)

  /** Declarative expectation suite (the Great-Expectations/dbt-test
    * shape): evaluate every rule over the frame in ONE codegen'd
    * aggregate pass — no per-rule scan, no driver loop — and emit one
    * row per rule: rule name, total rows, passes, failures, pass rate
    * (6-dp). Rule order is preserved in the output (`rule_ord`) so
    * suites read top-to-bottom like their definition.
    *
    * Scale shape: a single full scan feeding conditional-count
    * aggregates (map-side combined, one 1-row result), then a stack to
    * long form — the scan cost is that of the WIDEST rule set, not of
    * the rule count.
    */
  /** k-anonymity audit over quasi-identifier columns (public privacy
    * model: Sweeney 2002): every row must share its quasi-identifier
    * combination with >= k-1 others. One row per VIOLATING equivalence
    * class (size < k) with the class values and size, plus the re-id
    * risk 1/size. One map-side-combinable groupBy on the quasi columns —
    * the wordcount shape, no row data beyond the quasi values moves.
    */
  /** l-diversity violations (Machanavajjhala et al. 2007 — the
    * refinement k-anonymity misses: a k-large class whose SENSITIVE
    * attribute is (near-)constant still leaks it). One row per
    * equivalence class with fewer than `l` distinct non-null sensitive
    * values. Same wordcount-shaped scale story as
    * [[kAnonymityViolations]], with a count-distinct on the sensitive
    * column riding the same (quasi…) exchange.
    */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(l >= 2, s"l must be >= 2: $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .where(col("n_sensitive") < l)
  }

  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)
      .withColumn("reid_risk", round(lit(1.0) / col("class_size"), 6))
  }

  /** The one-row summary companion to [[kAnonymityViolations]]: achieved
    * k (smallest class size), violating class/row counts, total classes.
    */
  def kAnonymitySummary(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
      .agg(min("__sz").as("achieved_k"),
        count(lit(1)).as("n_classes"),
        sum(when(col("__sz") < k, 1L).otherwise(0L)).as("violating_classes"),
        sum(when(col("__sz") < k, col("__sz")).otherwise(0L)).as("rows_at_risk"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007 — the
    * refinement l-diversity misses: an equivalence class whose sensitive
    * DISTRIBUTION diverges from the corpus-wide one leaks information
    * even with many distinct values). Per quasi-identifier class: the
    * ordered earth-mover's distance between the class's sensitive-value
    * distribution and the global one, computed over `bins` equal-width
    * buckets (numpy edge rule — max clamps into the last bin, degenerate
    * range → bin 0): EMD = Σₖ |cumFrac_class(k) − cumFrac_global(k)| /
    * (bins − 1).
    *
    * Scale shape: one min/max pre-aggregate, one (class × bin) count
    * aggregate (wordcount-shaped), a dense class×bins grid (a bounded
    * 10× multiplier on the CLASS count, never on rows) with a keyed
    * 10-row window for the cumulative sums, and a broadcast global
    * distribution. The per-class |diff| sum rides fixed-point 1e9 longs
    * so the ≤bins-term summation is order-invariant.
    *
    * @return one row per class: (quasi…, n, emd round-6)
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, bins: Int = 10): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(bins >= 2, s"bins must be >= 2: $bins")
    val spark = df.sparkSession
    val base = df.where(col(sensitiveCol).isNotNull)
      .select(quasiCols.map(col) :+
        col(sensitiveCol).cast("double").as("__s"): _*)
    val mm = base.agg(min(col("__s")).as("__lo"), max(col("__s")).as("__hi"))
    val binned = base.crossJoin(broadcast(mm))
      .select(quasiCols.map(col) :+
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor((col("__s") - col("__lo"))
              / ((col("__hi") - col("__lo")) / lit(bins.toDouble))),
            lit((bins - 1).toLong))).as("__bin"): _*)
    val perClassBin = binned
      .groupBy(quasiCols.map(col) :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__c"))
    val perClass = perClassBin.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).as("__n"))
    val globalBin = perClassBin.groupBy("__bin").agg(sum(col("__c")).as("__gc"))
    val total = globalBin.agg(sum(col("__gc")).as("__gn"))
    import spark.implicits._
    val grid = perClass
      .crossJoin(broadcast((0L until bins.toLong).toDF("__bin")))
    // rename the right side's key columns: grid and perClassBin share
    // lineage (both derive from the same aggregate), so qualified column
    // references would be ambiguous to the analyzer
    val pcbR = perClassBin.select(
      quasiCols.map(k => col(k).as(s"__r_$k")) ++
        Seq(col("__bin").as("__r_bin"), col("__c")): _*)
    val dense = grid
      .join(pcbR, quasiCols.map(k => col(k) <=> col(s"__r_$k"))
          .reduce(_ && _) && col("__bin") === col("__r_bin"), "left")
      .select(quasiCols.map(col) ++ Seq(col("__bin"),
        coalesce(col("__c"), lit(0L)).as("__c"), col("__n")): _*)
      .join(broadcast(globalBin), Seq("__bin"))
      .crossJoin(broadcast(total))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
      .orderBy("__bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    dense
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__gcum", sum(col("__gc")).over(w))
      // the last bin's cumulative fractions are both 1 — it contributes 0
      .where(col("__bin") < (bins - 1).toLong)
      .withColumn("__t9", floor(abs(
        col("__cum").cast("double") / col("__n").cast("double")
          - col("__gcum").cast("double") / col("__gn").cast("double")) * 1e9))
      .groupBy(quasiCols.map(col) :+ col("__n").as("n"): _*)
      .agg(round(sum(col("__t9")).cast("double") / 1e9 / (bins - 1), 6)
        .as("emd"))
      .select(quasiCols.map(col) ++ Seq(col("n"), col("emd")): _*)
  }

  /** One level of a deletion cascade: `fkCol` references the PREVIOUS
    * level's key set; `nextKeyCol` is this table's key that the next
    * level references (None for the leaf).
    */
  case class CascadeLevel(table: String, df: DataFrame, fkCol: String,
      nextKeyCol: Option[String])

  /** GDPR right-to-be-forgotten blast-radius audit: given the root key
    * set to erase, chain semi-joins down the FK hierarchy and report per
    * table how many rows the cascade reaches. One row per level:
    * (level, table_name, rows_total, rows_affected, pct).
    *
    * Scale shape: each level is a LEFT SEMI join on the previous level's
    * (distinct) key set — keys only, never row bodies, and the whole
    * report is one lazy plan (no per-level driver actions). The root set
    * broadcast-s when small; deeper key sets shuffle on the FK, the join
    * key the child tables would already be bucketed by in a 100-TB
    * layout.
    */
  def deletionCascade(rootKeys: DataFrame, levels: Seq[CascadeLevel]): DataFrame = {
    require(levels.nonEmpty, "levels must be non-empty")
    require(rootKeys.columns.length == 1, "rootKeys must have exactly one column")
    var keys = rootKeys.toDF("__key").distinct()
    val parts = levels.zipWithIndex.map { case (lv, i) =>
      val affected = lv.df.join(keys, lv.df(lv.fkCol) === col("__key"), "left_semi")
      if (i < levels.length - 1) {
        val nk = lv.nextKeyCol.getOrElse(throw new IllegalArgumentException(
          s"level $i (${lv.table}) needs nextKeyCol — it is not the leaf"))
        keys = affected.select(col(nk).as("__key")).distinct()
      }
      val total = lv.df.agg(count(lit(1)).as("rows_total"))
      affected.agg(count(lit(1)).as("rows_affected"))
        .crossJoin(total)
        .select(lit(i.toLong).as("level"), lit(lv.table).as("table_name"),
          col("rows_total"), col("rows_affected"),
          when(col("rows_total") === 0, lit(null).cast("double"))
            .otherwise(round(col("rows_affected").cast("double") / col("rows_total"), 6))
            .as("pct"))
    }
    parts.reduce(_.unionByName(_))
  }

  def expect(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "expect needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectation names must be unique")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case (r, i) =>
        sum(when(r.predicate, 1L).otherwise(0L)).as(s"__p_$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${rules.size}, " + rules.zipWithIndex.map {
      case (r, i) => s"${i}L, '${r.name.replace("'", "''")}', `__p_$i`"
    }.mkString(", ") + ") as (rule_ord, rule, n_pass)"
    row.select(col("__n"), expr(stackExpr))
      .select(col("rule_ord"), col("rule"), col("__n").as("n_rows"),
        col("n_pass"),
        (col("__n") - col("n_pass")).as("n_fail"),
        when(col("__n") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_pass").cast("double") / col("__n"), 6))
          .as("pass_rate"))
  }

  /** FUNCTIONAL-DEPENDENCY check over candidate (determinant →
    * dependent) column pairs — the schema-profiling primitive behind key
    * discovery, normalization audits and "is this column derivable"
    * questions (the pairwise core of Metanome-style FD discovery). A
    * pair HOLDS iff no determinant value maps to more than one distinct
    * dependent value (null determinants are out of scope, SQL-style).
    *
    * Scale shape: each pair is one map-side-combining groupBy(det)
    * count-distinct (the exchange carries (det, partial-distinct)
    * buffers) followed by a one-row rollup; pairs are a bounded
    * caller-chosen list, so the scan count equals the candidate count —
    * at 100 TB you prune candidates first (by column-stats type/NDV)
    * exactly like every FD miner does.
    *
    * @return one row per pair: (determinant, dependent, n_groups,
    *         n_violating, holds)
    */
  def functionalDependencies(df: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate pair")
    val checks = pairs.map { case (a, b) =>
      df.where(col(a).isNotNull)
        .groupBy(col(a))
        .agg(countDistinct(col(b)).as("__d"))
        .agg(count(lit(1)).as("n_groups"),
          count(when(col("__d") > 1, lit(1))).as("n_violating"))
        .select(lit(a).as("determinant"), lit(b).as("dependent"),
          col("n_groups"), col("n_violating"),
          (col("n_violating") === 0).as("holds"))
    }
    checks.reduce(_ unionByName _).orderBy("determinant", "dependent")
  }

  /** ε-differentially-private category-count release via the Laplace
    * mechanism: each published count gets noise ~ Laplace(Δ/ε) with
    * sensitivity Δ = 1 (one row changes one category count by one) —
    * the standard release shape for sharing corpus composition stats
    * (counts per language/source/toxicity band) without exposing the
    * presence of any single document.
    *
    * Noise is generated by INVERSE-CDF over a deterministic md5-derived
    * uniform of the category value: u = (h + 0.5)/2^60 ∈ (0,1),
    * noise = −b·sign(u−½)·ln(1 − 2|u−½|). DETERMINISM CAVEAT (by
    * design, documented): a fixed u per category makes the release
    * reproducible for the test oracle, but real DP requires fresh
    * secure randomness per release — swap `u` for a secure uniform in
    * production; every other line is the real mechanism.
    *
    * Scale: one groupBy (map-side combinable counts) + a per-group
    * projection; groups are bounded by the category domain.
    */
  def dpNoisyCounts(df: DataFrame, keyCol: String, epsilon: Double): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val b = 1.0 / epsilon
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long").cast("double")
    val u = (h + lit(0.5)) / lit(1152921504606846976.0) // 2^60
    val c = u - lit(0.5)
    val noise = lit(-b) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("n_noisy", round(col("n_true") + noise, 6))
      .withColumn("epsilon", lit(epsilon))
  }
}
