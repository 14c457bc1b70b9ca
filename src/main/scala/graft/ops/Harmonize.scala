package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Integration / harmonization operators (SURVEY §2.2).
  *
  * Reference: `Data_integration and harmonization.py:20-23` — column-name
  * standardization (`lower().replace(' ','_')`) followed by union-by-name
  * concatenation (`pd.concat(dfs, ignore_index=True)`) where columns absent
  * from a frame become null.
  *
  * Scale notes: both ops are narrow (no shuffle). `unionByName` is a pure
  * plan-level concatenation of scan partitions; downstream wide operators
  * decide the shuffle. Null-fill of missing columns is a projection.
  */
object Harmonize {

  /** H1 — standardize column names: lowercase, spaces to underscores. */
  def standardizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(c => c.toLowerCase.replace(" ", "_")).toIndexedSeq: _*)

  /** H2 — union-by-name concat of N heterogeneous tables with null-fill.
    * Column order: first frame's schema order, right-only columns appended —
    * matching `pd.concat`'s alignment semantics.
    */
  def unionByName(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionByName needs at least one input")
    dfs.map(standardizeColumns).reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** H2b — union-by-name with TYPE WIDENING. pandas `concat` silently
    * promotes dtypes (int64 + float64 → float64, anything + object →
    * object); Spark's `unionByName` throws on a type conflict instead.
    * This variant computes the pandas-style common type per column name
    * across all inputs — numeric∪numeric → double (bigint only when every
    * source is integral), anything∪string → string — casts each frame,
    * then unions. Pure projections + plan-level concat: still no shuffle.
    */
  def unionWidened(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionWidened needs at least one input")
    val std = dfs.map(standardizeColumns)
    val types: Map[String, Seq[DataType]] =
      std.flatMap(_.schema.fields.map(f => f.name -> f.dataType))
        .groupBy(_._1).map { case (n, ts) => n -> ts.map(_._2) }
    def widen(ts: Seq[DataType]): DataType = {
      val distinct = ts.distinct
      if (distinct.size == 1) distinct.head
      else if (distinct.forall(t => t == LongType || t == IntegerType ||
        t == ShortType || t == ByteType)) LongType
      else if (distinct.forall(_.isInstanceOf[NumericType])) DoubleType
      else StringType
    }
    val target = types.map { case (n, ts) => n -> widen(ts) }
    val casted = std.map { df =>
      df.select(df.columns.toIndexedSeq.map(c => col(c).cast(target(c)).as(c)): _*)
    }
    casted.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Blocked fuzzy matching for dimension-value reconciliation (entity
    * resolution — the harmonization step AFTER names/types align): pairs
    * of values from `left`/`right` within `maxDist` Levenshtein edits.
    * Candidates come from an equi-join on a cheap blocking key (default:
    * string length — an edit-distance-d match differs by at most d in
    * length, so each left row joins its length ±maxDist neighborhood);
    * the exact distance filters candidates. NEVER a cross join: cost is
    * sum of block-pair sizes, and the blocking column is the knob for
    * skew (compose length with a prefix/phonetic key for tighter blocks
    * at corpus scale).
    */
  def fuzzyMatchBlocked(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String, maxDist: Int): DataFrame = {
    val l = left.select(col(leftCol).as("l_val"))
      .where(col("l_val").isNotNull).distinct()
      .withColumn("l_len", length(col("l_val")))
    val r = right.select(col(rightCol).as("r_val"))
      .where(col("r_val").isNotNull).distinct()
      .withColumn("r_len", length(col("r_val")))
      // each right value replicates to every length block it can match
      .withColumn("l_len", explode(sequence(
        col("r_len") - maxDist, col("r_len") + maxDist)))
    l.join(r, Seq("l_len"))
      .withColumn("dist", levenshtein(col("l_val"), col("r_val")))
      .where(col("dist") <= maxDist)
      .select(col("l_val"), col("r_val"), col("dist").cast("int").as("dist"))
  }

  /** Trigram-blocked Jaro-Winkler similarity join — the pg_trgm-style
    * fuzzy join for name/identifier reconciliation where edit-distance
    * length-blocking ([[fuzzyMatchBlocked]]) is too coarse: candidates
    * are pairs sharing at least one character 3-gram (lowercased;
    * strings shorter than 3 block on themselves), verified with the
    * codegen'd `graft_jw` kernel at `threshold`.
    *
    * Scale shape: gram explode → equi-join on the gram — never a cross
    * join; cost is Σ per-gram block-pair sizes. `maxDf > 0` arms the
    * stop-gram skew cap: grams appearing in more than `maxDf` values
    * (across both sides) are EXCLUDED from candidate generation via one
    * anti-join — at corpus scale one boilerplate gram ("LLC", "inc")
    * otherwise turns the join quadratic. The exclusion is deterministic
    * and must be mirrored by any replay (same contract as
    * `Dedup.containmentPairs`). BLOCKING CONTRACT: a pair sharing no
    * (surviving) gram is not found even above the threshold — that is
    * the trade every trigram index makes.
    *
    * Needs `graft_jw` registered (GraftExtensions).
    *
    * @return (l_val, r_val, jw round-6), threshold applied UNROUNDED
    */
  /** Bounded edit-distance SELF-join (r15) via FastSS/SymSpell deletion
    * neighborhoods: every distinct-value pair at Levenshtein distance
    * <= 1, without an all-pairs compare. If ed(u, v) <= 1 the two
    * single-deletion neighborhoods (value itself + each one-char
    * deletion) intersect — substitution at i deletes to the same
    * string, an insertion deletes to the shorter word, equality is the
    * value itself — so candidates come from ONE equi-join on the
    * variant, then the exact `levenshtein` verifies. Recall is 100% by
    * the neighborhood property (the oracle is the brute-force all-pairs
    * ground truth, so a blocking miss hash-mismatches).
    *
    * Scale shape: variants are generated per DISTINCT value (vocabulary-
    * bounded, the Tokenize/Zipf argument), |variants| = Σ(len+1); the
    * join shuffles on the variant string with map-side-combinable
    * distinct; no pair ever forms across different variant buckets. The
    * HOF lambda is interpreted — fine, it runs over the distinct set,
    * never the corpus. `minLen` drops ultra-short values whose empty /
    * 1-char variants would otherwise bucket half the vocabulary
    * together (the hub guard — same role as fuzzyJoinTrigram's maxDf).
    *
    * @return (w_a, w_b, dist) with w_a < w_b, dist <= 1
    */
  def editDistance1Pairs(df: DataFrame, c: String,
      minLen: Int = 2): DataFrame = {
    val vals = df.select(lower(col(c)).as("w"))
      .where(col("w").isNotNull && length(col("w")) >= minLen).distinct()
    // the word itself + every single-char deletion; substr(w, 1, 0) is ''
    // and substr(w, len+1, …) is '' on BOTH engines (pos >= 1 throughout,
    // so the substr-at-nonpositive-pos trap never applies)
    val variants = vals.withColumn("__var", explode(expr(
      "array_union(array(w), transform(sequence(1, length(w)), " +
        "i -> concat(substr(w, 1, i - 1), substr(w, i + 1, length(w)))))")))
    variants.select(col("w").as("w_a"), col("__var"))
      .join(variants.select(col("w").as("w_b"), col("__var")), Seq("__var"))
      .where(col("w_a") < col("w_b"))
      .select("w_a", "w_b").distinct()
      .withColumn("dist", levenshtein(col("w_a"), col("w_b")))
      .where(col("dist") <= 1)
  }

  def fuzzyJoinTrigram(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String, threshold: Double,
      maxDf: Int = 0): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold in (0, 1]: $threshold")
    def prep(df: DataFrame, c: String, out: String): DataFrame =
      df.select(lower(col(c)).as(out))
        .where(col(out).isNotNull && length(col(out)) > 0).distinct()
    def grams(v: Column): Column =
      // Spark sequence(1, 0) DESCENDS — guard short strings explicitly
      when(length(v) >= 3, array_distinct(
        transform(sequence(lit(1), length(v) - 2), i => v.substr(i, lit(3)))))
        .otherwise(array(v))
    val l = prep(left, leftCol, "l_val")
    val r = prep(right, rightCol, "r_val")
    val lg = l.select(col("l_val"), explode(grams(col("l_val"))).as("g"))
    val rg = r.select(col("r_val"), explode(grams(col("r_val"))).as("g"))
    val (lgc, rgc) =
      if (maxDf <= 0) (lg, rg)
      else {
        val hot = lg.select(col("l_val").as("v"), col("g"))
          .union(rg.select(col("r_val").as("v"), col("g")))
          .groupBy("g").agg(count(lit(1)).as("__df"))
          .where(col("__df") > maxDf).select("g")
        (lg.join(hot, Seq("g"), "left_anti"),
          rg.join(hot, Seq("g"), "left_anti"))
      }
    lgc.join(rgc, Seq("g"))
      .select("l_val", "r_val").distinct()
      .withColumn("__jw", call_function("graft_jw", col("l_val"), col("r_val")))
      .where(col("__jw") >= threshold)
      .select(col("l_val"), col("r_val"), round(col("__jw"), 6).as("jw"))
  }

  /** One comparison field of a Fellegi–Sunter linkage model: `agree` is
    * the per-pair agreement predicate, `m`/`u` the match/unmatch
    * agreement probabilities. Weights are computed HERE, at plan time —
    * ln never executes inside the query, so engine and oracle share the
    * identical literal doubles.
    */
  case class FsField(name: String, agree: Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"m/u must be in (0,1): $m, $u")
    def agreeWeight: Double = math.log(m / u)
    def disagreeWeight: Double = math.log((1 - m) / (1 - u))
  }

  /** Fellegi–Sunter probabilistic record-linkage scoring (public model:
    * Fellegi & Sunter 1969, the foundation of Splink/RecordLinkage):
    * score = Σ_f ln(m/u) if field f agrees else ln((1−m)/(1−u)), plus
    * the '1'/'0' agreement pattern. Runs over PRE-BLOCKED candidate
    * pairs (compose with [[fuzzyMatchBlocked]]-style blocking — never a
    * cross join); the scorer itself is a pure codegen'd projection of
    * CASE-selected literal weights, so it adds zero shuffles to the
    * blocking plan.
    */
  def linkageScore(pairs: DataFrame, fields: Seq[FsField]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    val pattern = concat(fields.map(f =>
      when(f.agree, lit("1")).otherwise(lit("0"))): _*)
    val score = fields.map(f =>
        when(f.agree, lit(f.agreeWeight)).otherwise(lit(f.disagreeWeight)))
      .reduceLeft(_ + _)
    pairs.withColumn("pattern", pattern).withColumn("score", round(score, 6))
  }

  /** Dictionary recode of a categorical column (pandas `Series.map` /
    * `replace` analog) — the value-level harmonization step after names
    * and types align (e.g. mapping per-source category spellings onto one
    * vocabulary). Small dictionaries compile to a chained CASE — pure
    * scan-local codegen'd projection, no join, no shuffle; for
    * dictionary tables too big to inline, broadcast-join a mapping table
    * instead. Unmapped values keep their original (`keepUnmapped=true`,
    * pandas `replace`) or become null (`false`, pandas `map`).
    */
  def recode(df: DataFrame, c: String, mapping: Seq[(String, String)],
      keepUnmapped: Boolean = true): DataFrame = {
    val fallback = if (keepUnmapped) col(c) else lit(null)
    val cased = mapping.foldRight(fallback) { case ((from, to), els) =>
      when(col(c) === from, lit(to)).otherwise(els)
    }
    df.withColumn(c, cased)
  }

  /** Schema-drift report between two tables — the pre-flight check before
    * union-by-name integration (ref `DIH.py:20-23` silently null-fills
    * mismatches; this surfaces them). One row per canonical column name:
    * status `both`/`left_only`/`right_only`, the SQL type on each side,
    * and whether the types agree. `canon` normalizes names first (e.g.
    * strip a per-table prefix) so renamed-but-equivalent columns line up.
    *
    * Pure schema metadata — built driver-side from `df.schema`, scans no
    * data, so it is constant-cost at any corpus size.
    */
  def schemaDiff(left: DataFrame, right: DataFrame,
      canon: String => String = identity): DataFrame = {
    def typeName(dt: DataType): String = dt match {
      case LongType => "bigint"
      case IntegerType => "integer"
      case StringType => "varchar"
      case TimestampType => "timestamp"
      case ArrayType(e, _) => typeName(e) + "[]"
      case other => other.sql.toLowerCase
    }
    def canonSide(df: DataFrame, side: String): Map[String, String] = {
      val named = df.schema.fields.map(f => canon(f.name) -> typeName(f.dataType))
      val dups = named.groupBy(_._1).collect { case (n, fs) if fs.length > 1 => n }
      // fail loudly: toMap would silently keep one of the colliding columns
      // and the drift report would hide the other — the opposite of its job
      require(dups.isEmpty,
        s"canon maps multiple $side columns to the same name: ${dups.mkString(", ")}")
      named.toMap
    }
    val l = canonSide(left, "left")
    val r = canonSide(right, "right")
    val rows = (l.keySet ++ r.keySet).toSeq.sorted.map { name =>
      val (tl, tr) = (l.get(name), r.get(name))
      val status =
        if (tl.isEmpty) "right_only" else if (tr.isEmpty) "left_only" else "both"
      val matches: java.lang.Boolean =
        if (tl.isEmpty || tr.isEmpty) null else Boolean.box(tl == tr)
      Row(name, status, tl.orNull, tr.orNull, matches)
    }
    val schema = StructType(Seq(
      StructField("col_name", StringType, nullable = false),
      StructField("status", StringType, nullable = false),
      StructField("type_left", StringType, nullable = true),
      StructField("type_right", StringType, nullable = true),
      StructField("type_match", BooleanType, nullable = true)))
    val spark = left.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** One field-survivorship rule for [[goldenRecord]]: how to pick the
    * surviving value of `field` within a duplicate cluster. Every rule is
    * deterministic — ties break on an explicit total order, never on
    * partitioning — so the golden record is stable across cluster layouts.
    */
  sealed trait SurvivorRule { def field: String }
  object SurvivorRule {
    /** Value from the most recent non-null version: max (orderCol, idCol). */
    case class Latest(field: String, orderCol: String) extends SurvivorRule
    /** Longest non-null value (ties → lexicographically greatest). */
    case class Longest(field: String) extends SurvivorRule
    /** Most frequent non-null value (ties → lexicographically smallest). */
    case class MostFrequent(field: String) extends SurvivorRule
    /** Plain max over non-null values. */
    case class MaxValue(field: String) extends SurvivorRule
    /** Plain min over non-null values. */
    case class MinValue(field: String) extends SurvivorRule
  }

  /** Golden-record survivorship — the merge step AFTER entity resolution
    * (compose with [[linkageScore]] → `Dedup.clusterNearDups`): collapse
    * each duplicate cluster to ONE canonical record, picking each field's
    * surviving value by an explicit rule (the survivorship stage of an
    * MDM pipeline; same semantics family as Talend/Informatica merge
    * rules, all public). Output: `clusterCol`, `n_versions`, then one
    * column per rule in rule order.
    *
    * Scale: `Latest`/`Longest`/`Max`/`Min` fuse into ONE hash aggregate
    * on the cluster key (each is a null-guarded `max(struct(...))` with
    * a total-order tie-break, so partial aggregation map-side combines
    * and the merge is order-invariant). Each `MostFrequent` field needs
    * its own (cluster, value) pre-count — that pre-agg also map-side
    * combines, and its result (≤ one row per distinct value per cluster)
    * joins back on the SAME cluster key the base aggregate hashed on, so
    * AQE broadcasts it when small and co-partitions otherwise. No rule
    * ever widens a row beyond the cluster's own versions — no skew
    * beyond the cluster-size distribution itself.
    */
  def goldenRecord(records: DataFrame, clusterCol: String, idCol: String,
      rules: Seq[SurvivorRule]): DataFrame = {
    import SurvivorRule._
    require(rules.nonEmpty, "goldenRecord needs at least one rule")
    val reserved = Set(clusterCol, "n_versions")
    require(rules.forall(r => !reserved.contains(r.field)),
      s"rule fields may not collide with $reserved")
    // one-pass rules: null-guarded max(struct(ordering..., field))
    val onePass: Seq[Column] = rules.collect {
      case Latest(f, o) =>
        max(when(col(f).isNotNull, struct(col(o).as("o"), col(idCol).as("i"),
          col(f).as("v")))).getField("v").as(f)
      case Longest(f) =>
        max(when(col(f).isNotNull, struct(length(col(f)).as("len"),
          col(f).as("v")))).getField("v").as(f)
      case MaxValue(f) => max(col(f)).as(f)
      case MinValue(f) => min(col(f)).as(f)
    }
    val base = records.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_versions"), onePass: _*)
    // each MostFrequent field: (cluster, value) counts -> deterministic argmax
    val joined = rules.collect { case MostFrequent(f) => f }
      .foldLeft(base) { (acc, f) =>
        val counts = records.where(col(f).isNotNull)
          .groupBy(col(clusterCol), col(f)).agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(clusterCol)).orderBy(col("cnt").desc, col(f).asc)
        val top = counts.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1).select(col(clusterCol), col(f))
        acc.join(top, Seq(clusterCol), "left")
      }
    joined.select((col(clusterCol) +: col("n_versions") +:
      rules.map(r => col(r.field))): _*)
  }

  /** Instance-based schema matching: score every (left column, right
    * column) pair by the overlap of their VALUE domains — the
    * content-level complement of [[suggestColumnMapping]]'s name
    * matching, and the standard instance-based matcher of the schema-
    * matching literature (Rahm & Bernstein 2001 survey taxonomy).
    *
    * Each column is summarized by a bottom-k sketch of md5 hashes of its
    * distinct (stringified) values; pair similarity is the classic
    * bottom-k Jaccard estimator — among the k smallest hashes of the
    * UNION, the fraction present in both sketches (denominator
    * min(k, |union|) when the domains are small). md5 is the engine-
    * portable hash used across graft's samplers.
    *
    * Scale: the value stream is ONE scan per side (a per-row explode of
    * (column, value) structs — width × rows, all scan-local), reduced by
    * a map-side-combining distinct on (column, hash); the bottom-k cut
    * is a per-column window over at most the distinct counts, and
    * everything downstream operates on ≤ columns × k rows — constant-
    * size regardless of corpus. For 100 TB domains set
    * `domainMod > 1`: both sides keep only values with hash % mod == 0,
    * a deterministic 1/mod domain subsample applied BEFORE the shuffle
    * (the estimator stays unbiased because both sides restrict to the
    * same hash stratum).
    *
    * @return (left_col, right_col, n_common, n_union_k, est_jaccard)
    */
  def contentSchemaMatch(left: DataFrame, right: DataFrame, k: Int = 128,
      domainMod: Int = 1): DataFrame = {
    require(k > 0 && domainMod > 0, "k and domainMod must be positive")
    def sketch(df: DataFrame, out: String): DataFrame = {
      val entries = df.columns.toIndexedSeq.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v")))
      val hashed = df.select(explode(array(entries: _*)).as("p"))
        .select(col("p.c").as(out),
          conv(substring(md5(col("p.v")), 1, 15), 16, 10).cast("long").as("h"))
        .where(col("h").isNotNull && col("h") % domainMod === 0)
        .groupBy(col(out), col("h")).agg(count(lit(1)).as("dupes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(out)).orderBy(col("h"))
      hashed.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
        .select(col(out), col("h"))
    }
    val l = sketch(left, "left_col")
    val r = sketch(right, "right_col")
    // pair universe is columns × columns (metadata-sized); fan each side's
    // sketch out to its pairs, merge, and rank the union per pair
    val pairsU = l.select("left_col").distinct()
      .crossJoin(r.select("right_col").distinct())
    val lh = pairsU.join(l, Seq("left_col"))
      .select(col("left_col"), col("right_col"), col("h"),
        lit(1).as("in_l"), lit(0).as("in_r"))
    val rh = pairsU.join(r, Seq("right_col"))
      .select(col("left_col"), col("right_col"), col("h"),
        lit(0).as("in_l"), lit(1).as("in_r"))
    val merged = lh.unionByName(rh)
      .groupBy("left_col", "right_col", "h")
      .agg(max(col("in_l")).as("in_l"), max(col("in_r")).as("in_r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("left_col"), col("right_col")).orderBy(col("h"))
    merged.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .groupBy("left_col", "right_col")
      .agg(sum(col("in_l") * col("in_r")).as("n_common"),
        count(lit(1)).as("n_union_k"))
      .withColumn("est_jaccard",
        round(col("n_common").cast("double") / col("n_union_k"), 6))
  }

  /** Column-mapping suggestion for heterogeneous uploads: for every left
    * column, the closest right column by Levenshtein distance over
    * canonicalized names (the upload-harmonization assist the reference's
    * manual rename step implies). Driver-side only — schemas are metadata,
    * never data — and cost is |left|×|right| name pairs (trivial).
    * Ties break lexicographically; suggestions above `maxDist` are
    * dropped. Suggestions are independent per left column (two left
    * columns may map to one right column — the caller reviews).
    *
    * @return (left_col, suggested_right_col, distance), left order
    */
  def suggestColumnMapping(left: DataFrame, right: DataFrame,
      maxDist: Int = 3): Seq[(String, String, Int)] = {
    def canon(c: String) = c.toLowerCase.replace(" ", "_")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rightCols = right.columns.toIndexedSeq
    left.columns.toIndexedSeq.flatMap { lc =>
      val scored = rightCols.map(rc => (rc, lev(canon(lc), canon(rc)))).sortBy { case (rc, s) => (s, rc) }
      scored.headOption.collect { case (rc, s) if s <= maxDist => (lc, rc, s) }
    }
  }

  /** BLOCKING-quality audit (Christen 2012 §7) — the two numbers that
    * decide whether a blocking scheme is safe to run linkage behind at
    * 100 TB: reduction ratio (how much of the L×R cross product the
    * blocks avoid — the cost axis) and pairs completeness (what fraction
    * of TRUE matches still co-block — the recall axis; every true pair
    * the blocks separate is a linkage miss no downstream scoring can
    * recover). Tune the block key until completeness holds and reduction
    * is maximal; this audit is the measurement loop.
    *
    * Inputs: `candidates` and `truth` as (lid, rid) pair tables — the
    * caller's blocking join and ground truth (a labeled sample, a
    * trusted id equality, or a gold standard). All five statistics are
    * one-row aggregates joined by broadcast; the only sized cost is
    * counting the candidate pairs the blocking ALREADY generates.
    */
  def blockingAudit(candidates: DataFrame, truth: DataFrame,
      left: DataFrame, right: DataFrame): DataFrame = {
    val cand = candidates.select(col("lid"), col("rid")).distinct()
    val tru = truth.select(col("lid"), col("rid")).distinct()
    val nl = left.agg(count(lit(1)).as("n_left"))
    val nr = right.agg(count(lit(1)).as("n_right"))
    val nc = cand.agg(count(lit(1)).as("n_cand"))
    val nt = tru.agg(count(lit(1)).as("n_true"))
    val nf = tru.join(cand, Seq("lid", "rid")).agg(count(lit(1)).as("n_found"))
    nl.crossJoin(broadcast(nr)).crossJoin(broadcast(nc))
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nf))
      .select(col("n_left"), col("n_right"), col("n_cand"), col("n_true"),
        col("n_found"),
        round(lit(1.0) - col("n_cand").cast("double") /
          (col("n_left").cast("double") * col("n_right").cast("double")), 6)
          .as("reduction_ratio"),
        when(col("n_true") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_found").cast("double") /
            col("n_true").cast("double"), 6)).as("pairs_completeness"))
  }
}
