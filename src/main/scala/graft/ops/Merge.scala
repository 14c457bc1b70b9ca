package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance operators (north-star extension): keyed upsert and
  * snapshot diffing — the two primitives every incremental integration
  * pipeline needs (the reference app re-uploads whole files; these are the
  * scale-correct replacements).
  */
object Merge {

  /** Keyed upsert (MERGE): rows from `updates` replace same-key rows in
    * `current`; unmatched current rows pass through. Exactly one wide op —
    * the anti join keyed on `keys` (broadcast-able when the update batch is
    * small, the common CDC shape); the union is plan-level concat.
    * Precondition: `updates` has at most one row per key (enforce upstream
    * with dropDuplicates — not here, so the cost is visible to the caller).
    */
  def upsert(current: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    current.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** Snapshot diff (CDC extraction): classify every key across two
    * snapshots as added / removed / changed / unchanged. One full-outer
    * join keyed on `keys`; comparison uses null-safe equality so a
    * value-to-null transition counts as changed, not unchanged.
    * Output: keys…, change_type, then old_/new_ pairs of `compareCols`.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(1))
      .toDF(keys ++ compareCols.map("old_" + _) :+ "__in_old": _*)
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(1))
      .toDF(keys ++ compareCols.map("new_" + _) :+ "__in_new": _*)
    val anyChanged = compareCols
      .map(c => !(col("old_" + c) <=> col("new_" + c)))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(anyChanged, "changed")
          .otherwise("unchanged"))
      .drop("__in_old", "__in_new")
  }

  /** SCD type-2 history build from a change log: collapse consecutive
    * repeats of `attrCol` per key (only transitions survive) and emit one
    * validity interval per surviving state — `valid_from` = the change
    * timestamp, `valid_to` = the next change (null = current row).
    * Deterministic under timestamp ties via `tieBreakCols` appended to the
    * window order.
    *
    * Scale shape: both windows partition by the dimension key — no global
    * sort — and share one (key, ts) sort order, so Catalyst plans a single
    * exchange+sort for the lag and the lead. The collapse filter shrinks
    * the data BEFORE the second window's shuffle.
    */
  def scd2(log: DataFrame, keyCols: Seq[String], attrCol: String,
      tsCol: String, tieBreakCols: Seq[String] = Nil): DataFrame = {
    val ord = (col(tsCol) +: tieBreakCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val transitions = log
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // first row per key always survives; later rows only on value change
      // (null-safe: a null->value or value->null flip is a real transition)
      .where(col("__rn") === 1 || !(col(attrCol) <=> col("__prev")))
      .drop("__prev", "__rn")
    transitions
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** CDC log application: roll an ordered change log of upserts and
    * deletes forward onto a base snapshot, producing the final state.
    * Each log row carries `opCol` ∈ {"U" (upsert — insert or update),
    * "D" (delete)}; the LAST op per key under (tsCol, tieBreakCols)
    * order wins, log rows always beat the base row, and a winning "D"
    * removes the key. Base rows pass through untouched for keys the log
    * never mentions.
    *
    * Scale shape: ONE shuffle — the union is plan-level concat, the
    * winner pick is a row_number window partitioned by `keys` (never
    * global), and the op filter prunes before any downstream exchange.
    * At 100 TB the log side is typically a small fraction of the base;
    * both sides shuffle on the same keys the snapshot is usually
    * already bucketed by.
    *
    * `log` must carry `keys`, every data column of `base`, `opCol`,
    * and `tsCol` ("D" rows may hold nulls in the data columns — they
    * are dropped, not read).
    */
  def applyCdc(base: DataFrame, log: DataFrame, keys: Seq[String],
      opCol: String, tsCol: String,
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    val dataCols = base.columns.toIndexedSeq
    val b = base.select(dataCols.map(col): _*)
      .withColumn("__graft_op", lit("U"))
      .withColumn("__graft_src", lit(0))
      .withColumn("__graft_ts", lit(null).cast(log.schema(tsCol).dataType))
      .withColumn("__graft_tie", lit(null).cast("string"))
    val tie =
      if (tieBreakCols.isEmpty) lit("").cast("string")
      else concat_ws(" ", tieBreakCols.map(c => col(c).cast("string")): _*)
    val l = log.select(dataCols.map(col) ++ Seq(
        col(opCol).as("__graft_op"), lit(1).as("__graft_src"),
        col(tsCol).as("__graft_ts"),
        tie.as("__graft_tie")): _*)
    // latest first: log beats base, then ts desc, then tie desc — one
    // row_number over the union picks each key's winner
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__graft_src").desc, col("__graft_ts").desc,
        col("__graft_tie").desc)
    b.unionByName(l)
      .withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1 && col("__graft_op") =!= "D")
      .select(dataCols.map(col): _*)
  }

  /** Checksum reconciliation — the migration/replication audit: bucket
    * both tables by a hash of the key, and per bucket compare row count
    * and an XOR-fold of per-row md5 checksums (XOR is order-invariant
    * and closed in int64, so the fold needs no sort and no widening;
    * any single differing/missing/extra row flips its bucket). The
    * output is `buckets` rows regardless of table size — the audit's
    * exchange carries (bucket, count, fold) partials only, the wordcount
    * shape. Row checksum covers `cols` in the given order with a NUL
    * null sentinel (no real cast("string") produces it).
    *
    * @return (bucket, n_left, n_right, sum_left, sum_right, is_match)
    */
  def checksumReconcile(left: DataFrame, right: DataFrame, keyCol: String,
      cols: Seq[String], buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(cols.nonEmpty, "cols must be non-empty")
    def side(df: DataFrame, n: String, s: String): DataFrame = {
      val payload = concat_ws("|",
        cols.map(c => coalesce(col(c).cast("string"), lit("\u0000graft_null"))): _*)
      df.select(
          pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
            .cast("long"), lit(buckets.toLong)).as("bucket"),
          conv(substring(md5(payload), 1, 15), 16, 10).cast("long").as("__h"))
        .groupBy("bucket")
        .agg(count(lit(1)).as(n), expr("bit_xor(__h)").as(s))
    }
    side(left, "n_left", "sum_left")
      .join(side(right, "n_right", "sum_right"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"),
        coalesce(col("sum_left"), lit(0L)).as("sum_left"),
        coalesce(col("sum_right"), lit(0L)).as("sum_right"))
      .withColumn("is_match",
        col("n_left") === col("n_right") && col("sum_left") === col("sum_right"))
  }

  /** Incremental JOIN maintenance (delta join): given base snapshots L, R
    * and small signed delta batches ΔL, ΔR (weight column `wCol`: +1
    * insert, -1 delete; deletes must re-state rows present in the base),
    * produce the signed delta of the join,
    *   (L+ΔL)⋈(R+ΔR) − L⋈R  =  ΔL⋈R + L⋈ΔR + ΔL⋈ΔR,
    * with output weight = wL·wR (base rows weigh 1) — the bilinearity
    * identity behind differential/incremental view maintenance (Z-sets;
    * Green et al. provenance semirings, DBSP). Downstream aggregates
    * consume it as sum(w·x).
    *
    * Scale shape: the base tables are never joined to each other — each is
    * scanned once against a BROADCAST delta batch (the CDC shape: deltas
    * are MBs while bases are TBs), plus one tiny delta×delta join. At
    * 100 TB this replaces a full base⋈base recompute with two broadcast
    * probes. Base columns must be disjoint; the two key columns may differ
    * in name (kept distinct in the output, as in a plain inner join).
    */
  def deltaJoin(left: DataFrame, deltaLeft: DataFrame, right: DataFrame,
      deltaRight: DataFrame, leftKey: String, rightKey: String,
      wCol: String = "__w"): DataFrame = {
    val dl = deltaLeft.withColumnRenamed(wCol, "__wl")
    val dr = deltaRight.withColumnRenamed(wCol, "__wr")
    val cond = col(leftKey) === col(rightKey)
    val t1 = broadcast(dl).join(right, cond).withColumn("__wr", lit(1L))
    val t2 = left.withColumn("__wl", lit(1L)).join(broadcast(dr), cond)
    val t3 = broadcast(dl).join(dr, cond)
    t1.unionByName(t2).unionByName(t3)
      .withColumn(wCol, col("__wl").cast("long") * col("__wr").cast("long"))
      .drop("__wl", "__wr")
  }

  /** Incremental aggregate maintenance, step 1: collapse a batch to its
    * per-key aggregate STATE — count, DECIMAL-exact sum, min, max of
    * `valueCol`. States are associative: merging two states with
    * [[mergeAggStates]] equals aggregating the concatenated inputs, so a
    * 100-TB rollup is maintained by re-aggregating ONLY each new batch
    * and merging key-cardinality-sized states — the corpus is never
    * rescanned. (The same partial-aggregate algebra Spark uses map-side,
    * lifted to pipeline level.)
    */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol).cast("decimal(28,2)")).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Incremental aggregate maintenance, step 2: merge two aggregate
    * states on `keys` (null-safe, so null-key groups merge too). One
    * state-sized full-outer join — the delta side is typically tiny and
    * broadcast by AQE. Derived measures (avg = sum/n) belong AFTER the
    * merge, never in the state: only the raw algebra is associative.
    */
  def mergeAggStates(base: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val d = keys.foldLeft(delta) { (df, k) => df.withColumnRenamed(k, s"__d_$k") }
      .withColumnRenamed("n", "__d_n").withColumnRenamed("sum_v", "__d_sum_v")
      .withColumnRenamed("min_v", "__d_min_v").withColumnRenamed("max_v", "__d_max_v")
    val cond = keys.map(k => col(k) <=> col(s"__d_$k")).reduce(_ && _)
    base.join(d, cond, "full_outer")
      .select(keys.map(k => coalesce(col(k), col(s"__d_$k")).as(k)) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__d_n"), lit(0L))).as("n"),
        (coalesce(col("sum_v"), lit(0).cast("decimal(28,2)")) +
          coalesce(col("__d_sum_v"), lit(0).cast("decimal(28,2)"))).as("sum_v"),
        least(col("min_v"), col("__d_min_v")).as("min_v"),
        greatest(col("max_v"), col("__d_max_v")).as("max_v")): _*)
  }

  /** Retractable grouped aggregate — incremental view maintenance with
    * DELETES: the CDC log carries a signed weight (+1 insert, −1
    * retraction of a previously-counted row) and the maintained
    * (count, sum) state absorbs it as Σw and Σw·v. Groups whose count
    * reaches zero leave the view (the Z-set convention [[deltaJoin]]
    * already uses for joins — this is its aggregate half; min/max are
    * NOT retractable and belong to [[mergeAggStates]]'s insert-only
    * contract).
    *
    * Scale shape: the delta batch aggregates map-side to per-key signed
    * partials, then one full-outer merge on the group key — base rows
    * never rescan. Sums ride exact DECIMAL so retract-then-reinsert is
    * bit-stable.
    *
    * @param deltas (keys…, weightCol ∈ {+1, −1}, valueCol)
    */
  def applySignedDeltas(base: DataFrame, deltas: DataFrame,
      keys: Seq[String], weightCol: String, valueCol: String): DataFrame = {
    val dAgg = deltas.groupBy(keys.map(col): _*)
      .agg(sum(col(weightCol).cast("long")).as("n"),
        sum(col(weightCol).cast("decimal(4,0)") *
          col(valueCol).cast("decimal(24,2)")).as("sum_v"))
    val d = keys.foldLeft(dAgg) { (df, k) => df.withColumnRenamed(k, s"__d_$k") }
      .withColumnRenamed("n", "__d_n").withColumnRenamed("sum_v", "__d_sum_v")
    val cond = keys.map(k => col(k) <=> col(s"__d_$k")).reduce(_ && _)
    base.join(d, cond, "full_outer")
      .select(keys.map(k => coalesce(col(k), col(s"__d_$k")).as(k)) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__d_n"), lit(0L))).as("n"),
        (coalesce(col("sum_v"), lit(0).cast("decimal(28,2)")) +
          coalesce(col("__d_sum_v"), lit(0).cast("decimal(28,2)"))
            .cast("decimal(28,2)")).as("sum_v")): _*)
      .where(col("n") > 0L)
  }

  /** Snapshot-as-of (time travel) reconstructed from a keyed CDC log —
    * the Delta/Iceberg `VERSION AS OF` semantic without a table format:
    * the state of a table at version V is, per key, the LATEST log entry
    * with version ≤ V (an `upsert` contributes its payload, a `delete`
    * removes the key), falling back to the base snapshot for keys the
    * filtered log never touches.
    *
    * Scale shape: the version predicate is a plain comparison pushed to
    * the log scan (version/date IS the log's partition column in a real
    * deployment, so time travel prunes files); the per-key winner is ONE
    * map-side-combinable `max(struct(version, op, payload…))` aggregate —
    * never a window sort — and the base is touched by exactly one
    * anti-join on the (delta-sized) touched-key set, with AQE free to
    * broadcast it. Base rows move at most once; the log moves once.
    *
    * Determinism contract: at most one log row per (key, version) —
    * the struct-max then orders on the version alone. (A production log
    * gets this from its transaction sequencing; enforce upstream with
    * keepFirst if a feed can duplicate.)
    *
    * @param ops    (opCol value) `'u'` upsert / `'d'` delete
    * @return base-shaped rows (keys… ++ valueCols) as of `asOfVersion`
    */
  /** CDC log compaction at ONE watermark (r15 form): every entry at or
    * below `watermark` folds into a new materialized base and the log
    * truncates to `v > watermark`. Kept as the common single-checkpoint
    * call; see the boundary-list overload for tiered retention.
    */
  def compactLog(base: DataFrame, log: DataFrame, keys: Seq[String],
      versionCol: String, opCol: String, valueCols: Seq[String],
      watermark: Long): (DataFrame, DataFrame) =
    compactLog(base, log, keys, versionCol, opCol, valueCols, Seq(watermark))

  /** CDC log compaction at a LIST of retained version boundaries
    * B1 < … < Bn (r16 — e.g. daily snapshots for a week, then weekly):
    * the retention/checkpoint operation that keeps [[snapshotAsOf]]'s
    * replay cost bounded as a 100 TB log grows without end.
    *
    *  - the new base is one [[snapshotAsOf]] at B1 (per-key struct-max
    *    winner + delta-sized anti-join, never a window over the log);
    *  - each band (Bi, Bi+1] keeps ONE entry per touched key — the
    *    band's struct-max winner, re-emitted at its own version. Max of
    *    band-maxes is the global max, so replay AT any retained
    *    boundary is exact;
    *  - entries above Bn pass through verbatim (the full-fidelity
    *    tail), so every version after the newest boundary stays
    *    reachable.
    *
    * Invariant (spec-gated): for every retained boundary Bi — and every
    * V >= Bn — `snapshotAsOf(newBase, newLog, …, V)` equals the replay
    * from the ORIGINAL base + full log. History below B1 is gone, and
    * history strictly INSIDE a band is quantized to the band winner —
    * that is the point of retention; pick boundaries at the versions
    * consumers may still time-travel to.
    *
    * One hash aggregate keyed (key, band) + two pushed-down version
    * filters; the band expression is a plan-time literal CASE, so a
    * version-banded log layout prunes whole partitions (the
    * TimeTravelSpec pruning contract).
    *
    * @return (compacted base, compacted log)
    */
  def compactLog(base: DataFrame, log: DataFrame, keys: Seq[String],
      versionCol: String, opCol: String, valueCols: Seq[String],
      boundaries: Seq[Long]): (DataFrame, DataFrame) = {
    require(boundaries.nonEmpty, "compactLog needs at least one boundary")
    require(boundaries.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      s"boundaries must be strictly increasing: $boundaries")
    val b1 = boundaries.head
    val bn = boundaries.last
    val v = col(versionCol)
    val newBase = snapshotAsOf(base, log, keys, versionCol, opCol,
      valueCols, b1)
    val tail = log.where(v > bn)
    val newLog =
      if (boundaries.size == 1) tail
      else {
        val logCols = log.columns.toSeq
        val vType = log.schema(versionCol).dataType
        // band = index of the smallest retained boundary >= v, for rows
        // in (B1, Bn] — a literal CASE chain, foldable and pushable
        val bandCol = boundaries.tail.zipWithIndex
          .foldLeft(Option.empty[org.apache.spark.sql.Column]) {
            case (acc, (b, i)) =>
              Some(acc.map(_.when(v <= b, lit(i + 1)))
                .getOrElse(when(v <= b, lit(i + 1))))
          }.get
        val winners = log.where(v > b1 && v <= bn)
          .withColumn("__band", bandCol)
          .groupBy((keys.map(col) :+ col("__band")): _*)
          .agg(max(struct(
            (v.cast("long").as("__v") +: col(opCol).as("__op") +:
              valueCols.map(col)): _*)).as("__w"))
          .select(keys.map(col) ++ Seq(
            col("__w.__v").cast(vType).as(versionCol),
            col("__w.__op").as(opCol)) ++
            valueCols.map(c => col(s"__w.$c").as(c)): _*)
          .select(logCols.map(col): _*)
        winners.unionByName(tail.select(logCols.map(col): _*))
      }
    (newBase, newLog)
  }

  def snapshotAsOf(base: DataFrame, log: DataFrame, keys: Seq[String],
      versionCol: String, opCol: String, valueCols: Seq[String],
      asOfVersion: Long): DataFrame = {
    val winners = log
      .where(col(versionCol) <= asOfVersion)
      .groupBy(keys.map(col): _*)
      .agg(max(struct(
        (col(versionCol).cast("long").as("__v") +: col(opCol).as("__op") +:
          valueCols.map(col)): _*)).as("__w"))
    val touched = winners.select(
      keys.map(col) ++ Seq(col("__w.__op").as("__op")) ++
        valueCols.map(c => col(s"__w.$c").as(c)): _*)
    base.select((keys ++ valueCols).map(col): _*)
      .join(touched.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(touched.where(col("__op") === "u")
        .select((keys ++ valueCols).map(col): _*))
  }
}
