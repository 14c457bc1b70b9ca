package graft.ops

import graft.SparkSpec
import graft.ext.Dedup
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** Round-3 operator additions: winsorize, pivot/melt, bloom-pruned join,
  * near-dup clustering, custom-state sessionization.
  */
class ReshapeJoinsPreprocessSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clamps to the exact [pLo, pHi] quantiles, nulls pass through") {
    // 1..100: p05 = 5.95, p95 = 95.05 (linear-interpolated)
    val df = ((1 to 100).map(i => Some(i.toDouble)) :+ None).toDF("v")
    val w = Preprocess.winsorize(df, Seq("v"), 0.05, 0.95)
    val vals = doubles(w, "v")
    assert(vals.count(_.isEmpty) == 1)
    val defined = vals.flatten
    assert(approx(defined.min, 5.95) && approx(defined.max, 95.05))
    // interior values unchanged
    assert(defined.count(v => approx(v, 50.0)) == 1)
    // everything below p05 clamps UP to p05 (values 1..5 -> 5.95)
    assert(defined.count(v => approx(v, 5.95)) == 5)
  }

  test("exactQuantiles matches quantile_cont semantics incl. duplicates") {
    // sorted multiset [1,1,2,10]: h(0.5) = 1.5 -> 1 + 0.5*(2-1) = 1.5
    val df = Seq(1.0, 1.0, 2.0, 10.0).toDF("x")
    val q = Clean.exactQuantiles(df, Seq("x"), Seq(0.0, 0.5, 1.0)).head()
    assert(approx(q.getDouble(1), 1.0) && approx(q.getDouble(2), 1.5)
      && approx(q.getDouble(3), 10.0))
  }

  test("pivotCounts: absent combos are 0 and counts match a groupBy") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y")).toDF("r", "c")
    val p = Reshape.pivotCounts(df, "r", "c", Seq("x", "y", "z"))
      .orderBy("r").collect()
    assert(p.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      == Seq(("a", 2L, 1L, 0L), ("b", 0L, 1L, 0L)))
  }

  test("melt folds columns into long form without shuffling row counts") {
    val df = Seq((1L, 2.0, 3.0), (2L, 4.0, 5.0)).toDF("id", "a", "b")
    val m = Reshape.melt(df, Seq("id"), Seq("a", "b"))
    assert(m.count() == 4)
    assert(m.where(col("variable") === "a" && col("id") === 2L)
      .head().getDouble(2) == 4.0)
  }

  test("bloomPrunedJoin returns exactly the plain join result") {
    val probe = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "pv")
    val build = (0L to 96L by 7).map(i => (i, s"b$i")).toDF("k", "bv")
    val plain = probe.join(build, Seq("k")).orderBy("k", "pv").collect()
    val bloomed = Joins.bloomPrunedJoin(probe, build, Seq("k"), expectedItems = 100)
      .orderBy("k", "pv").collect()
    assert(bloomed.toSeq == plain.toSeq)
  }

  test("clusterNearDups: transitive chain merges, singleton keeps own id") {
    // pairs: 1-2, 2-3 (chain), 7-8; docs 1..9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val ids = (1L to 9L).toDF("doc_id")
    val out = Dedup.clusterNearDups(pairs, ids, "doc_id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("hashSample is a deterministic row-level filter (re-run identical, rate close)") {
    val df = (1L to 10000L).toDF("id")
    val a = Sampling.hashSample(df, "id", 100).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df.repartition(7), "id", 100)
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // partitioning-independent
    assert(math.abs(a.size - 1000) < 150) // ~10% ± sampling noise
  }

  test("stratifiedExact takes exactly floor(frac*n) rows per stratum") {
    val df = (1L to 1000L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "k")
    val s = Sampling.stratifiedExact(df, Seq("k"), "id", 0.25)
    val counts = s.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == 333 / 4 && counts("b") == 667 / 4)
    // deterministic under re-partitioning
    val s2 = Sampling.stratifiedExact(df.repartition(5), Seq("k"), "id", 0.25)
    assert(s.collect().map(_.getLong(0)).toSet == s2.collect().map(_.getLong(0)).toSet)
  }

  test("quantileBucketize: quartile buckets are balanced and edge-inclusive") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val b = Preprocess.quantileBucketize(df, Seq("v"))
    val counts = b.groupBy("v_bucket").count().orderBy("v_bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // edges 25.75/50.5/75.25 -> buckets of 25, 25, 25, 25
    assert(counts == Seq(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L))
    // null in -> null bucket
    val withNull = (Seq(Some(1.0), None)).toDF("v")
    val nb = Preprocess.quantileBucketize(withNull, Seq("v"))
    assert(nb.where(col("v").isNull).head().isNullAt(1))
  }

  test("topKPerGroupAgg equals the window top-k and plans without a Window sort") {
    val orders = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val viaAgg = Joins.topKPerGroupAgg(orders, Seq("o_orderstatus"),
      "o_totalprice", "o_orderkey", 3)
      .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_orderstatus", "rn").collect().toSeq
    val viaWindow = Joins.topKPerGroup(
      orders.select("o_orderstatus", "o_orderkey", "o_totalprice"),
      Seq("o_orderstatus"), Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_orderstatus", "rn").collect().toSeq
    assert(viaAgg == viaWindow)
    val plan = Joins.topKPerGroupAgg(orders, Seq("o_orderstatus"),
      "o_totalprice", "o_orderkey", 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"agg top-k must not window-sort:\n$plan")
  }

  test("quantizeInt8: dequantized cosine stays within 2% of exact") {
    import graft.ext.Similarity
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getSeq[Int](3))))
      .toMap
    val exact = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val ids = exact.keys.toSeq.sorted.take(10)
    for (i <- ids; j <- ids if i < j) {
      val deq = (id: Long) => {
        val (lo, hi, codes) = q(id)
        codes.map(c => lo + c * (hi - lo) / 255.0)
      }
      val ce = cos(exact(i), exact(j))
      val cq = cos(deq(i), deq(j))
      assert(math.abs(ce - cq) < 0.02, s"pair ($i,$j): exact=$ce quant=$cq")
    }
  }

  test("applyNearDupDedup keeps exactly the min-id representative per cluster") {
    import graft.ext.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (10L, base), (11L, base + " ok"), (12L, base + " yes"), // one cluster -> keep 10
      (20L, "completely different text about spark catalyst optimizer internals plans")
    ).toDF("doc_id", "text")
    val kept = Dedup.applyNearDupDedup(docs, "text", "doc_id", threshold = 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 20L), s"kept=$kept")
  }

  test("plan: hashSample is a pure filter — no Exchange, no Sort") {
    // Tables.load may itself carry the single-row-group fan-out exchange;
    // the property under test is that hashSample ADDS none on top of its
    // input, so count exchanges relative to the raw input plan.
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    def n(p: String, tok: String) = tok.r.findAllIn(p).length
    val base = df.queryExecution.executedPlan.toString
    val plan = Sampling.hashSample(df, "o_orderkey", 100)
      .queryExecution.executedPlan.toString
    assert(n(plan, "Exchange") == n(base, "Exchange") &&
      n(plan, "Sort") == n(base, "Sort"),
      s"hashSample must stay shuffle-free:\n$plan")
  }

  test("plan: q_tpch_q6 predicates reach the parquet scan as PushedFilters") {
    val q6 = graft.SparkEntry.queries("q_tpch_q6")(spark, "/root/testdata/sf0.001")
    val scan = q6.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_shipdate")
      && scan.contains("l_quantity"), s"expected pushed filters in scan:\n$scan")
  }

  test("plan: q_tpch_q3 top-10 is TakeOrdered (no global sort) with pushed date filters") {
    val q3 = graft.SparkEntry.queries("q_tpch_q3")(spark, "/root/testdata/sf0.001")
    val plan = q3.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$plan")
    val scans = q3.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.exists(s => s.contains("lineitem") && s.contains("PushedFilters")
      && s.contains("l_shipdate")), "l_shipdate filter not pushed to the lineitem scan")
  }

  test("plan: bloomPrunedJoin filters the probe side BEFORE its exchange") {
    val probe = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val build = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .where(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val joined = Joins.bloomPrunedJoin(probe, build, Seq("l_orderkey"))
    // the bloom UDF must run AT THE PROBE SCAN (as a DataFilter), i.e.
    // before any exchange — printed as UDF(l_orderkey...) in the leaf
    val leaves = joined.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val probeScan = leaves.find(_.contains("lineitem"))
    assert(probeScan.exists(s => s.contains("DataFilters") && s.contains("UDF(")),
      s"bloom filter not at the probe scan:\n${leaves.mkString("\n---\n")}")
  }

  test("stateful sessionization equals the session_window path on real events") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val a = EventsStream.sessionStats(ev, "30 minutes")
      .orderBy("user_id", "session_start").collect().toSeq
    val b = EventsStream.sessionStatsStateful(ev, 30).toDF()
      .orderBy("user_id", "session_start").collect().toSeq
    assert(a.size == b.size)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0) && x.getLong(1) == y.getLong(1)
        && x.getLong(2) == y.getLong(2) && approx(x.getDouble(3), y.getDouble(3), 1e-6))
    }
  }
}
