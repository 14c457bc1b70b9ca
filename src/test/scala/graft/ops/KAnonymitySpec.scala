package graft.ops

import graft.SparkSpec

class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("us", "gold"), ("us", "gold"), ("us", "gold"),
    ("us", "silver"), ("us", "silver"),
    ("de", "gold")).toDF("country", "tier")

  test("kAnonymityViolations reports only classes below k with risk") {
    val v = Quality.kAnonymityViolations(df, Seq("country", "tier"), k = 3)
      .orderBy("country", "tier").collect()
    assert(v.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("de", "gold", 1L), ("us", "silver", 2L)))
    assert(v.map(_.getDouble(3)).toSeq == Seq(1.0, 0.5))
  }

  test("kAnonymitySummary: achieved k, class counts, rows at risk") {
    val s = Quality.kAnonymitySummary(df, Seq("country", "tier"), k = 3).head()
    assert(s.getLong(0) == 1L) // achieved k
    assert(s.getLong(1) == 3L) // classes
    assert(s.getLong(2) == 2L) // violating classes
    assert(s.getLong(3) == 3L) // rows at risk
  }

  test("deletionCascade chains semi-joins and reports the blast radius") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("ck", "name")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("ok", "ck")
    val li = Seq((10L, 1), (10L, 2), (12L, 1), (99L, 1)).toDF("ok", "ln")
    val out = Quality.deletionCascade(
      cust.where($"ck" === 1L).select("ck"),
      Seq(
        Quality.CascadeLevel("cust", cust, "ck", Some("ck")),
        Quality.CascadeLevel("ord", ord, "ck", Some("ok")),
        Quality.CascadeLevel("li", li, "ok", None)))
      .orderBy("level").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // customer 1 -> orders 10, 11 -> lineitems of order 10 (2 rows)
    assert(out.toSeq == Seq(("cust", 3L, 1L), ("ord", 3L, 2L), ("li", 4L, 2L)))
  }

  test("linkageScore: FS weights select by agreement, pattern tracks fields") {
    val pairs = Seq(
      (1L, 1L, "a", "a", 5, 5), // both agree
      (1L, 2L, "a", "b", 5, 5), // name disagrees
      (1L, 3L, "a", "b", 5, 6)  // both disagree
    ).toDF("lid", "rid", "ln", "rn", "lv", "rv")
    val scored = Harmonize.linkageScore(pairs, Seq(
        Harmonize.FsField("n", $"ln" === $"rn", 0.9, 0.1),
        Harmonize.FsField("v", $"lv" === $"rv", 0.8, 0.2)))
      .orderBy("rid").collect()
    val wN = math.log(0.9 / 0.1); val wNd = math.log(0.1 / 0.9)
    val wV = math.log(0.8 / 0.2); val wVd = math.log(0.2 / 0.8)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(scored.map(_.getString(6)).toSeq == Seq("11", "01", "00"))
    assert(approx(scored(0).getDouble(7), r6(wN + wV), 1e-6))
    assert(approx(scored(1).getDouble(7), r6(wNd + wV), 1e-6))
    assert(approx(scored(2).getDouble(7), r6(wNd + wVd), 1e-6))
    // higher agreement always outranks lower
    assert(scored(0).getDouble(7) > scored(1).getDouble(7))
    assert(scored(1).getDouble(7) > scored(2).getDouble(7))
  }

  test("ohlc: open/close follow (ts, tie) order, high/low are extremes") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-05 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val df = Seq(
      ("a", ts(1), 5.0, 1L), ("a", ts(2), 9.0, 2L), ("a", ts(3), 2.0, 3L),
      // equal timestamps: the tie column decides open (id 4) and close (id 5)
      ("b", ts(1), 7.0, 4L), ("b", ts(1), 3.0, 5L)).toDF("k", "ts", "v", "id")
    val out = Resample.ohlc(df, "k", "ts", "v", "id")
      .orderBy("key").collect()
    val a = out(0); val b = out(1)
    assert((a.getDouble(2), a.getDouble(3), a.getDouble(4), a.getDouble(5), a.getLong(6)) ==
      ((5.0, 9.0, 2.0, 2.0, 3L)))
    assert((b.getDouble(2), b.getDouble(5)) == ((7.0, 3.0)))
  }

  test("readParquetMerged surfaces columns missing from older batches as null") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/b=0")
    Seq((2L, "y", 9L)).toDF("id", "a", "extra").write.parquet(s"$dir/b=1")
    val out = graft.sources.Sources.readParquetMerged(spark, dir)
      .select("id", "a", "extra").orderBy("id").collect()
    assert(out(0).isNullAt(2) && out(1).getLong(2) == 9L)
  }

  test("a k-anonymous table yields no violations") {
    val ok = df.where($"country" === "us" && $"tier" === "gold")
    assert(Quality.kAnonymityViolations(ok, Seq("country", "tier"), 3).count() == 0)
    val s = Quality.kAnonymitySummary(ok, Seq("country", "tier"), 3).head()
    assert(s.getLong(0) == 3L && s.getLong(2) == 0L)
  }
  test("splitLeakage flags exactly the pairs whose hash sides differ") {
    val ids = (1L to 40L).toDF("id")
    val (tr, te) = Sampling.splitByHash(ids, "id", trainPerMille = 800)
    val train = tr.collect().map(_.getLong(0)).toSet
    val test = te.collect().map(_.getLong(0)).toSet
    assert(train.size >= 2 && test.size >= 2, s"need both sides: $test")
    val t = train.toSeq.sorted; val v = test.toSeq.sorted
    val pairs = Seq(
      (t(0), t(1)), // within train
      (t(0), v(0)), // leaking
      (v(0), v(1))  // within test
    ).toDF("id_a", "id_b")
    val r = Sampling.splitLeakage(pairs, "id_a", "id_b", 800).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(approx(r.getDouble(2), 1.0 / 3.0, 1e-6))
    // empty pair set: zero counts, null rate — no division blow-up
    val empty = Sampling.splitLeakage(pairs.limit(0), "id_a", "id_b", 800).head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(2))
  }

  test("splitByCluster: near-dup pairs can never straddle the split (leak rate 0 by construction)") {
    import org.apache.spark.sql.functions.col
    // pair graph 1-2, 2-3 (one cluster), 10-11 (another); 20 singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val all = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val labels = graft.ext.Dedup.clusterNearDups(pairs, all, "doc_id")
    val split = Sampling.splitByCluster(labels, "id", "cluster_id", 800)
    val m = split.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // every cluster member shares its cluster's membership bit
    assert(m(1L)._2 == m(2L)._2 && m(2L)._2 == m(3L)._2)
    assert(m(10L)._2 == m(11L)._2)
    // and the audit over the pair set reads zero leakage
    val audited = Sampling.splitLeakage(
      pairs.join(split.select(col("id").as("id_a"), col("cluster_id").as("__ca")), Seq("id_a"))
        .select(col("__ca").as("id_a"),
          col("id_b")) // leakage on CLUSTER keys: both endpoints hash their label
        .join(split.select(col("id").as("id_b"), col("cluster_id").as("__cb")), Seq("id_b"))
        .select(col("id_a"), col("__cb").as("id_b")),
      "id_a", "id_b", 800).head()
    assert(audited.getLong(1) == 0L, s"cluster split must not leak: $audited")
  }

}
