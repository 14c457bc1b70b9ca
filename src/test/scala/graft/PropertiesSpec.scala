package graft

import graft.ops.{Clean, Eda, Harmonize, Preprocess}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven invariants (SURVEY §5.3). Cases are sampled
  * with fixed seeds (deterministic CI) and kept to a handful per property —
  * each case runs a Spark job.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int = 5): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)))

  private val vecGen: Gen[List[Option[Double]]] =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.const(Option.empty[Double]),
      Gen.chooseNum(-1000.0, 1000.0).map(v => Some(math.rint(v * 100) / 100))))

  test("interpolate: output has no nulls iff at least one non-null exists") {
    cases(vecGen).foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("idx", "v")
      val out = doubles(Clean.interpolate(df, Seq("v"), "idx").orderBy("idx"), "v")
      if (xs.exists(_.isDefined)) assert(out.forall(_.isDefined), s"input=$xs out=$out")
      else assert(out.forall(_.isEmpty))
    }
  }

  test("interpolate: non-null inputs pass through unchanged") {
    cases(vecGen).foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("idx", "v")
      val out = doubles(Clean.interpolate(df, Seq("v"), "idx").orderBy("idx"), "v")
      xs.zip(out).foreach { case (in, o) => if (in.isDefined) assert(o == in) }
    }
  }

  test("exactQuantiles equals the sorted-multiset linear-interpolation reference") {
    val valGen: Gen[List[Double]] = Gen.nonEmptyListOf(
      Gen.chooseNum(-100.0, 100.0).map(v => math.rint(v * 10) / 10)) // dups likely
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    def ref(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val h = (s.size - 1) * p
      val j = math.floor(h).toInt
      val v0 = s(j); val v1 = s(math.ceil(h).toInt)
      v0 + (h - j) * (v1 - v0)
    }
    cases(valGen).foreach { xs =>
      val df = xs.toDF("v")
      val row = Clean.exactQuantiles(df, Seq("v"), probs).head()
      probs.zipWithIndex.foreach { case (p, i) =>
        assert(approx(row.getDouble(i + 1), ref(xs, p), 1e-9),
          s"p=$p xs=$xs got=${row.getDouble(i + 1)} want=${ref(xs, p)}")
      }
    }
  }

  test("rangeJoinBinned equals the direct range-predicate join on random intervals") {
    val g = for {
      n <- Gen.chooseNum(5, 30)
      pts <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 10000L)))
      ivs <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 9000L),
        Gen.chooseNum(1L, 3000L)))
    } yield (pts, ivs)
    cases(g, n = 4).foreach { case (pts, ivs) =>
      def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision here
      val points = pts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t * 1000)) }
        .toDF("pid", "k", "ts")
      val intervals = ivs.zipWithIndex
        .map { case ((k, lo, len), i) => (i.toLong, k, ts(lo * 1000), ts((lo + len) * 1000)) }
        .toDF("iid", "k", "lo", "hi")
      val binned = graft.ops.Joins.rangeJoinBinned(intervals, "lo", "hi",
        points, "ts", Seq("k"), binSeconds = 2)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val direct = intervals.join(points, Seq("k"))
        .where(col("ts") >= col("lo") && col("ts") < col("hi"))
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == direct, s"binned=$binned direct=$direct")
    }
  }

  test("intervalOverlapJoin equals the direct overlap join, duplicates included") {
    val g = for {
      n <- Gen.chooseNum(5, 25)
      as <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 9000L),
        Gen.chooseNum(1L, 5000L)))
      bs <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 9000L),
        Gen.chooseNum(1L, 5000L)))
    } yield (as, bs)
    cases(g, n = 4).foreach { case (as, bs) =>
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      val a = as.zipWithIndex
        .map { case ((k, lo, len), i) => (i.toLong, k, ts(lo), ts(lo + len)) }
        .toDF("aid", "k", "a_lo", "a_hi")
      val b = bs.zipWithIndex
        .map { case ((k, lo, len), i) => (i.toLong, k, ts(lo), ts(lo + len)) }
        .toDF("bid", "k", "b_lo", "b_hi")
      // intervals span many 2-second grid cells -> the canonical-cell
      // dedup is exercised hard; compare as SORTED SEQS so a duplicated
      // pair (the bug the canonical cell prevents) fails the test
      val gridded = graft.ops.Joins.intervalOverlapJoin(a, "a_lo", "a_hi",
          b, "b_lo", "b_hi", Seq("k"), binSeconds = 2)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
      val direct = a.join(b, Seq("k"))
        .where(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
      assert(gridded == direct, s"gridded=$gridded direct=$direct")
    }
  }

  test("intervalOverlapJoin plans as an equi-join, never a nested loop") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val a = Seq((1L, 0L, ts(0), ts(100))).toDF("aid", "k", "a_lo", "a_hi")
    val b = Seq((1L, 0L, ts(50), ts(150))).toDF("bid", "k", "b_lo", "b_hi")
    val plan = graft.ops.Joins.intervalOverlapJoin(a, "a_lo", "a_hi",
      b, "b_lo", "b_hi", Seq("k"), binSeconds = 60)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }

  test("zscore: |mean| < eps and population std is 0 or 1") {
    cases(vecGen.map(_.flatten).suchThat(_.size > 1)).foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("idx", "v")
      val z = Preprocess.zscore(df, Seq("v"))
      val r = z.agg(avg("v"), stddev_pop("v")).head()
      assert(math.abs(r.getDouble(0)) < 1e-6)
      val sd = r.getDouble(1)
      assert(approx(sd, 0.0, 1e-6) || approx(sd, 1.0, 1e-6))
    }
  }

  test("label encoding: codes are a bijection onto 0..n-1 in lexicographic order") {
    cases(Gen.nonEmptyListOf(Gen.alphaStr.map(_.take(6)))).foreach { xs =>
      val df = xs.zipWithIndex.map { case (s, i) => (i, s) }.toDF("idx", "s")
      val enc = Preprocess.labelEncode(df, "s", "code")
      val pairs = enc.select("s", "code").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
      assert(pairs.map(_._2) == pairs.indices.map(_.toLong))
    }
  }

  test("histogram: counts sum to the non-null row count") {
    cases(vecGen).foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("idx", "v")
      val nonNull = xs.count(_.isDefined)
      if (nonNull > 0) {
        val total = Eda.histogram(df, "v", 7).agg(sum("cnt")).head().getLong(0)
        assert(total == nonNull.toLong, s"input=$xs")
      }
    }
  }

  test("union-by-name: row count is the sum of inputs, any column order") {
    cases(Gen.zip(Gen.chooseNum(1, 30), Gen.chooseNum(1, 30))).foreach { case (n, m) =>
      val a = (1 to n).map(i => (i, s"a$i")).toDF("k", "x")
      val b = (1 to m).map(i => (i.toDouble, i)).toDF("y", "K")
      val u = Harmonize.unionByName(Seq(a, b))
      assert(u.count() == (n + m).toLong)
      assert(u.columns.toSet == Set("k", "x", "y"))
    }
  }

  test("asof join equals a per-row scan reference on random inputs") {
    import graft.ops.Joins
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 100L))),
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 100L))))
    cases(gen, n = 4).foreach { case (probeRaw, refRaw) =>
      // unique (key, t) per side — as-of semantics assume a time ordering
      val probes = probeRaw.distinct.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t * 1000) }
      val refs = refRaw.distinct.map { case (k, t) => (k, t * 1000 + 1, t.toDouble) }
      val p = probes.toDF("pid", "k", "t")
      val r = refs.toDF("k", "t", "rv")
      val got = Joins.asof(p, r, Seq("k"), "t", Seq("rv")).collect()
        .map(row => row.getLong(0) -> (if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toMap
      probes.foreach { case (pid, k, t) =>
        val expected = refs.filter(x => x._1 == k && x._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        assert(got(pid) == expected, s"pid=$pid k=$k t=$t refs=$refs")
      }
    }
  }

  test("asofForward equals a per-row scan reference on random inputs") {
    import graft.ops.Joins
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 100L))),
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 100L))))
    cases(gen, n = 4).foreach { case (probeRaw, refRaw) =>
      val probes = probeRaw.distinct.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t * 1000) }
      val refs = refRaw.distinct.map { case (k, t) => (k, t * 1000 + 1, t.toDouble) }
      val p = probes.toDF("pid", "k", "t")
      val r = refs.toDF("k", "t", "rv")
      val got = Joins.asofForward(p, r, Seq("k"), "t", Seq("rv")).collect()
        .map(row => row.getLong(0) -> (if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toMap
      probes.foreach { case (pid, k, t) =>
        val expected = refs.filter(x => x._1 == k && x._2 >= t)
          .sortBy(_._2).headOption.map(_._3)
        assert(got(pid) == expected, s"pid=$pid k=$k t=$t refs=$refs")
      }
    }
  }

  test("corr matrix values are within [-1, 1] and pairs are i<j only") {
    val df = (1 to 40).map(i => (i.toDouble, math.sin(i.toDouble), i % 7.0)).toDF("a", "b", "c")
    val m = Eda.corrMatrix(df, Seq("a", "b", "c")).collect()
    assert(m.length == 3)
    m.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("weightedQuantilesBy equals the brute-force sorted cumulative-weight scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(200)((rnd.nextInt(20).toDouble, (rnd.nextInt(9) + 1).toDouble))
    val probs = Seq(0.1, 0.5, 0.9)
    val out = graft.ops.Clean.weightedQuantilesBy(
      data.toDF("v", "w"), "v", "w", Nil, probs).head()
    // reference: smallest v whose cumulative weight reaches p * W
    val sorted = data.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val total = sorted.map(_._2).sum
    val cums = sorted.scanLeft(0.0)(_ + _._2).tail.zip(sorted.map(_._1))
    probs.zipWithIndex.foreach { case (p, i) =>
      val expect = cums.collectFirst { case (c, v) if c >= p * total => v }.get
      assert(out.getDouble(i) == expect, s"p=$p")
    }
  }

  test("clusterNearDups equals a driver-side union-find on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(2, 50)
      m <- Gen.chooseNum(0, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong - 1)
        b <- Gen.chooseNum(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges
    cases(edgeGen, n = 6).foreach { edges =>
      val nodes = (0L until 50L).toList
      // reference: plain union-find with min-label roots
      val parent = scala.collection.mutable.Map(nodes.map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      val expected = nodes.map(i => i -> find(i)).toMap
      val pairsDf = (if (edges.isEmpty) Seq((0L, 0L)) else edges).toDF("id_a", "id_b")
      // BOTH code paths must agree with the reference: the distributed
      // label-prop loop (driverEdgeLimit = 0) and the small-graph driver
      // union-find fast path (default limit)
      Seq(0L, 1000000L).foreach { lim =>
        val got = graft.ext.Dedup.clusterNearDups(pairsDf, nodes.toDF("doc_id"),
            "doc_id", driverEdgeLimit = lim)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"driverEdgeLimit=$lim edges=$edges\nmismatch: ${
          got.toSeq.filter { case (k, v) => expected(k) != v }.take(5)}")
      }
    }
  }
  // ---- round-11 operator invariants ------------------------------------

  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).map(_.take(12))

  test("segmentWord: pieces always reassemble the word, never empty pieces") {
    val vocab = Set("sc", "an", "scan", "win", "dow", "ab", "q")
    cases(Gen.listOfN(8, wordGen), n = 6).foreach { ws =>
      ws.foreach { w =>
        val pieces = graft.ext.Tokenize.segmentWord(w, vocab, 4)
        assert(pieces.mkString == w, s"$w -> $pieces")
        assert(pieces.forall(_.nonEmpty))
      }
    }
  }

  test("sStem never lengthens a word and is idempotent on this generator") {
    val stemmed = (w: String) => Seq(w).toDF("w")
      .select(graft.ext.TextAnalysis.sStem(col("w"))).head().getString(0)
    cases(Gen.listOfN(10, wordGen), n = 4).foreach { ws =>
      val df = ws.toDF("w")
      val out = df.select(col("w"),
          graft.ext.TextAnalysis.sStem(col("w")).as("s"))
        .collect().map(r => r.getString(0) -> r.getString(1))
      out.foreach { case (w, st) =>
        assert(st.length <= w.length, s"$w -> $st")
      }
    }
    // idempotence on the suffix-rich fixed set (the property the guard
    // structure implies: every rule output ends in y/e/<non-s> or is
    // guard-protected)
    for (w <- Seq("stories", "classes", "windows", "goes", "bus", "ties"))
      assert(stemmed(stemmed(w)) == stemmed(w), s"not idempotent on $w")
  }

  test("CMS estimates dominate exact counts on generated corpora") {
    val docGen = Gen.listOfN(6, Gen.listOfN(8,
      Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.mkString(" ")))
    cases(docGen, n = 3).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val est = graft.ext.Sketches.countMinEstimates(df, "text",
        depth = 4, width = 8).collect()
      est.foreach(r => assert(r.getLong(2) >= r.getLong(1), s"CMS under: $r"))
    }
  }

  test("splitByHash: partition is exact and leakage of self-pairs is zero") {
    cases(Gen.listOfN(30, Gen.chooseNum(1L, 100000L)), n = 4).foreach { ids0 =>
      val ids = ids0.distinct
      val df = ids.toDF("id")
      val (tr, te) = graft.ops.Sampling.splitByHash(df, "id", 800)
      val trs = tr.collect().map(_.getLong(0)).toSet
      val tes = te.collect().map(_.getLong(0)).toSet
      assert((trs & tes).isEmpty && (trs | tes) == ids.toSet)
      // a pair of identical ids can never cross the split
      val self = ids.map(i => (i, i)).toDF("id_a", "id_b")
      val r = graft.ops.Sampling.splitLeakage(self, "id_a", "id_b", 800).head()
      assert(r.getLong(1) == 0L)
    }
  }

}
