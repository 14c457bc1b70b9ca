package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r16 source features: metadata-only aggregate pushdown and per-column
  * Bloom sidecars, plus the NaN zone-map soundness fix.
  */
class AvroAggBloomSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_agg").toString

  private def fixture(dir: String): Unit =
    AvroSink.write(
      spark.range(1000).select(
        col("id"),
        (col("id") % 97).cast("int").as("m97"),
        when(col("id") % 10 === 0, lit(null)).otherwise(col("id") / 8.0)
          .as("score"),
        concat(lit("doc-"), format_string("%04d", col("id"))).as("name"))
        .repartition(4),
      dir, overwrite = true)

  /** Overwrite every container's BYTES with garbage, keeping names and
    * sidecars: any code path that OPENS a container now throws, so a
    * correct answer proves the plan was metadata-only.
    */
  private def corruptContainers(dir: String): Unit = {
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(walk))
      else if (f.getName.endsWith(".avro"))
        java.nio.file.Files.write(f.toPath,
          "not an avro container at all".getBytes)
      else if (f.getName.endsWith(".crc")) f.delete() // stale checksums
    walk(new java.io.File(dir)) // recursive: partitioned layouts too
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("global count/min/max answer from sidecars alone — containers never opened") {
    val dir = tempDir()
    fixture(dir)
    // capture the schema BEFORE corrupting: inferSchema opens a container
    val schema = spark.read.format("graft-avro").load(dir).schema
    corruptContainers(dir)
    val agged = spark.read.format("graft-avro").schema(schema).load(dir).agg(
      count(lit(1)).as("n_rows"),
      count(col("score")).as("n_score"),
      min(col("id")).as("min_id"), max(col("id")).as("max_id"),
      min(col("m97")).as("min_m"), max(col("m97")).as("max_m"),
      min(col("score")).as("min_s"), max(col("score")).as("max_s"),
      min(col("name")).as("min_n"), max(col("name")).as("max_n"))
    val plan = planOf(agged)
    assert(plan.contains("PushedAggregates"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    val r = agged.collect().head
    assert(r.getLong(0) === 1000L)
    assert(r.getLong(1) === 900L) // every 10th score is null
    assert(r.getLong(2) === 0L && r.getLong(3) === 999L)
    assert(r.getInt(4) === 0 && r.getInt(5) === 96)
    assert(r.getDouble(6) === 1.0 / 8.0) // id=0 is null; min non-null is id=1
    assert(r.getDouble(7) === 999.0 / 8.0)
    assert(r.getString(8) === "doc-0000" && r.getString(9) === "doc-0999")
  }

  test("aggregate pushdown declines: filter, distinct, avg, group-by, missing sidecar") {
    val dir = tempDir()
    fixture(dir)
    val base = spark.read.format("graft-avro").load(dir)
    val withFilter = base.where(col("id") >= 10).agg(count(lit(1)).as("n"))
    assert(!planOf(withFilter).contains("PushedAggregates"))
    assert(withFilter.collect().head.getLong(0) === 990L)
    val dist = base.agg(countDistinct(col("m97")).as("n"))
    assert(!planOf(dist).contains("PushedAggregates"))
    assert(dist.collect().head.getLong(0) === 97L)
    // sum over a DOUBLE column declines (order-dependent fp addition is
    // never metadata-exact); r17 moved avg to the pushdown tests — it
    // now pushes via Spark's sum/count partial rewrite
    val ds = base.agg(sum(col("score")).as("s"))
    assert(!planOf(ds).contains("PushedAggregates"))
    assert(ds.collect().head.getDouble(0) === 56250.0)
    val grouped = base.groupBy(col("m97")).agg(count(lit(1)).as("n"))
    assert(!planOf(grouped).contains("PushedAggregates"))
    assert(grouped.count() === 97L)
    // drop ONE sidecar: the answer must come from a full scan again
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".stats.json")).take(1)
      .foreach(f => assert(f.delete()))
    val noSidecar = base.agg(count(lit(1)).as("n"), max(col("id")).as("m"))
    assert(!planOf(noSidecar).contains("PushedAggregates"))
    val r = noSidecar.collect().head
    assert(r.getLong(0) === 1000L && r.getLong(1) === 999L)
  }

  test("NaN doubles: pushed max is NaN (Spark ordering), min unaffected") {
    val dir = tempDir()
    AvroSink.write(
      Seq(1.0, 2.5, Double.NaN, -3.0).toDF("v").repartition(2),
      dir, overwrite = true)
    val agged = spark.read.format("graft-avro").load(dir)
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    assert(planOf(agged).contains("PushedAggregates"))
    val r = agged.collect().head
    assert(r.getDouble(0) === -3.0)
    assert(r.getDouble(1).isNaN)
    // cross-check against the same frame aggregated without pushdown
    val direct = Seq(1.0, 2.5, Double.NaN, -3.0).toDF("v")
      .agg(min(col("v")), max(col("v"))).collect().head
    assert(direct.getDouble(0) === r.getDouble(0))
    assert(direct.getDouble(1).isNaN === r.getDouble(1).isNaN)
  }

  test("NaN zone-map soundness: a > v cannot skip a file whose NaN is the match") {
    val dir = tempDir()
    AvroSink.write(Seq(1.0, 2.0, Double.NaN).toDF("v").repartition(1),
      dir, overwrite = true)
    // stored max is 2.0; Spark's ordering has NaN > 1e300, so the row
    // MUST survive planning (the r16 fix: nans>0 keeps the file)
    val out = spark.read.format("graft-avro").load(dir)
      .where(col("v") > 1e300)
    assert(out.count() === 1L, "the NaN row was wrongly pruned")
    assert(out.collect().head.getDouble(0).isNaN)
  }

  test("GROUP BY partition column pushes down: grouped counts from paths + sidecars") {
    val dir = tempDir()
    val df = spark.range(120).select(
      col("id"),
      concat(lit("L"), (col("id") % 3).cast("string")).as("lang"),
      when(col("id") % 5 === 0, lit(null)).otherwise(col("id") * 2).as("v"))
    AvroSink.writePartitioned(df, dir, Seq("lang"), overwrite = true)
    val schema = spark.read.format("graft-avro").load(dir).schema
    corruptContainers(dir) // a correct answer proves metadata-only
    val agged = spark.read.format("graft-avro").schema(schema).load(dir)
      .groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        count(col("v")).as("n_v"),
        min(col("id")).as("mn"), max(col("id")).as("mx"))
      .orderBy("lang")
    val plan = planOf(agged)
    assert(plan.contains("PushedAggregates"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    val rows = agged.collect()
    assert(rows.length === 3)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) === s"L$i")
      assert(r.getLong(1) === 40L)
      assert(r.getLong(2) === 32L) // every 5th id null; gcd(3,5)=1 -> 8/40
      assert(r.getLong(3) === i.toLong) // min id with id%3==i
      assert(r.getLong(4) === (117 + i).toLong)
    }
    // min/max OF the partition column itself answers from the paths
    val pc = spark.read.format("graft-avro").schema(schema).load(dir)
      .agg(min(col("lang")).as("mn"), max(col("lang")).as("mx"),
        count(col("lang")).as("n"))
    assert(planOf(pc).contains("PushedAggregates"), planOf(pc))
    val p = pc.collect().head
    assert(p.getString(0) === "L0" && p.getString(1) === "L2")
    assert(p.getLong(2) === 120L)
    // group-by a DATA column declines to the ordinary plan
    val dataGroup = spark.read.format("graft-avro").schema(schema).load(dir)
      .groupBy(col("v")).agg(count(lit(1)))
    assert(!planOf(dataGroup).contains("PushedAggregates"))
  }

  private def scanOf(d: DataFrame): AvroScan =
    d.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[AvroScan]

  test("bloom sidecars prune equality probes that zone maps cannot") {
    val dir = tempDir()
    // two files with fully OVERLAPPING id ranges but disjoint value sets:
    // min/max pruning is powerless, the bloom is decisive
    val evens = spark.range(100).select((col("id") * 2).as("id"),
      concat(lit("even-"), col("id")).as("tag")).coalesce(1)
    val odds = spark.range(100).select((col("id") * 2 + 1).as("id"),
      concat(lit("odd-"), col("id")).as("tag")).coalesce(1)
    AvroSink.write(evens, dir, overwrite = true)
    AvroSink.write(odds, dir) // append: second container
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".avro")) === 2)

    val hit = spark.read.format("graft-avro").load(dir)
      .where(col("id") === 42L)
    assert(hit.select("tag").as[String].collect().toSeq === Seq("even-21"))
    val (kept, total) = scanOf(hit).lastPlanned
    assert(total === 2 && kept === 1,
      s"bloom should prune the odd file: planned $kept of $total")

    // string bloom: probe a tag that lives in exactly one file
    val stag = spark.read.format("graft-avro").load(dir)
      .where(col("tag") === "odd-33")
    assert(stag.select("id").as[Long].collect().toSeq === Seq(67L))
    assert(scanOf(stag).lastPlanned === ((1, 2)))

    // IN over values from one file only
    val inq = spark.read.format("graft-avro").load(dir)
      .where(col("id").isin(2L, 44L, 90L))
    assert(inq.count() === 3L)
    assert(scanOf(inq).lastPlanned === ((1, 2)))

    // integer-typed literal probes a long column's bloom correctly
    val intLit = spark.read.format("graft-avro").load(dir)
      .where(col("id") === lit(42))
    assert(intLit.count() === 1L)

    // absent value inside the range: result empty either way (bloom may
    // false-positive a file, but never loses the row)
    val miss = spark.read.format("graft-avro").load(dir)
      .where(col("id") === 100000L)
    assert(miss.count() === 0L)
  }

  test("SUM pushdown answers from sidecar long sums — containers never opened") {
    val dir = tempDir()
    fixture(dir)
    val schema = spark.read.format("graft-avro").load(dir).schema
    corruptContainers(dir) // a correct answer proves metadata-only
    val base = spark.read.format("graft-avro").schema(schema).load(dir)
    val agged = base.agg(
      sum(col("id")).as("s_id"), sum(col("m97")).as("s_m"),
      count(lit(1)).as("n"))
    assert(planOf(agged).contains("PushedAggregates"), planOf(agged))
    assert(!planOf(agged).contains("HashAggregate"), planOf(agged))
    val r = agged.collect().head
    assert(r.getLong(0) === 499500L)
    assert(r.getLong(1) === (0 until 1000).map(_ % 97).sum.toLong)
    assert(r.getLong(2) === 1000L)
    // avg rides for free: Spark's partial rewrite splits avg into
    // sum/count, both pushed — the division runs above the metadata rows
    val av = base.agg(avg(col("id")).as("a"))
    assert(planOf(av).contains("PushedAggregates"), planOf(av))
    assert(av.collect().head.getDouble(0) === 499.5)
  }

  test("SUM pushdown declines on overflow — wrapped answers never pushed") {
    // task-side overflow: the sidecar OMITS the sum entirely
    val dir = tempDir()
    AvroSink.write(
      Seq(Long.MaxValue, 5L, Long.MaxValue).toDF("v").repartition(1),
      dir, overwrite = true)
    val sidecar = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".stats.json")).head
    val json = new String(java.nio.file.Files.readAllBytes(sidecar.toPath))
    assert(!json.contains("\"sum\""), json)
    val q = spark.read.format("graft-avro").load(dir).agg(sum(col("v")).as("s"))
    assert(!planOf(q).contains("PushedAggregates"))
    // cross-file overflow: each file's sum fits, the FOLD would not —
    // decline, so the ordinary scan surfaces Spark's own ANSI
    // ARITHMETIC_OVERFLOW (a pushed wrapped value would silently return
    // a wrong answer exactly where the engine contract says throw)
    val dir2 = tempDir()
    AvroSink.write(Seq(Long.MaxValue - 1).toDF("v"), dir2, overwrite = true)
    AvroSink.write(Seq(Long.MaxValue - 2).toDF("v"), dir2)
    val q2 = spark.read.format("graft-avro").load(dir2)
      .agg(sum(col("v")).as("s"))
    assert(!planOf(q2).contains("PushedAggregates"))
    val ex = intercept[Exception] { q2.collect() }
    assert(ex.getMessage.contains("ARITHMETIC_OVERFLOW"), ex.getMessage)
    // all-null column: pushed sum is SQL NULL
    val dir3 = tempDir()
    AvroSink.write(spark.range(4).select(col("id"),
      lit(null).cast("long").as("v")), dir3, overwrite = true)
    val q3 = spark.read.format("graft-avro").load(dir3)
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    assert(planOf(q3).contains("PushedAggregates"), planOf(q3))
    val r3 = q3.collect().head
    assert(r3.isNullAt(0) && r3.getLong(1) === 4L)
  }

  test("grouped SUM over the partitioned layout: sidecar + path-value sums") {
    val dir = tempDir()
    val df = spark.range(120).select(col("id"),
      concat(lit("L"), (col("id") % 3).cast("string")).as("lang"),
      when(col("id") % 5 === 0, lit(null)).otherwise(col("id") * 2).as("v"))
    AvroSink.writePartitioned(df, dir, Seq("lang"), overwrite = true)
    val schema = spark.read.format("graft-avro").load(dir).schema
    corruptContainers(dir)
    val agged = spark.read.format("graft-avro").schema(schema).load(dir)
      .groupBy(col("lang"))
      .agg(sum(col("v")).as("sv"), count(col("v")).as("nv"))
      .orderBy("lang")
    assert(planOf(agged).contains("PushedAggregates"), planOf(agged))
    val exp = df.groupBy(col("lang"))
      .agg(sum(col("v")).as("sv"), count(col("v")).as("nv"))
      .orderBy("lang").collect().toSeq.map(_.toString)
    assert(agged.collect().toSeq.map(_.toString) === exp)
    // sum OF an integer partition column: path value × row count
    val dir2 = tempDir()
    AvroSink.writePartitioned(
      spark.range(100).select(col("id"), (col("id") % 4).cast("int").as("band")),
      dir2, Seq("band"), overwrite = true)
    val schema2 = spark.read.format("graft-avro").load(dir2).schema
    corruptContainers(dir2)
    val ps = spark.read.format("graft-avro").schema(schema2).load(dir2)
      .agg(sum(col("band")).as("sb"))
    assert(planOf(ps).contains("PushedAggregates"), planOf(ps))
    assert(ps.collect().head.getLong(0) === (0 until 100).map(_ % 4).sum.toLong)
  }

  test("utf8Cmp: the surrogate-adjusted char compare equals UTF-8 byte order") {
    val rnd = new scala.util.Random(42)
    def byteCmp(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    def randString(): String = {
      val sb = new StringBuilder
      (0 until rnd.nextInt(6)).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => sb.append(('a' + rnd.nextInt(26)).toChar)
          case 1 => sb.append((0xE000 + rnd.nextInt(0x1000)).toChar)
          case 2 => sb.appendAll(Character.toChars(0x10000 + rnd.nextInt(0x10000)))
          case _ => sb.append((0x80 + rnd.nextInt(0xD000)).toChar)
        }
      }
      sb.toString
    }
    (0 until 2000).foreach { _ =>
      val a = randString(); val b = randString()
      assert(Integer.signum(AvroFilters.utf8Cmp(a, b))
        === Integer.signum(byteCmp(a, b)),
        s"utf8Cmp disagrees for ${a.codePoints().toArray.toSeq} vs " +
          s"${b.codePoints().toArray.toSeq}")
    }
  }

  test("legacy sidecars without the coll marker: non-ASCII string bounds distrusted") {
    val sup = new String(Character.toChars(0x1F600))
    val pua = ""
    val dir = tempDir()
    AvroSink.write(Seq("a", pua).toDF("s"), dir, overwrite = true)
    AvroSink.write(Seq(sup).toDF("s"), dir)
    // strip the coll marker AND swap the sup-file's bounds to what a
    // UTF-16 folding would have stored — the r16 on-disk state
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".stats.json")).foreach { f =>
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(f).asInstanceOf[
          com.fasterxml.jackson.databind.node.ObjectNode]
        root.remove("coll")
        java.nio.file.Files.write(f.toPath, om.writeValueAsBytes(root))
        val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
        if (crc.exists) crc.delete() // stale checksum shadow
      }
    // pruning: the sup row must SURVIVE s > pua even though the legacy
    // bound would (under UTF-16 reinterpretation) claim max < pua
    val over = spark.read.format("graft-avro").load(dir)
      .where(col("s") > pua)
    assert(over.select("s").as[String].collect().toSeq === Seq(sup))
    // pushdown: min/max over distrusted bounds DECLINES (bound-less
    // files with non-null rows cannot answer)
    val ag = spark.read.format("graft-avro").load(dir)
      .agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    assert(!planOf(ag).contains("PushedAggregates"), planOf(ag))
    val r = ag.collect().head
    assert(r.getString(1) === sup)
    // ASCII bounds in legacy sidecars stay fully usable
    val asciiDir = tempDir()
    AvroSink.write(Seq("aa", "zz").toDF("s"), asciiDir, overwrite = true)
    new java.io.File(asciiDir).listFiles()
      .filter(_.getName.endsWith(".stats.json")).foreach { f =>
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(f).asInstanceOf[
          com.fasterxml.jackson.databind.node.ObjectNode]
        root.remove("coll")
        java.nio.file.Files.write(f.toPath, om.writeValueAsBytes(root))
        val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
        if (crc.exists) crc.delete() // stale checksum shadow
      }
    val agA = spark.read.format("graft-avro").load(asciiDir)
      .agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    assert(planOf(agA).contains("PushedAggregates"), planOf(agA))
    assert(agA.collect().head.getString(1) === "zz")
  }

  test("a foreign sidecar with a col entry but NO bounds declines min/max/sum") {
    val dir = tempDir()
    AvroSink.write(spark.range(10).select(col("id")), dir, overwrite = true)
    // rewrite the sidecar as a foreign tool might: rows + nulls only
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".stats.json")).foreach { f =>
        java.nio.file.Files.write(f.toPath,
          """{"rows": 10, "cols": {"id": {"nulls": 0}}}""".getBytes)
        val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
        if (crc.exists) crc.delete() // stale checksum shadow
      }
    val ag = spark.read.format("graft-avro").load(dir)
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"),
        sum(col("id")).as("s"))
    // bounds absent but nulls < rows: the column provably has values the
    // stats cannot see — answering NULL (or sum 0) would be WRONG
    assert(!planOf(ag).contains("PushedAggregates"), planOf(ag))
    val r = ag.collect().head
    assert(r.getLong(0) === 0L && r.getLong(1) === 9L && r.getLong(2) === 45L)
  }

  test("string stats collate as UTF-8 bytes, not UTF-16 code units") {
    // U+1F600 (supplementary plane) is 0xF0… in UTF-8 but a 0xD83D
    // surrogate in UTF-16; U+E000 (private use) is 0xEE… in UTF-8 but
    // 0xE000 in UTF-16 — the two collations ORDER THEM OPPOSITELY, so a
    // sidecar min/max folded with String.compareTo makes pushed-down
    // min/max and zone-map pruning contradict Spark's binary UTF-8
    // answer (the r16 ADVICE medium finding)
    val sup = new String(Character.toChars(0x1F600)) // U+1F600
    val pua = "\uE000"        // U+E000
    val dir = tempDir()
    AvroSink.write(Seq("a", pua, sup).toDF("s"), dir, overwrite = true)

    // ground truth: the real scan's aggregate (the pushed IsNotNull
    // filter declines aggregate pushdown, forcing the row path)
    val scanAns = spark.read.format("graft-avro").load(dir)
      .where(col("s").isNotNull).agg(min("s"), max("s")).collect().head
    val pushed = spark.read.format("graft-avro").load(dir)
      .agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    assert(planOf(pushed).contains("PushedAggregates"), planOf(pushed))
    val pushAns = pushed.collect().head
    assert(pushAns.getString(0) === scanAns.getString(0))
    assert(pushAns.getString(1) === scanAns.getString(1))
    assert(pushAns.getString(1) === sup, "UTF-8 byte order: F0 > EE")

    // zone-map pruning under the same collation: the supplementary-
    // plane file must survive `s > U+E000` (a UTF-16 max would say its
    // max sorts BELOW the literal and wrongly skip the whole file)
    val dir2 = tempDir()
    AvroSink.write(Seq("a", pua).toDF("s"), dir2, overwrite = true)
    AvroSink.write(Seq(sup).toDF("s"), dir2)
    val over = spark.read.format("graft-avro").load(dir2)
      .where(col("s") > pua)
    assert(over.select("s").as[String].collect().toSeq === Seq(sup))
  }
}
