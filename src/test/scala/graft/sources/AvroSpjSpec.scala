package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r17: storage-partitioned joins on graft-avro — the scan reports a
  * KeyGroupedPartitioning over the committed partition spec
  * (`graft.spj=true` + spark.sql.sources.v2.bucketing.enabled), so a
  * join of two same-partitioned tables on the partition column plans
  * with ZERO exchanges: Spark groups each side's splits by partition
  * value and zips matching groups.
  */
class AvroSpjSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro_spj").toString

  /** (shuffleExchanges, broadcastExchanges) of the EXECUTED plan (AQE
    * finalized by the collect the caller already ran).
    */
  private def exchanges(df: DataFrame): (Int, Int) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    var sh = 0; var br = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan); return
        case q: QueryStageExec => walk(q.plan); return
        case _: ShuffleExchangeExec => sh += 1
        case _: BroadcastExchangeExec => br += 1
        case _ => ()
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    (sh, br)
  }

  private def docs = spark.range(300).select(
    col("id"),
    concat(lit("L"), (col("id") % 3).cast("string")).as("lang"),
    (col("id") % 17).as("v"))

  private def dims = spark.range(3).select(
    concat(lit("L"), col("id").cast("string")).as("lang"),
    (col("id") * 100).as("boost"))

  test("same-partitioned join on the partition column plans zero exchanges") {
    val dDocs = tempDir(); val dDims = tempDir()
    AvroSink.writePartitioned(docs, dDocs, Seq("lang"), overwrite = true)
    AvroSink.writePartitioned(dims, dDims, Seq("lang"), overwrite = true)
    val l = spark.read.format("graft-avro").option("graft.spj", "true").load(dDocs)
    val r = spark.read.format("graft-avro").option("graft.spj", "true").load(dDims)
    // the merge hint keeps the (tiny) dim from auto-broadcasting so the
    // join itself demonstrates the storage-partitioned plan
    val joined = l.hint("merge").join(r, Seq("lang"))
      .select(col("lang"), col("id"), col("v"), col("boost"))
    val rows = joined.collect()
    assert(rows.length === 300)
    assert(exchanges(joined) === ((0, 0)),
      joined.queryExecution.executedPlan.toString)
    // values equal the plain (exchange-ful) baseline
    val baseline = docs.join(dims, Seq("lang"))
      .select(col("lang"), col("id"), col("v"), col("boost"))
      .collect().map(_.toString).sorted.toSeq
    assert(rows.map(_.toString).sorted.toSeq === baseline)
  }

  test("without the opt-in the same join shuffles (and stays correct)") {
    val dDocs = tempDir(); val dDims = tempDir()
    AvroSink.writePartitioned(docs, dDocs, Seq("lang"), overwrite = true)
    AvroSink.writePartitioned(dims, dDims, Seq("lang"), overwrite = true)
    val l = spark.read.format("graft-avro").load(dDocs)
    val r = spark.read.format("graft-avro").load(dDims)
    val joined = l.hint("merge").join(r, Seq("lang"))
      .select(col("lang"), col("id"), col("v"), col("boost"))
    assert(joined.count() === 300)
    val (sh, _) = exchanges(joined)
    assert(sh > 0, "control: the non-SPJ join should exchange")
  }

  test("plain scans keep per-split parallelism unless spj is requested") {
    val d = tempDir()
    // two appends -> two containers per lang directory
    AvroSink.writePartitioned(docs, d, Seq("lang"), overwrite = true)
    AvroSink.writePartitioned(docs.withColumn("id", col("id") + 1000), d,
      Seq("lang"))
    val conf = new org.apache.hadoop.conf.Configuration()
    val nFiles = AvroDsv2.listFiles(d, conf).size
    assert(nFiles > 3, s"fixture should spread files, got $nFiles")
    // without the option: one task per split (>= one per file)
    val plain = spark.read.format("graft-avro").load(d)
    assert(plain.rdd.getNumPartitions >= nFiles)
    // with it: Spark groups to one task per partition VALUE — the
    // documented parallelism trade that makes spj an explicit opt-in
    val grouped = spark.read.format("graft-avro")
      .option("graft.spj", "true").load(d)
    assert(grouped.rdd.getNumPartitions === 3)
    assert(grouped.count() === 600)
  }

  test("grouped aggregation on the partition key plans zero exchanges") {
    val d = tempDir()
    AvroSink.writePartitioned(docs, d, Seq("lang"), overwrite = true)
    // countDistinct is NOT metadata-answerable (aggregate pushdown
    // declines), so this exercises the KeyGroupedPartitioning
    // satisfying the aggregate's ClusteredDistribution: the whole
    // group-by runs inside the per-directory groups, no exchange
    val agged = spark.read.format("graft-avro")
      .option("graft.spj", "true").load(d)
      .groupBy(col("lang"))
      .agg(count_distinct(col("v")).as("n_v"), count(lit(1)).as("n"))
    val rows = agged.collect()
    assert(rows.length === 3)
    assert(exchanges(agged) === ((0, 0)),
      agged.queryExecution.executedPlan.toString)
    val exp = docs.groupBy(col("lang"))
      .agg(count_distinct(col("v")).as("n_v"), count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    assert(rows.map(_.toString).sorted.toSeq === exp)
  }

  test("null partition values round-trip through the grouped join") {
    val dDocs = tempDir(); val dDims = tempDir()
    val withNull = spark.range(40).select(col("id"),
      when(col("id") % 4 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("L"), (col("id") % 2).cast("string"))).as("lang"))
    val dimsN = spark.range(2).select(
      concat(lit("L"), col("id").cast("string")).as("lang"),
      col("id").as("boost"))
    AvroSink.writePartitioned(withNull, dDocs, Seq("lang"), overwrite = true)
    AvroSink.writePartitioned(dimsN, dDims, Seq("lang"), overwrite = true)
    val l = spark.read.format("graft-avro").option("graft.spj", "true").load(dDocs)
    val r = spark.read.format("graft-avro").option("graft.spj", "true").load(dDims)
    val joined = l.hint("merge").join(r, Seq("lang"))
    // inner join drops null-lang rows exactly like the baseline
    assert(joined.count() ===
      withNull.join(dimsN, Seq("lang")).count())
  }
}
