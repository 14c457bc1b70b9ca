package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  // 120 docs: "alpha" everywhere (the uncontested heavy hitter), "beta"
  // in even docs, plus a long Zipf-ish tail of per-doc words that keeps
  // every shard's k-th count above zero
  private val docs = (1L to 120L).map { i =>
    val tail = (0 until (i % 11).toInt).map(j => s"w${i % 17}_$j").mkString(" ")
    (i, s"alpha ${if (i % 2 == 0) "beta" else ""} common$i $tail")
  }.toDF("doc_id", "text")

  private val exact = docs
    .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
    .groupBy("word").agg(count(lit(1)).as("n"))
    .as[(String, Long)].collect().toMap

  test("lower and upper bounds bracket the exact count for every reported word") {
    val out = Sketches.boundedTopK(docs, "text", "doc_id",
        buckets = 8, k = 3, topN = 50)
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (w, lb, ub, isExact) =>
      val n = exact(w)
      assert(lb <= n && n <= ub, s"$w: exact $n outside [$lb, $ub]")
      assert(isExact === (lb == ub))
      if (isExact) assert(lb === n)
    }
    // the uncontested global #1 must rank first, exactly
    assert(out.head._1 === "alpha" && out.head._2 === 120L)
  }

  test("every word with true count above the silence threshold surfaces") {
    val k = 3
    // t_b replay: per-shard k-th count (0 when the shard has < k words)
    val bucketed = docs.select(
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(8L)).as("bucket"),
        explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("bucket", "word").agg(count(lit(1)).as("c"))
    val tb = bucketed.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy(col("c").desc, col("word").asc)))
      .where(col("rn") <= k)
      .groupBy("bucket")
      .agg(when(count(lit(1)) === k, min("c")).otherwise(lit(0L)).as("t"))
      .agg(sum("t")).as[Long].head()
    val candidates = Sketches.boundedTopK(docs, "text", "doc_id",
        buckets = 8, k = k, topN = 10000)
      .select("word").as[String].collect().toSet
    val mustSurface = exact.filter(_._2 > tb).keySet
    assert(mustSurface.nonEmpty)
    assert(mustSurface.subsetOf(candidates),
      s"missing guaranteed hitters: ${mustSurface -- candidates}")
  }
}
