package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev utility: run selected queries twice (cold + warm) against a scale
  * dir, print per-run wall seconds and optionally the formatted physical
  * plan. Usage: runMain graft.tools.Explain <sfDir> <q1,q2,...> [plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val showPlan = args.length > 2 && args(2) == "plan"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_LOG", "ERROR"))
    if (args(1) == "pipe-debug") { pipeDebug(spark, sfDir); spark.stop(); return }
    if (args(1) == "vec-bench") { vecBench(spark, sfDir); spark.stop(); return }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (showPlan) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        println(f"[explain] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
      }
    }
    spark.stop()
  }

  /** HOF vs native-Expression dot product micro-benchmark: ~1M 64-dim dot
    * products (embeddings x 200 query vectors), summed to force full
    * evaluation. Run twice each to amortize codegen compilation.
    */
  private def vecBench(spark: SparkSession, sfDir: String): Unit = {
    import graft.functions.VectorOps
    import org.apache.spark.sql.functions._
    val e = graft.Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val q = e.limit(200).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val pairs = e.crossJoin(broadcast(q))
    def run(label: String, dotCol: org.apache.spark.sql.Column): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val s = pairs.agg(sum(dotCol)).head().getDouble(0)
        println(f"[vec] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs sum=$s%.3f")
      }
    run("hof   ", VectorOps.dot(col("embedding"), col("qe")))
    run("native", VectorOps.dotNative(col("embedding"), col("qe")))
    run("cosHof", VectorOps.cosine(col("embedding"), col("qe")))
    run("cosFus", VectorOps.cosineNative(col("embedding"), col("qe")))
  }

  /** Stage-by-stage timing of the flagship pipeline. */
  private def pipeDebug(spark: SparkSession, sfDir: String): Unit = {
    import graft.ops.{Clean, Harmonize, Preprocess}
    import org.apache.spark.sql.functions._
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"[pipe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$c")
    }
    val dfs = Seq(graft.Tables.load(spark, sfDir, "customer"),
      graft.Tables.load(spark, sfDir, "supplier"))
    val tagged = dfs.zipWithIndex.map { case (df, i) =>
      val std = Harmonize.standardizeColumns(df)
      std.withColumn("__graft_src", lit(i)).withColumn("__graft_ord", col(std.columns.head))
    }
    val unioned = Harmonize.unionByName(tagged)
    time("union")(unioned)
    val coerced = Clean.scrubInf(Clean.coerceNumeric(unioned))
    time("coerce+scrub")(coerced)
    val fillable = coerced.schema.fields.collect {
      case f if (f.dataType == org.apache.spark.sql.types.DoubleType) && f.name != "__graft_ord" => f.name
    }.toIndexedSeq
    println(s"[pipe] fillable=$fillable")
    val interp = Clean.interpolate(coerced, fillable, "__graft_ord", Seq("__graft_src"))
    time("interpolate")(interp)
    val filled = Clean.ffill(interp, fillable, "__graft_ord", Seq("__graft_src"))
    time("ffill")(filled)
    val dropped = Clean.dropAllNullCols(filled)
    time("dropAllNull")(dropped)
    val zCols = dropped.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
        && f.name != "__graft_src" && f.name != "__graft_ord" => f.name
    }.toIndexedSeq
    val pre = Preprocess.zscore(dropped, zCols)
    time("zscore")(pre)
    val rounded = pre.select(
      (col("__graft_src").as("src") +: col("__graft_ord").as("ord") +:
        zCols.map(c => round(col(c), 6).as(c))): _*)
    time("round-select")(rounded)
    time("orderBy")(rounded.orderBy("src", "ord"))
    val tc0 = System.nanoTime()
    val q = graft.SparkEntry.queries("q_pipeline")(spark, sfDir)
    println(f"[pipe] entry-construct: ${(System.nanoTime() - tc0) / 1e9}%.2fs")
    val tc1 = System.nanoTime()
    q.count()
    println(f"[pipe] entry-count: ${(System.nanoTime() - tc1) / 1e9}%.2fs")
    val tc2 = System.nanoTime()
    Clean.dropAllNullCols(filled)
    println(f"[pipe] dropAllNull-construct-again: ${(System.nanoTime() - tc2) / 1e9}%.2fs")
    val mine = rounded.orderBy("src", "ord")
    val real = graft.SparkEntry.queries("q_pipeline")(spark, sfDir)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plan_mine.txt"),
      mine.queryExecution.optimizedPlan.toString)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plan_real.txt"),
      real.queryExecution.optimizedPlan.toString)
    println("[pipe] plans dumped")
  }
}
