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
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
}
