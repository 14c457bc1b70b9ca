package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc probe: which CBO confs make Catalyst consume the graft-avro
  * scan's V2 column statistics (rowCount + attributeStats on the
  * optimized plan), and does a selective filter flip a join to
  * broadcast without a hint.
  */
object ProbeColStats {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("probe_cs").toString
    val df = spark.range(20000).select(col("id"), (col("id") % 50).as("v"),
      concat(lit("name_padding_padding_padding_"), col("id")).as("name"))
    graft.sources.AvroSink.write(df, dir, overwrite = true)
    for (cbo <- Seq("false", "true"); ps <- Seq("false", "true")) {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      spark.conf.set("spark.sql.cbo.planStats.enabled", ps)
      val d = spark.read.format("graft-avro").load(dir).where(col("v") === 7L)
      val st = d.queryExecution.optimizedPlan.stats
      println(s"[probe] cbo=$cbo planStats=$ps rowCount=${st.rowCount} " +
        s"attrStats=${st.attributeStats.size} size=${st.sizeInBytes}")
    }
    // broadcast-flip probe
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    val fact = spark.range(100000).select(col("id").as("fid"), (col("id") % 20000).as("fk"))
    val dimAll = spark.read.format("graft-avro").load(dir)
    val plain = fact.join(dimAll, col("fk") === col("id")).groupBy().count()
    val filt = fact.join(dimAll.where(col("v") === 7L), col("fk") === col("id")).groupBy().count()
    def kind(d: org.apache.spark.sql.DataFrame): String = {
      val s = d.queryExecution.executedPlan.toString
      if (s.contains("BroadcastHashJoin")) "broadcast"
      else if (s.contains("SortMergeJoin")) "smj" else "other"
    }
    println(s"[probe] unfiltered join: ${kind(plain)}  filtered join: ${kind(filt)}")
    spark.stop()
  }
}
