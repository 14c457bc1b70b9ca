package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-provided corpus (TESTDATA.md).
  * One parquet file per table per scale-factor directory.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 cannot map to a
    // timestamp type: sessions set spark.sql.legacy.parquet.nanosAsLong, and
    // the nanos long is converted here to a microsecond TimestampType
    // (integer DIV — a double round-trip would lose precision at 1e18 ns).
    if (name == "events" && df.schema.fieldNames.contains("ts") &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else df
  }
}
