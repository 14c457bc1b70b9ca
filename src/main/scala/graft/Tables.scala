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
    // events.ts must come out as TimestampType (UTC sessions) — the
    // engine-wide contract every consumer (watermarks REQUIRE it; NTZ is
    // rejected by EventTimeWatermark) and every oracle was built on.
    // Source files have shipped two physical spellings:
    //  - TIMESTAMP(NANOS): Spark 4 can't map it; sessions set
    //    spark.sql.legacy.parquet.nanosAsLong and the nanos long is
    //    converted here (integer DIV — a double round-trip would lose
    //    precision at 1e18 ns);
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads as
    //    TIMESTAMP_NTZ; the cast interprets the wall-clock in the UTC
    //    session timezone — the same instant the generator wrote.
    if (name == "events" && df.schema.fieldNames.contains("ts")) {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else df
  }
}
