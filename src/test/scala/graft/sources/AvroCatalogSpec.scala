package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r18: SQL addressability — the graft TableCatalog resolves CREATE /
  * INSERT / SELECT / DELETE over graft-avro tables, including the
  * partition-grain and row-grain (COW) DELETE tiers from plain SQL.
  */
class AvroCatalogSpec extends SparkSpec {

  private val wh = java.nio.file.Files
    .createTempDirectory("graft_catalog_wh").toString

  spark.conf.set("spark.sql.catalog.gtest", "graft.sources.AvroCatalog")
  spark.conf.set("spark.sql.catalog.gtest.warehouse", wh)

  test("SQL DDL + DML round trip over a partitioned table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db1")
    spark.sql("CREATE TABLE gtest.db1.t (id BIGINT, v BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.range(90).select(col("id"), (col("id") * 2).as("v"),
        concat(lit("L"), (col("id") % 3).cast("string")).as("lang"))
      .createOrReplaceTempView("cat_src")
    spark.sql("INSERT INTO gtest.db1.t SELECT id, v, lang FROM cat_src")
    assert(spark.sql("SELECT count(*) FROM gtest.db1.t")
      .collect().head.getLong(0) === 90L)
    // the layout is REALLY partitioned (directories + spec file)
    assert(new java.io.File(s"$wh/db1/t/lang=L0").exists)
    assert(AvroPartitions.readSpec(s"$wh/db1/t",
      new org.apache.hadoop.conf.Configuration()) === Seq(("lang", "string")))
    // partition pruning from SQL
    assert(spark.sql("SELECT count(*) FROM gtest.db1.t WHERE lang = 'L1'")
      .collect().head.getLong(0) === 30L)
    // partition-grain DELETE: whole directory unlinks
    spark.sql("DELETE FROM gtest.db1.t WHERE lang = 'L1'")
    assert(!new java.io.File(s"$wh/db1/t/lang=L1").exists)
    assert(spark.sql("SELECT count(*) FROM gtest.db1.t")
      .collect().head.getLong(0) === 60L)
    // row-grain COW DELETE through SQL (the r18 rewrite tier)
    spark.sql("DELETE FROM gtest.db1.t WHERE v < 60")
    assert(spark.sql("SELECT count(*) FROM gtest.db1.t WHERE v < 60")
      .collect().head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM gtest.db1.t")
      .collect().head.getLong(0) ===
      spark.sql("SELECT count(*) FROM cat_src WHERE lang <> 'L1' AND v >= 60")
        .collect().head.getLong(0))
    // second INSERT appends into the same layout
    spark.sql("INSERT INTO gtest.db1.t SELECT id + 1000, v, lang FROM cat_src")
    assert(spark.sql("SELECT count(*) FROM gtest.db1.t WHERE id >= 1000")
      .collect().head.getLong(0) === 90L)
    // unconditional DELETE (AlwaysTrue) unlinks everything, zero reads
    spark.sql("DELETE FROM gtest.db1.t")
    assert(spark.sql("SELECT count(*) FROM gtest.db1.t")
      .collect().head.getLong(0) === 0L)
  }

  test("catalog metadata: exists/list/drop/rename; misdeclarations refuse") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db2")
    spark.sql("CREATE TABLE gtest.db2.a (id BIGINT)")
    spark.sql("CREATE TABLE gtest.db2.b (id BIGINT)")
    val tables = spark.sql("SHOW TABLES IN gtest.db2")
      .select("tableName").collect().map(_.getString(0)).sorted.toSeq
    assert(tables === Seq("a", "b"))
    // RENAME TO takes a catalog-relative name: Spark passes the TO
    // identifier verbatim, so a catalog-qualified target would read as a
    // nested namespace inside the catalog
    spark.sql("ALTER TABLE gtest.db2.a RENAME TO db2.c")
    assert(new java.io.File(s"$wh/db2/c/_graft_schema.json").exists,
      s"on disk after rename: ${new java.io.File(s"$wh/db2").list().toSeq} / " +
        s"c contents: ${Option(new java.io.File(s"$wh/db2/c").list()).map(_.toSeq)}")
    assert(spark.sql("SHOW TABLES IN gtest.db2")
      .select("tableName").collect().map(_.getString(0)).sorted.toSeq
      === Seq("b", "c"))
    spark.sql("DROP TABLE gtest.db2.c")
    assert(spark.sql("SHOW TABLES IN gtest.db2").count() === 1L)
    // partition columns must be declared LAST (the source's layout
    // contract) — interleaving refuses instead of silently reordering
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE gtest.db2.bad (lang STRING, id BIGINT) " +
        "PARTITIONED BY (lang)")
    }
    assert(ex.getMessage.contains("LAST"), ex.getMessage)
    // unsupported column types refuse at CREATE
    intercept[Exception] {
      spark.sql("CREATE TABLE gtest.db2.bad2 (id DECIMAL(10,2))")
    }
  }

  test("a path-API table is adopted by the catalog and readable by both") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db3")
    val dir = s"$wh/db3/adopted"
    AvroSink.write(spark.range(25).toDF("id"), dir, overwrite = true)
    assert(spark.sql("SELECT count(*) FROM gtest.db3.adopted")
      .collect().head.getLong(0) === 25L)
    assert(spark.read.format("graft-avro").load(dir).count() === 25L)
    // and a catalog table stays readable through the path API
    spark.sql("CREATE TABLE gtest.db3.t2 (id BIGINT)")
    spark.sql("INSERT INTO gtest.db3.t2 SELECT id FROM range(7)")
    assert(spark.read.format("graft-avro").load(s"$wh/db3/t2").count() === 7L)
  }
}
