package graft

import org.apache.spark.sql.types._

/** Registry-wide output-schema guard (r11 verdict item 2).
  *
  * The driver's correctness harness compares Spark output to the DuckDB
  * oracle via a pandas sort+hash, which crashes on non-scalar cells
  * ("unhashable type: numpy.ndarray" — the r11 `q_text_inverted_index`
  * failure). The registry contract is therefore: every query in
  * [[SparkEntry.queries]] produces ONLY atomic output columns. This spec
  * makes that class of failure structurally impossible — registering an
  * array/map/struct output turns the suite red.
  *
  * Only the analyzed schema is needed, so queries whose construction is
  * lazy cost catalyst analysis, not a job; queries with eager decision
  * points (model fits, quantile grids) run them at sf0.001.
  */
class RegistrySchemaSpec extends SparkSpec {

  // fixture dir is overridable (sys prop, then env) so the suite does not
  // hard-fail on machines without the driver-generated parquet; when the
  // dir is absent the tests are skipped with an explicit message via
  // `assume` instead of erroring on the first read.
  private val dir = sys.props.getOrElse("graft.testdata.dir",
    sys.env.getOrElse("SPARK_GRAFT_TESTDATA_DIR", "/root/testdata/sf0.001"))
  private def fixturePresent: Boolean = new java.io.File(dir).isDirectory

  private def atomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  test("every registered query outputs only atomic (driver-comparable) columns") {
    assume(fixturePresent, s"fixture dir $dir absent — set -Dgraft.testdata.dir")
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema =
        try fn(spark, dir).schema
        catch { case e: Throwable =>
          fail(s"$name failed to build at sf0.001: ${e.getMessage}", e)
        }
      schema.fields.collect {
        case f if !atomic(f.dataType) => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"non-atomic output columns violate the driver-comparison contract:\n  ${bad.mkString("\n  ")}")
  }

  test("every registered query has an oracle entry or a documented exclusion") {
    // contract exclusions: ML metric tables (RNG-dependent fits) and the
    // deflate compression signal (no SQL equivalent) are rows-only checked
    val excluded = Set("q_ml_train_clf", "q_ml_train_reg", "q_text_compression")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- excluded
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.toSeq.sorted.mkString(", ")}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
