package graft.sources

import graft.SparkSpec

class FixedWidthSpec extends SparkSpec {

  private def write(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.txt"), lines.mkString("\n") + "\n")
    dir
  }

  test("parses padded columns with trimming; short lines yield null tails") {
    val dir = write(Seq(
      "1     alpha     10",
      "22    beta      7 ",
      "333   gamma"))                       // short line: third column absent
    val out = Sources.readFixedWidth(spark, dir,
        Seq(("id", 6), ("name", 10), ("v", 2)))
      .orderBy("id").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("1", "22", "333"))
    assert(out.map(_.getString(1)).toSeq === Seq("alpha", "beta", "gamma"))
    assert(out(0).getString(2) === "10")
    assert(out(1).getString(2) === "7")
    assert(out(2).isNullAt(2), "missing tail must be null")
  }

  test("custom null marker maps to SQL null after trimming") {
    val dir = write(Seq("1     NA        5 ", "2     real      NA"))
    val out = Sources.readFixedWidth(spark, dir,
        Seq(("id", 6), ("name", 10), ("v", 2)), nullValue = "NA")
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).getString(2) === "5")
    assert(out(1).getString(1) === "real" && out(1).isNullAt(2))
  }

  test("the parse is scan-local: no exchange, no UDF in the plan") {
    val dir = write(Seq("1     x         1 "))
    val plan = Sources.readFixedWidth(spark, dir,
        Seq(("id", 6), ("name", 10), ("v", 2)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("UDF("), s"unexpected UDF:\n$plan")
  }
}
