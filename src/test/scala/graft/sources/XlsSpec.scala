package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Tests for the BIFF8 .xls reader. No Excel library exists in this
  * offline environment, so fixtures are built from the public [MS-CFB] /
  * [MS-XLS] specifications by [[XlsWriter]] — an independent
  * spec-following writer (the same fixture strategy as the BMP/WAV codec
  * tests): the reader must reconstruct exactly the cells the builder laid
  * out through the full container (CFB sectors, FAT, mini-FAT) and record
  * (SST+CONTINUE, RK, MULRK, FORMULA) stack.
  */
class XlsSpec extends SparkSpec {
  import XlsWriter._

  private def tmpXls(name: String, bytes: Array[Byte]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_xls")
    val p = dir.resolve(name)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  test("rkToDouble decodes all four RK encodings") {
    assert(Xls.rkToDouble((1234 << 2) | 2) == 1234.0)
    assert(Xls.rkToDouble((-7 << 2) | 2) == -7.0)
    assert(Xls.rkToDouble((1234 << 2) | 3) == 12.34)
    // float form: top 30 bits of the IEEE double, low 34 zero
    val half = (java.lang.Double.doubleToLongBits(0.5) >>> 32).toInt & ~3
    assert(Xls.rkToDouble(half) == 0.5)
    assert(Xls.rkToDouble(((java.lang.Double.doubleToLongBits(314.0) >>> 32).toInt & ~3) | 1) == 3.14)
  }

  test("small workbook (mini-stream tier): sheets, header, inference, cells") {
    val sheets = Seq(
      "Data" -> Seq(
        Seq("name", "score", "note"),
        Seq("alice", 1.5, "ok"),
        Seq("bob", 2.0, null),
        Seq("carol", -3.25, "x7")),
      "Flags" -> Seq(
        Seq("id", "flag"),
        Seq(1.0, true),
        Seq(2.0, false)))
    val path = tmpXls("wb.xls", cfb(biffStream(sheets)))
    assert(Xls.sheetNames(path) == Seq("Data", "Flags"))
    assert(Sources.excelSheetNames(path) == Seq("Data", "Flags"))

    val df = Sources.readExcel(spark, path) // default sheet 0, magic dispatch
    assert(df.columns.toSeq == Seq("name", "score", "note"))
    assert(df.schema("score").dataType == DoubleType)
    assert(df.schema("name").dataType == StringType)
    val rows = df.collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq == Seq(("alice", 1.5, "ok"), ("bob", 2.0, null), ("carol", -3.25, "x7")))

    val flags = Sources.readExcel(spark, path, "Flags")
    assert(flags.collect().map(r => (r.getDouble(0), r.getString(1))).toSeq ==
      Seq((1.0, "TRUE"), (2.0, "FALSE")))
    val byIdx = Sources.readExcel(spark, path, 1)
    assert(byIdx.columns.toSeq == Seq("id", "flag"))
  }

  test("RK and MULRK cells decode; mixed column becomes string") {
    val sheets = Seq("S" -> Seq(
      Seq("a", "b", "c", "d"),
      Seq(Rk(1234.0), Rk(12.34), Rk(0.5), "txt"),
      Seq(MulRkRun(Seq(1.0, 2.5, -3.0)), null)))
    // MulRkRun occupies columns 0..2 of its row
    val path = tmpXls("rk.xls", cfb(biffStream(sheets)))
    val df = Xls.read(spark, path)
    assert(df.schema("a").dataType == DoubleType && df.schema("c").dataType == DoubleType)
    assert(df.schema("d").dataType == StringType)
    val got = df.collect()
    assert((got(0).getDouble(0), got(0).getDouble(1), got(0).getDouble(2), got(0).getString(3)) ==
      (1234.0, 12.34, 0.5, "txt"))
    assert((got(1).getDouble(0), got(1).getDouble(1), got(1).getDouble(2)) == (1.0, 2.5, -3.0))
    assert(got(1).isNullAt(3))
  }

  test("FORMULA cached results: numeric, string (STRING record), boolean") {
    val sheets = Seq("F" -> Seq(
      Seq("n", "s", "b"),
      Seq(FormulaNum(42.5), FormulaStr("cached!"), FormulaBool(true))))
    val path = tmpXls("f.xls", cfb(biffStream(sheets)))
    val df = Xls.read(spark, path)
    val r = df.head()
    assert(r.getDouble(0) == 42.5 && r.getString(1) == "cached!" && r.getString(2) == "TRUE")
  }

  test("SST spanning CONTINUE records at string boundaries + UTF-16 strings") {
    val longs = (0 until 40).map(i => s"string_number_$i")
    val uni = "héllo→world" // forces the uncompressed (2-byte) page
    val rows = Seq(Seq("k", "v")) ++ longs.zipWithIndex.map { case (s0, i) =>
      Seq(i.toDouble, s0)
    } :+ Seq(999.0, uni)
    // 32-byte record cap: the SST MUST split across many CONTINUEs
    val path = tmpXls("cont.xls", cfb(biffStream(Seq("S" -> rows), maxRecData = 32)))
    val df = Xls.read(spark, path)
    val got = df.collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    longs.zipWithIndex.foreach { case (s0, i) => assert(got(i.toDouble) == s0) }
    assert(got(999.0) == uni)
  }

  test("SST rich-text and ext fields are skipped, across a CONTINUE boundary") {
    // hand-crafted: string 1 has fRichSt (2 runs = 8 bytes of formatting)
    // and fExtSt (5 ext bytes) whose skip spans into the CONTINUE record;
    // string 2 follows in the CONTINUE — both must parse cleanly
    def u16b(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def u32b(v: Int) = u16b(v & 0xFFFF) ++ u16b((v >> 16) & 0xFFFF)
    val rec1 = u32b(2) ++ u32b(2) ++
      u16b(2) ++ Array(0x0C.toByte) ++ // cch=2, flags: fExtSt|fRichSt
      u16b(2) ++ u32b(5) ++            // cRun=2, cbExtRst=5
      "hi".getBytes("ISO-8859-1") ++
      Array.fill[Byte](6)(0x7F.toByte) // first 6 of the 13 skip bytes
    val rec2 = Array.fill[Byte](7)(0x7E.toByte) ++ // remaining skip bytes
      u16b(2) ++ Array(0.toByte) ++ "ok".getBytes("ISO-8859-1")
    val s = rec1 ++ rec2
    val recs = IndexedSeq((0x00FC, 0, rec1.length), (0x003C, rec1.length, rec2.length))
    assert(Xls.parseSst(s, recs) == IndexedSeq("hi", "ok"))
  }

  test("SST mid-string character split with a width switch at the boundary") {
    // hand-crafted: "AB" compressed in the SST record, then a CONTINUE
    // whose fresh flags byte switches to UTF-16 for the remaining chars
    def u16b(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def u32b(v: Int) = u16b(v & 0xFFFF) ++ u16b((v >> 16) & 0xFFFF)
    val rec1 = u32b(1) ++ u32b(1) ++ u16b(4) ++ Array(0.toByte) ++ "AB".getBytes("ISO-8859-1")
    val rec2 = Array(1.toByte) ++ u16b(0x03A9) ++ u16b(0x03A8) // Ω Ψ
    val s = rec1 ++ rec2
    val recs = IndexedSeq((0x00FC, 0, rec1.length), (0x003C, rec1.length, rec2.length))
    assert(Xls.parseSst(s, recs) == IndexedSeq("ABΩΨ"))
  }

  test("large workbook (regular FAT tier): >4096-byte stream round-trips") {
    val n = 400
    val rows = Seq(Seq("id", "payload")) ++
      (0 until n).map(i => Seq(i.toDouble, s"row_${i}_payload_padding_padding_padding"))
    val stream = biffStream(Seq("Big" -> rows))
    assert(stream.length >= 4096, s"fixture must exercise the FAT tier, got ${stream.length}")
    val path = tmpXls("big.xls", cfb(stream))
    val df = Xls.read(spark, path)
    assert(df.count() == n)
    val got = df.collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got(0.0) == "row_0_payload_padding_padding_padding")
    assert(got((n - 1).toDouble) == s"row_${n - 1}_payload_padding_padding_padding")
  }

  test("magic dispatch: OLE2 bytes behind an .xlsx name still read as .xls") {
    val sheets = Seq("S" -> Seq(Seq("x"), Seq(7.0)))
    val path = tmpXls("mislabeled.xlsx", cfb(biffStream(sheets)))
    assert(Sources.readExcel(spark, path).head().getDouble(0) == 7.0)
    // and readAny routes .xls through the same dispatch
    val p2 = tmpXls("via_any.xls", cfb(biffStream(sheets)))
    assert(Sources.readAny(spark, p2).head().getDouble(0) == 7.0)
  }

  test("DataFrame writeSheets -> read round-trips values, types, nulls, sheet names") {
    import spark.implicits._
    val metrics = Seq((1L, 2.5, "a"), (2L, -0.25, null), (3L, 11.0, "c"))
      .toDF("k", "v", "tag")
    val labels = Seq(("x", 1.0), ("y", 2.0)).toDF("name", "w")
    val dir = java.nio.file.Files.createTempDirectory("graft_xls_rt")
    val p = dir.resolve("rt.xls").toString
    XlsWriter.writeSheets(Seq("Metrics" -> metrics, "Labels" -> labels), p)
    assert(Xls.sheetNames(p) == Seq("Metrics", "Labels"))
    val back = Xls.read(spark, p)
    assert(back.schema("k").dataType == DoubleType &&
      back.schema("v").dataType == DoubleType &&
      back.schema("tag").dataType == StringType)
    val got = back.collect().map(r => (r.getDouble(0), r.getDouble(1),
      if (r.isNullAt(2)) null else r.getString(2)))
    assert(got.toSeq == Seq((1.0, 2.5, "a"), (2.0, -0.25, null), (3.0, 11.0, "c")))
    assert(Xls.read(spark, p, Right("Labels")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(("x", 1.0), ("y", 2.0)))
  }

  test("clear errors: BIFF5 version, non-CFB bytes, bad sheet selector") {
    val biff5 = {
      val s = biffStream(Seq("S" -> Seq(Seq("x"), Seq(1.0))))
      s(4) = 0x00; s(5) = 0x05 // patch BOF version to 0x0500
      s
    }
    val e1 = intercept[IllegalArgumentException] {
      Xls.read(spark, tmpXls("biff5.xls", cfb(biff5)))
    }
    assert(e1.getMessage.contains("BIFF8"))
    val e2 = intercept[IllegalArgumentException] {
      Xls.read(spark, tmpXls("junk.xls", Array.fill[Byte](600)(0x42)))
    }
    assert(e2.getMessage.contains("OLE2"))
    val ok = tmpXls("ok.xls", cfb(biffStream(Seq("S" -> Seq(Seq("x"), Seq(1.0))))))
    val e3 = intercept[IllegalArgumentException] { Xls.read(spark, ok, Left(3)) }
    assert(e3.getMessage.contains("out of range"))
    val e4 = intercept[IllegalArgumentException] { Xls.read(spark, ok, Right("nope")) }
    assert(e4.getMessage.contains("no sheet named"))
  }
}
