package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.NumericType

/** Minimal legacy binary Excel (.xls) WRITER — BIFF8 records in a CFB
  * container, built from the public [MS-CFB]/[MS-XLS] specifications with
  * only the JDK. The interchange counterpart of [[Xls.read]] (and the
  * .xls sibling of [[Xlsx.write]]): a driver-side export path for SMALL,
  * bounded results (reports, samples, fixtures) — never a distributed
  * sink. Numeric columns become NUMBER cells, strings go through the SST
  * (shared across sheets, CONTINUE-split at string boundaries when a
  * record would overflow), booleans become BOOLERR cells, nulls are
  * blank. Streams under the 4096-byte CFB cutoff land in the mini-stream
  * tier, larger ones in regular FAT chains — both [[Xls.read]] tiers are
  * produced by the same writer.
  */
object XlsWriter {

  /** Cell markers for the low-level [[sheets]] API (tests exercise every
    * BIFF8 cell record type through these; the DataFrame [[write]] uses
    * String/Double/Boolean/null only). */
  final case class Rk(v: Double)
  final case class MulRkRun(vs: Seq[Double])
  final case class FormulaNum(v: Double)
  final case class FormulaStr(s: String)
  final case class FormulaBool(b: Boolean)

  private def u16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def u32(v: Int): Array[Byte] = u16(v & 0xFFFF) ++ u16((v >>> 16) & 0xFFFF)
  private def f64(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    (0 until 8).map(i => ((bits >>> (8 * i)) & 0xFF).toByte).toArray
  }
  private def rec(id: Int, data: Array[Byte]): Array[Byte] = u16(id) ++ u16(data.length) ++ data

  /** RK encoding of `v`, if any of the four encodings is exact. */
  private def rkBits(v: Double): Option[Int] = {
    def intForm(x: Double, flag: Int): Option[Int] =
      if (x == math.floor(x) && x >= -(1 << 29) && x < (1 << 29))
        Some((x.toInt << 2) | flag) else None
    def floatForm(x: Double, flag: Int): Option[Int] = {
      val bits = java.lang.Double.doubleToLongBits(x)
      if ((bits & 0x3FFFFFFFFL) == 0) Some(((bits >>> 32).toInt & ~3) | flag) else None
    }
    intForm(v, 2).orElse(floatForm(v, 0))
      .orElse(intForm(v * 100, 3).filter(_ => v * 100 == math.floor(v * 100)))
      .orElse(floatForm(v * 100, 1))
  }

  /** XLUnicodeString (16-bit length + flags byte): compressed 8-bit page
    * when every char fits, UTF-16LE otherwise. Shared by the SST and the
    * STRING (formula cached result) records. */
  private def xlUniStr16(s0: String): Array[Byte] = {
    val high = s0.exists(_ > 0xFF)
    u16(s0.length) ++ Array((if (high) 1 else 0).toByte) ++
      (if (high) s0.toArray.flatMap(c => u16(c.toInt)) else s0.map(_.toByte).toArray)
  }

  /** SST record (+CONTINUEs): splits at string boundaries when the data
    * would exceed `maxRecData` (8224 = the real BIFF record limit). */
  private def sstRecords(strings: Seq[String], maxRecData: Int): Array[Byte] = {
    val chunks = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer[Byte]())
    chunks.head ++= u32(strings.size) ++ u32(strings.size)
    strings.foreach { s0 =>
      val b = xlUniStr16(s0)
      require(b.length <= maxRecData,
        s"single string of ${s0.length} chars exceeds the BIFF record cap")
      if (chunks.last.size + b.length > maxRecData)
        chunks += scala.collection.mutable.ArrayBuffer[Byte]()
      chunks.last ++= b
    }
    rec(0x00FC, chunks.head.toArray) ++
      chunks.tail.flatMap(c => rec(0x003C, c.toArray))
  }

  /** The BIFF8 workbook stream: globals (BOF, BOUNDSHEETs, SST, EOF) then
    * one worksheet substream per sheet. Low-level cell API — see the cell
    * marker case classes above; plain String/Double/Boolean/null also
    * accepted. */
  def biffStream(sheets: Seq[(String, Seq[Seq[Any]])], maxRecData: Int = 8224,
      biffVersion: Int = 0x0600): Array[Byte] = {
    // BIFF8 hard limits: row is a u16 (65536 rows), column a byte-bounded
    // u16 (256 columns). Writing past them would WRAP the index and
    // silently overwrite earlier cells — fail loudly instead.
    sheets.foreach { case (name, rows) =>
      require(rows.size <= 65536,
        s"sheet '$name': ${rows.size} rows exceed the BIFF8 limit of 65536 — " +
          "data this size belongs in parquet, not .xls")
      val maxCols = if (rows.isEmpty) 0 else rows.iterator.map(_.size).max
      require(maxCols <= 256,
        s"sheet '$name': $maxCols columns exceed the BIFF8 limit of 256")
    }
    val strings = sheets.flatMap(_._2.flatten).collect { case s: String => s }.distinct
    val sstIdx = strings.zipWithIndex.toMap
    def bof(dt: Int) = rec(0x0809, u16(biffVersion) ++ u16(dt) ++ Array.fill[Byte](12)(0))
    val eof = rec(0x000A, Array.empty)
    def cellRecs(r: Int, row: Seq[Any]): Array[Byte] = {
      var c = 0
      val out = new java.io.ByteArrayOutputStream()
      row.foreach { v =>
        val base = u16(r) ++ u16(c) ++ u16(0)
        v match {
          case null => c += 1
          case s0: String =>
            out.write(rec(0x00FD, base ++ u32(sstIdx(s0)))); c += 1
          case d: Double =>
            out.write(rec(0x0203, base ++ f64(d))); c += 1
          case b: Boolean =>
            out.write(rec(0x0205, base ++ Array((if (b) 1 else 0).toByte, 0.toByte))); c += 1
          case Rk(d) =>
            val bits = rkBits(d).getOrElse(sys.error(s"$d has no exact RK form"))
            out.write(rec(0x027E, base ++ u32(bits))); c += 1
          case MulRkRun(vs) =>
            val body = u16(r) ++ u16(c) ++
              vs.flatMap(d => u16(0) ++ u32(rkBits(d).getOrElse(
                sys.error(s"$d has no exact RK form")))).toArray ++
              u16(c + vs.size - 1)
            out.write(rec(0x00BD, body)); c += vs.size
          case FormulaNum(d) =>
            out.write(rec(0x0006, base ++ f64(d) ++ u16(0) ++ u32(0) ++ u16(0))); c += 1
          case FormulaBool(b) =>
            val cached = Array[Byte](1, 0, (if (b) 1 else 0).toByte, 0, 0, 0, -1, -1)
            out.write(rec(0x0006, base ++ cached ++ u16(0) ++ u32(0) ++ u16(0))); c += 1
          case FormulaStr(s0) =>
            val cached = Array[Byte](0, 0, 0, 0, 0, 0, -1, -1)
            out.write(rec(0x0006, base ++ cached ++ u16(0) ++ u32(0) ++ u16(0)))
            out.write(rec(0x0207, xlUniStr16(s0))); c += 1
          case other => sys.error(s"unsupported cell value: $other")
        }
      }
      out.toByteArray
    }
    val sheetStreams = sheets.map { case (_, rows) =>
      bof(0x0010) ++ rows.zipWithIndex.flatMap { case (row, r) => cellRecs(r, row) } ++ eof
    }
    val sst = sstRecords(strings, maxRecData)
    // BOUNDSHEET needs each sheet's absolute BOF offset: globals length is
    // known from the record sizes alone, so lay out in two passes
    def bsRec(name: String, pos: Int): Array[Byte] = {
      require(name.nonEmpty && name.length <= 31 && name.forall(_ <= 0xFF),
        s"sheet name '$name' must be 1-31 8-bit chars")
      rec(0x0085, u32(pos) ++ u16(0) ++
        Array(name.length.toByte, 0.toByte) ++ name.map(_.toByte).toArray)
    }
    val globalsLen = bof(0x0005).length +
      sheets.map { case (n, _) => 4 + 8 + n.length }.sum + sst.length + eof.length
    var off = globalsLen
    val offsets = sheetStreams.map { ss => val o = off; off += ss.length; o }
    bof(0x0005) ++
      sheets.zip(offsets).flatMap { case ((n, _), o) => bsRec(n, o) } ++
      sst ++ eof ++ sheetStreams.flatten
  }

  // ===== CFB container =====================================================

  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD

  private def cfbHeader(numFat: Int, firstDir: Int, firstMiniFat: Int,
      numMiniFat: Int, difat: Seq[Int]): Array[Byte] = {
    val h = new java.io.ByteArrayOutputStream()
    h.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    h.write(Array.fill[Byte](16)(0))            // CLSID
    h.write(u16(0x003E)); h.write(u16(0x0003))  // minor/major version
    h.write(u16(0xFFFE))                        // little-endian marker
    h.write(u16(9)); h.write(u16(6))            // sector/mini shifts
    h.write(Array.fill[Byte](6)(0))
    h.write(u32(0))                             // v3: dir sector count = 0
    h.write(u32(numFat))
    h.write(u32(firstDir))
    h.write(u32(0))                             // transaction signature
    h.write(u32(4096))                          // mini cutoff
    h.write(u32(firstMiniFat)); h.write(u32(numMiniFat))
    h.write(u32(EndOfChain)); h.write(u32(0))   // no DIFAT sectors
    (0 until 109).foreach(i => h.write(u32(if (i < difat.size) difat(i) else FreeSect)))
    val out = h.toByteArray
    require(out.length == 512, s"header ${out.length}")
    out
  }

  private def dirEntry(name: String, objType: Int, child: Int,
      start: Int, size: Int): Array[Byte] = {
    val e = new java.io.ByteArrayOutputStream()
    val nameBytes = name.toArray.flatMap(c => u16(c.toInt))
    e.write(nameBytes ++ Array.fill[Byte](64 - nameBytes.length)(0))
    e.write(u16(if (name.isEmpty) 0 else nameBytes.length + 2))
    e.write(Array((objType & 0xFF).toByte, 1.toByte)) // type, black
    e.write(u32(FreeSect)); e.write(u32(FreeSect))    // left/right = NOSTREAM
    e.write(u32(child))
    e.write(Array.fill[Byte](36)(0))                  // CLSID, state, times
    e.write(u32(start)); e.write(u32(size)); e.write(u32(0))
    val out = e.toByteArray
    require(out.length == 128, s"dir entry ${out.length}")
    out
  }

  private def sectorPad(b: Array[Byte]): Array[Byte] =
    b ++ Array.fill[Byte]((512 - b.length % 512) % 512)(0)

  private def fatSector(entries: Seq[Int]): Array[Byte] = {
    require(entries.size <= 128)
    entries.flatMap(u32).toArray ++
      Array.fill[Byte]((128 - entries.size) * 4)(FreeSect.toByte)
  }

  /** Wrap a Workbook stream in a CFB container, choosing the storage tier
    * the spec mandates for its size. */
  def cfb(stream: Array[Byte]): Array[Byte] =
    if (stream.length < 4096) cfbMini(stream) else cfbFat(stream)

  private def cfbMini(stream: Array[Byte]): Array[Byte] = {
    val miniSectors = (stream.length + 63) / 64
    val miniBytes = miniSectors * 64
    val containerSectors = (miniBytes + 511) / 512
    // sectors: 0 = FAT, 1 = directory, 2 = mini-FAT, 3.. = mini container
    val fat = fatSector(
      Seq(FatSect, EndOfChain, EndOfChain) ++
        (0 until containerSectors).map(i =>
          if (i == containerSectors - 1) EndOfChain else 4 + i))
    val dir = dirEntry("Root Entry", 5, child = 1, start = 3, size = miniBytes) ++
      dirEntry("Workbook", 2, child = FreeSect, start = 0, size = stream.length) ++
      dirEntry("", 0, FreeSect, 0, 0) ++ dirEntry("", 0, FreeSect, 0, 0)
    val miniFat = fatSector(
      (0 until miniSectors).map(i => if (i == miniSectors - 1) EndOfChain else i + 1))
    val container = sectorPad(stream ++ Array.fill[Byte](miniBytes - stream.length)(0))
    cfbHeader(numFat = 1, firstDir = 1, firstMiniFat = 2, numMiniFat = 1,
      difat = Seq(0)) ++ fat ++ dir ++ miniFat ++ container
  }

  private def cfbFat(stream: Array[Byte]): Array[Byte] = {
    val streamSectors = (stream.length + 511) / 512
    var numFat = 1
    while (128 * numFat < numFat + 1 + streamSectors) numFat += 1
    require(numFat <= 109, "stream too large for the header-DIFAT-only layout " +
      "(~6.9 MB) — an .xls this size should be parquet")
    val firstStream = numFat + 1
    val entries = (0 until numFat).map(_ => FatSect) ++ Seq(EndOfChain) ++
      (0 until streamSectors).map(i =>
        if (i == streamSectors - 1) EndOfChain else firstStream + i + 1)
    val fatBytes = entries.grouped(128).map(g => fatSector(g.toSeq)).toArray
    // pad the FAT area to exactly numFat sectors
    val fat = fatBytes.flatten ++
      Array.fill[Byte]((numFat - fatBytes.length) * 512)(FreeSect.toByte)
    val dir = dirEntry("Root Entry", 5, child = 1, start = EndOfChain, size = 0) ++
      dirEntry("Workbook", 2, child = FreeSect, start = firstStream, size = stream.length) ++
      dirEntry("", 0, FreeSect, 0, 0) ++ dirEntry("", 0, FreeSect, 0, 0)
    cfbHeader(numFat = numFat, firstDir = numFat, firstMiniFat = EndOfChain,
      numMiniFat = 0, difat = 0 until numFat) ++
      fat ++ dir ++ sectorPad(stream)
  }

  // ===== DataFrame-level surface ===========================================

  /** Write (small, driver-collected) DataFrames as a multi-sheet .xls —
    * the [[Xlsx.writeSheets]] contract on the BIFF8 plane: numeric
    * columns as NUMBER cells, everything else as shared strings, nulls
    * blank, header row = column names. Round-trips through [[Xls.read]].
    */
  def writeSheets(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "writeSheets needs at least one sheet")
    require(sheets.map(_._1).distinct.size == sheets.size,
      s"duplicate sheet names: ${sheets.map(_._1).mkString(", ")}")
    val cellSheets = sheets.map { case (name, df) =>
      val numeric = df.schema.fields.map(_.dataType.isInstanceOf[NumericType])
      val header: Seq[Any] = df.columns.toSeq
      val rows = df.collect().toSeq.map { row =>
        row.toSeq.zipWithIndex.map {
          case (null, _) => null
          case (v, i) if numeric(i) => v.toString.toDouble
          case (v, _) => v.toString
        }
      }
      name -> (header +: rows)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), cfb(biffStream(cellSheets)))
  }

  def write(df: DataFrame, path: String): Unit = writeSheets(Seq("Sheet1" -> df), path)
}
