package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** S2b — minimal legacy binary Excel (.xls, BIFF8-in-CFB) reader using only
  * the JDK, closing the `pd.read_excel` surface for OLE2 workbooks
  * (`DIH.py:172-173` — pandas dispatches .xls to xlrd). Like [[Xlsx]],
  * this is a DRIVER-SIDE upload-ingestion path for small files — convert
  * to parquet immediately before any heavy processing — never a
  * distributed scan.
  *
  * Supported subset (the cell population pandas reads from typical
  * workbooks): multiple sheets in workbook (BOUNDSHEET) order, selected by
  * 0-based index or name; shared strings (SST incl. CONTINUE spans and
  * mid-string character splits, compressed and UTF-16 pages), inline
  * LABEL strings, NUMBER/RK/MULRK numerics, BOOLERR booleans, FORMULA
  * cached results (numeric, string via trailing STRING record, boolean).
  * First row = header; a column whose every non-empty data cell is
  * numeric becomes DoubleType (pandas inference), everything else
  * StringType. Cell error values and blanks are null.
  *
  * Container: CFB v3/v4 (512/4096-byte sectors) with DIFAT, FAT chains,
  * and the mini-stream/mini-FAT tier (streams under the 4096-byte cutoff
  * — where small real-world workbooks actually live). Chain walks are
  * loop-guarded so a corrupt FAT fails fast instead of spinning.
  *
  * Formats are parsed from the public specifications ([MS-CFB] and
  * [MS-XLS]); no third-party Excel library exists in this offline
  * environment.
  */
object Xls {

  // ===== CFB (Compound File Binary, [MS-CFB]) ==============================

  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD
  private val DifatSect = 0xFFFFFFFC

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) | ((b(p + 2) & 0xFF) << 16) |
      ((b(p + 3) & 0xFF) << 24)

  /** Parsed compound file: enough to locate and read one named stream. */
  private final class Cfb(bytes: Array[Byte], path: String) {
    require(bytes.length >= 8 &&
      u32(bytes, 0) == 0xE011CFD0 && u32(bytes, 4) == 0xE11AB1A1,
      s"$path: not an OLE2/CFB file")
    require(bytes.length >= 512, s"$path: truncated OLE2/CFB file " +
      s"(${bytes.length} bytes, header needs 512)")
    private val sectorShift = u16(bytes, 30)
    require(sectorShift == 9 || sectorShift == 12,
      s"$path: unsupported CFB sector shift $sectorShift")
    private val sectorSize = 1 << sectorShift
    private val miniShift = u16(bytes, 32)
    private val miniSize = 1 << miniShift
    private val numFatSectors = u32(bytes, 44)
    private val firstDirSector = u32(bytes, 48)
    private val miniCutoff = u32(bytes, 56)
    private val firstMiniFatSector = u32(bytes, 60)
    private val firstDifatSector = u32(bytes, 68)
    // hard ceiling on any chain walk: the file itself bounds sector count
    private val maxSectors = bytes.length / sectorSize + 2

    private def sector(id: Int): Array[Byte] = {
      val off = (id + 1) * sectorSize
      require(off >= 0 && off + sectorSize <= bytes.length,
        s"$path: sector $id out of bounds")
      java.util.Arrays.copyOfRange(bytes, off, off + sectorSize)
    }

    /** FAT as a flat next-pointer array, assembled via the header DIFAT +
      * DIFAT sector chain. */
    private val fat: Array[Int] = {
      val fatSectorIds = mutable.ArrayBuffer.empty[Int]
      var i = 76
      while (i < 512 && fatSectorIds.size < 109) {
        val v = u32(bytes, i)
        if (v != FreeSect && v != EndOfChain) fatSectorIds += v
        i += 4
      }
      var difat = firstDifatSector
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect) {
        require(guard < maxSectors, s"$path: DIFAT chain loop")
        guard += 1
        val s = sector(difat)
        var j = 0
        while (j < sectorSize - 4) {
          val v = u32(s, j)
          if (v != FreeSect) fatSectorIds += v
          j += 4
        }
        difat = u32(s, sectorSize - 4)
      }
      require(fatSectorIds.size >= numFatSectors,
        s"$path: DIFAT lists ${fatSectorIds.size} FAT sectors, header claims $numFatSectors")
      fatSectorIds.take(numFatSectors).iterator.flatMap { sid =>
        val s = sector(sid)
        (0 until sectorSize by 4).map(u32(s, _))
      }.toArray
    }

    /** Concatenated chain bytes from the regular FAT, truncated to `size`. */
    private def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sid = start
      var guard = 0
      while (sid != EndOfChain && out.size < size) {
        require(sid >= 0 && sid < fat.length && sid != FreeSect && sid != FatSect &&
          sid != DifatSect, s"$path: bad FAT chain sector $sid")
        require(guard < maxSectors, s"$path: FAT chain loop at sector $sid")
        guard += 1
        out.write(sector(sid))
        sid = fat(sid)
      }
      require(out.size >= size, s"$path: stream chain shorter than declared size")
      java.util.Arrays.copyOfRange(out.toByteArray, 0, size.toInt)
    }

    /** Directory entries: (name, objectType, startSector, size). */
    private val dirEntries: IndexedSeq[(String, Int, Int, Long)] = {
      // the directory stream's length is not declared anywhere; walk its
      // chain to ENDOFCHAIN
      val out = new java.io.ByteArrayOutputStream()
      var sid = firstDirSector
      var guard = 0
      while (sid != EndOfChain) {
        require(sid >= 0 && sid < fat.length, s"$path: bad directory sector $sid")
        require(guard < maxSectors, s"$path: directory chain loop")
        guard += 1
        out.write(sector(sid))
        sid = fat(sid)
      }
      val d = out.toByteArray
      (0 until d.length / 128).map { i =>
        val p = i * 128
        val nameLen = u16(d, p + 64) // bytes incl. the UTF-16 terminator
        // the name field is 64 bytes; a longer declared length is corrupt —
        // treat the entry as unnamed rather than reading past the field
        val name = if (nameLen >= 2 && nameLen <= 64)
          new String(d, p, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
        // v3 stream sizes fit in the low u32; the high half is unused there
        val size = (u32(d, p + 120).toLong & 0xFFFFFFFFL) |
          (if (sectorShift == 12) (u32(d, p + 124).toLong & 0xFFFFFFFFL) << 32 else 0L)
        (name, d(p + 66) & 0xFF, u32(d, p + 116), size)
      }
    }

    /** The mini-stream container (root entry's chain) + mini-FAT. */
    private lazy val miniStream: Array[Byte] = {
      val root = dirEntries.find(_._2 == 5).getOrElse(
        throw new IllegalArgumentException(s"$path: CFB has no root directory entry"))
      readChain(root._3, root._4)
    }
    private lazy val miniFat: Array[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      var sid = firstMiniFatSector
      var guard = 0
      while (sid != EndOfChain && sid != FreeSect) {
        require(guard < maxSectors, s"$path: mini-FAT chain loop")
        guard += 1
        val s = sector(sid)
        (0 until sectorSize by 4).foreach(p => out += u32(s, p))
        sid = fat(sid)
      }
      out.toArray
    }

    private def readMiniChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sid = start
      var guard = 0
      while (sid != EndOfChain && out.size < size) {
        require(sid >= 0 && sid < miniFat.length,
          s"$path: bad mini-FAT chain sector $sid")
        require(guard < miniFat.length + 2, s"$path: mini-FAT chain loop")
        guard += 1
        val off = sid * miniSize
        require(off + miniSize <= miniStream.length,
          s"$path: mini sector $sid beyond mini stream")
        out.write(miniStream, off, miniSize)
        sid = miniFat(sid)
      }
      require(out.size >= size, s"$path: mini stream chain shorter than declared size")
      java.util.Arrays.copyOfRange(out.toByteArray, 0, size.toInt)
    }

    def stream(names: Seq[String]): Array[Byte] = {
      val e = dirEntries.find(d => d._2 == 2 && names.contains(d._1)).getOrElse(
        throw new IllegalArgumentException(
          s"$path: no ${names.mkString("/")} stream (have: " +
            dirEntries.filter(_._2 == 2).map(_._1).mkString(", ") + ")"))
      if (e._4 < miniCutoff) readMiniChain(e._3, e._4) else readChain(e._3, e._4)
    }
  }

  // ===== BIFF8 record stream ([MS-XLS]) ====================================

  private val RecBof = 0x0809
  private val RecEof = 0x000A
  private val RecContinue = 0x003C
  private val RecSst = 0x00FC
  private val RecBoundSheet = 0x0085
  private val RecNumber = 0x0203
  private val RecRk = 0x027E
  private val RecMulRk = 0x00BD
  private val RecLabelSst = 0x00FD
  private val RecLabel = 0x0204
  private val RecBoolErr = 0x0205
  private val RecFormula = 0x0006
  private val RecString = 0x0207

  /** One physical record: (id, data offset in stream, data length). */
  private def recordsOf(s: Array[Byte]): IndexedSeq[(Int, Int, Int)] = {
    val out = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var p = 0
    while (p + 4 <= s.length) {
      val id = u16(s, p); val len = u16(s, p + 2)
      if (p + 4 + len > s.length) p = s.length // truncated tail: stop
      else { out += ((id, p + 4, len)); p = p + 4 + len }
    }
    out.toIndexedSeq
  }

  /** Cursor over a record plus its CONTINUE successors — SST strings span
    * records, and at a mid-string character split the continuation
    * restarts with a fresh flags byte ([MS-XLS] 2.5.293). `recs` must be
    * the slice [base record, its CONTINUEs...].
    */
  private[sources] final class RecCursor(s: Array[Byte], recs: IndexedSeq[(Int, Int, Int)]) {
    private var ri = 0
    private var p = recs.head._2
    private def end = recs(ri)._2 + recs(ri)._3
    private def hop(): Unit = { // advance into the next CONTINUE
      ri += 1
      require(ri < recs.size, "SST data exhausted mid-structure")
      p = recs(ri)._2
    }
    def u16n(): Int = { if (p >= end) hop(); val v = u16(s, p); p += 2; v }
    def u32n(): Int = { if (p >= end) hop(); val v = u32(s, p); p += 4; v }
    def u8n(): Int = { if (p >= end) hop(); val v = s(p) & 0xFF; p += 1; v }
    def skip(n: Int): Unit = { // raw bytes, plain continuation (no flags byte)
      var left = n
      while (left > 0) {
        if (p >= end) hop()
        val take = math.min(left, end - p)
        p += take; left -= take
      }
    }
    /** cch characters with the BIFF8 split rule: when chars run out at a
      * record boundary, the CONTINUE's first byte is a NEW flags byte that
      * may switch between compressed (1 byte/char) and UTF-16 pages. */
    def chars(cch: Int, highByte0: Boolean): String = {
      val sb = new java.lang.StringBuilder(cch)
      var high = highByte0
      var left = cch
      while (left > 0) {
        if (p >= end) { hop(); high = (u8nRaw() & 0x01) != 0 }
        val width = if (high) 2 else 1
        val avail = (end - p) / width
        val take = math.min(left, math.max(avail, 0))
        require(take > 0 || p >= end, "SST char fragment stuck")
        var i = 0
        while (i < take) {
          val c = if (high) u16(s, p + i * 2) else s(p + i) & 0xFF
          sb.append(c.toChar)
          i += 1
        }
        p += take * width
        left -= take
        // width-1 leftover byte before a split cannot happen: splits are
        // only legal on character boundaries
        if (left > 0 && p < end) throw new IllegalArgumentException(
          "SST string fragment ended before record boundary")
      }
      sb.toString
    }
    private def u8nRaw(): Int = { val v = s(p) & 0xFF; p += 1; v }
  }

  /** Parse the SST record (+ CONTINUEs) into the shared-string table. */
  private[sources] def parseSst(s: Array[Byte],
      recs: IndexedSeq[(Int, Int, Int)]): IndexedSeq[String] = {
    val cur = new RecCursor(s, recs)
    cur.u32n() // total refs (unused)
    val unique = cur.u32n()
    (0 until unique).map { _ =>
      val cch = cur.u16n()
      val flags = cur.u8n()
      val high = (flags & 0x01) != 0
      val ext = (flags & 0x04) != 0
      val rich = (flags & 0x08) != 0
      val cRun = if (rich) cur.u16n() else 0
      val cbExt = if (ext) cur.u32n() else 0
      val str = cur.chars(cch, high)
      cur.skip(cRun * 4 + cbExt)
      str
    }
  }

  /** XLUnicodeString (16-bit length) read flat from one record. */
  private def unicodeStr16(s: Array[Byte], p0: Int): String = {
    val cch = u16(s, p0)
    val high = (s(p0 + 2) & 0x01) != 0
    readChars(s, p0 + 3, cch, high)
  }
  /** ShortXLUnicodeString (8-bit length; BOUNDSHEET names). */
  private def unicodeStr8(s: Array[Byte], p0: Int): String = {
    val cch = s(p0) & 0xFF
    val high = (s(p0 + 1) & 0x01) != 0
    readChars(s, p0 + 2, cch, high)
  }
  private def readChars(s: Array[Byte], p: Int, cch: Int, high: Boolean): String = {
    val sb = new java.lang.StringBuilder(cch)
    var i = 0
    while (i < cch) {
      sb.append((if (high) u16(s, p + i * 2) else s(p + i) & 0xFF).toChar)
      i += 1
    }
    sb.toString
  }

  /** RK number decode: bit0 = value is scaled by 100, bit1 = value is a
    * 30-bit signed int, else the top 30 bits are the top of an IEEE
    * double. */
  private[sources] def rkToDouble(rk: Int): Double = {
    val v = if ((rk & 2) != 0) (rk >> 2).toDouble
    else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  // ===== workbook assembly =================================================

  private def workbookStream(path: String): Array[Byte] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    new Cfb(bytes, path).stream(Seq("Workbook", "Book"))
  }

  /** Sheet inventory in workbook (BOUNDSHEET) order: (name, BOF offset). */
  private def sheetDirectory(s: Array[Byte], path: String): IndexedSeq[(String, Int)] = {
    val recs = recordsOf(s)
    require(recs.nonEmpty && recs.head._1 == RecBof,
      s"$path: workbook stream does not start with BOF (not BIFF8?)")
    val biffVer = u16(s, recs.head._2)
    require(biffVer == 0x0600,
      f"$path: BIFF version 0x$biffVer%04X unsupported (need BIFF8 = 0x0600; " +
        "BIFF5/95 and earlier are not supported — re-save as .xlsx or CSV)")
    // globals substream = records up to the first EOF
    val globalsEnd = recs.indexWhere(_._1 == RecEof)
    require(globalsEnd > 0, s"$path: workbook globals have no EOF")
    recs.take(globalsEnd).collect {
      case (RecBoundSheet, off, _) =>
        // skip hidden-state/type bytes; include every sheet like pandas'
        // sheet_name= indexing does (visibility affects UI, not data)
        (unicodeStr8(s, off + 6), u32(s, off))
    }
  }

  /** Sheet names in workbook order (`pd.ExcelFile(...).sheet_names`). */
  def sheetNames(path: String): Seq[String] = {
    val s = workbookStream(path)
    sheetDirectory(s, path).map(_._1)
  }

  /** Cells of one worksheet substream: (row, col) -> Double | String. */
  private def sheetCells(s: Array[Byte], bofOffset: Int,
      sst: IndexedSeq[String], path: String): mutable.Map[(Int, Int), Any] = {
    val cells = mutable.Map.empty[(Int, Int), Any]
    // bofOffset is the position of the sheet's BOF record HEADER
    var p = bofOffset
    require(p + 4 <= s.length && u16(s, p) == RecBof,
      s"$path: BOUNDSHEET offset $bofOffset does not point at a BOF record")
    var lastFormulaCell: Option[(Int, Int)] = None // for STRING results
    var done = false
    while (!done && p + 4 <= s.length) {
      val id = u16(s, p); val len = u16(s, p + 2); val d = p + 4
      // fail fast on a record whose declared length runs past the stream
      // (truncated workbook), instead of AIOOBE mid-cell-parse
      require(d + len <= s.length,
        s"$path: record 0x${id.toHexString} at offset $p overruns the stream " +
          s"(declared $len bytes, ${s.length - d} remain)")
      id match {
        case RecEof => done = true
        case RecNumber =>
          val bits = (0 until 8).map(i => (s(d + 6 + i).toLong & 0xFF) << (8 * i)).sum
          cells((u16(s, d), u16(s, d + 2))) = java.lang.Double.longBitsToDouble(bits)
        case RecRk =>
          cells((u16(s, d), u16(s, d + 2))) = rkToDouble(u32(s, d + 6))
        case RecMulRk =>
          val row = u16(s, d); val colFirst = u16(s, d + 2)
          val nCells = (len - 6) / 6
          (0 until nCells).foreach { i =>
            cells((row, colFirst + i)) = rkToDouble(u32(s, d + 4 + i * 6 + 2))
          }
        case RecLabelSst =>
          val isst = u32(s, d + 6)
          require(isst >= 0 && isst < sst.size,
            s"$path: LABELSST index $isst out of range (SST has ${sst.size})")
          cells((u16(s, d), u16(s, d + 2))) = sst(isst)
        case RecLabel =>
          cells((u16(s, d), u16(s, d + 2))) = unicodeStr16(s, d + 6)
        case RecBoolErr =>
          if ((s(d + 7) & 0xFF) == 0) // fError=0: boolean; errors stay null
            cells((u16(s, d), u16(s, d + 2))) =
              (if ((s(d + 6) & 0xFF) != 0) "TRUE" else "FALSE")
        case RecFormula =>
          val rc = (u16(s, d), u16(s, d + 2))
          if (u16(s, d + 12) == 0xFFFF) (s(d + 6) & 0xFF) match {
            case 0 => lastFormulaCell = Some(rc) // string: value follows in STRING
            case 1 => cells(rc) = (if ((s(d + 8) & 0xFF) != 0) "TRUE" else "FALSE")
            case _ => // error or empty-string cached result: null
          } else {
            val bits = (0 until 8).map(i => (s(d + 6 + i).toLong & 0xFF) << (8 * i)).sum
            cells(rc) = java.lang.Double.longBitsToDouble(bits)
          }
        case RecString =>
          lastFormulaCell.foreach(rc => cells(rc) = unicodeStr16(s, d))
          lastFormulaCell = None
        case _ => // dimensions, formats, window state, ...: irrelevant to values
      }
      p = d + len
    }
    require(done, s"$path: worksheet substream has no EOF")
    cells
  }

  /** Read one sheet of an .xls into a DataFrame — same surface and
    * inference contract as [[Xlsx.read]]: header row -> column names, a
    * column whose every non-empty data cell is numeric becomes DoubleType,
    * everything else StringType; `sheet` selects by 0-based workbook-order
    * index or by display name. Rows with no cells at all inside the used
    * range stay as all-null rows (pandas parity).
    */
  def read(spark: SparkSession, path: String,
      sheet: Either[Int, String] = Left(0)): DataFrame = {
    val s = workbookStream(path)
    val sheets = sheetDirectory(s, path)
    val bof = sheet match {
      case Left(i) =>
        if (i < 0 || i >= sheets.size) throw new IllegalArgumentException(
          s"$path: sheet index $i out of range (${sheets.size} sheet(s))")
        sheets(i)._2
      case Right(n) => sheets.find(_._1 == n).map(_._2)
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no sheet named '$n' (have: ${sheets.map(_._1).mkString(", ")})"))
    }
    val recs = recordsOf(s)
    val sst: IndexedSeq[String] = recs.indexWhere(_._1 == RecSst) match {
      case -1 => IndexedSeq.empty
      case i =>
        val contEnd = (i + 1 until recs.size).find(j => recs(j)._1 != RecContinue)
          .getOrElse(recs.size)
        parseSst(s, recs.slice(i, contEnd))
    }
    val cells = sheetCells(s, bof, sst, path)
    require(cells.nonEmpty, s"$path: empty sheet")

    val nRows = cells.keys.map(_._1).max + 1
    val nCols = cells.keys.map(_._2).max + 1
    val header = (0 until nCols).map { c =>
      cells.get((0, c)).map {
        case dd: Double if dd == dd.floor && !dd.isInfinite && math.abs(dd) < 1e15 =>
          dd.toLong.toString
        case v => v.toString
      }.getOrElse(s"_c$c")
    }
    val isDouble = (0 until nCols).map { c =>
      val vals = (1 until nRows).flatMap(r => cells.get((r, c)))
      vals.nonEmpty && vals.forall(_.isInstanceOf[Double])
    }
    val schema = StructType(header.zipWithIndex.map { case (n, c) =>
      StructField(n, if (isDouble(c)) DoubleType else StringType)
    })
    val rows = (1 until nRows).map { r =>
      Row.fromSeq((0 until nCols).map { c =>
        cells.get((r, c)) match {
          case Some(d: Double) => if (isDouble(c)) d else d.toString
          case Some(v) => v.toString
          case None => null
        }
      })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
