package graft.sources

import java.io.{BufferedOutputStream, ByteArrayInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.w3c.dom.Element

import scala.collection.mutable.ArrayBuffer

/** S2 — minimal XLSX reader/writer using only the JDK (zip + DOM XML): no
  * third-party Excel library exists in this offline environment, and the
  * reference's `pd.read_excel` (`DIH.py:172-173`) reads one small uploaded
  * workbook eagerly — so a DRIVER-SIDE parse is the faithful scale
  * contract. This is an upload-ingestion path for small files, not a
  * distributed scan: convert to parquet immediately (as `Pipeline.ingest`
  * does for every format) before any heavy processing. Supported subset:
  * multiple sheets (select by 0-based index or name, workbook.xml-ordered
  * like pandas `sheet_name=`), first row = header, shared/inline strings,
  * numeric cells; pandas-style inference promotes all-numeric columns to
  * double.
  */
object Xlsx {

  private def parseXml(bytes: Array[Byte]) = {
    val f = DocumentBuilderFactory.newInstance()
    // hermetic parse: no DTD/external-entity resolution on untrusted uploads
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def zipEntryBytes(zf: ZipFile, name: String): Option[Array[Byte]] =
    Option(zf.getEntry(name)).map(e => zf.getInputStream(e).readAllBytes())

  private def elements(parent: org.w3c.dom.Document, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def childElements(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** Column index from a cell reference like "BC23" -> 54 (0-based). */
  private[sources] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1

  /** Reject non-zip payloads BEFORE ZipFile turns them into an opaque
    * "zip END header not found": the common failure is a legacy binary
    * .xls renamed to .xlsx — its OLE2/CFB magic (D0 CF 11 E0) is
    * unambiguous, so say exactly that; anything else non-PK gets a clear
    * not-a-workbook message.
    */
  private def sniffMagic(path: String): Unit = {
    val in = new java.io.FileInputStream(path)
    val head = try in.readNBytes(4) finally in.close()
    val isOle2 = head.length == 4 &&
      (head(0) & 0xFF) == 0xD0 && (head(1) & 0xFF) == 0xCF &&
      (head(2) & 0xFF) == 0x11 && (head(3) & 0xFF) == 0xE0
    if (isOle2)
      throw new UnsupportedOperationException(
        s"$path is a legacy binary Excel workbook (OLE2 .xls): use " +
          "Xls.read / Sources.readExcel (which dispatches on the file magic)")
    val isZip = head.length >= 2 && head(0) == 'P'.toByte && head(1) == 'K'.toByte
    if (!isZip)
      throw new IllegalArgumentException(
        s"$path is not an .xlsx workbook (no zip/PK magic)")
  }

  /** Workbook sheet inventory in WORKBOOK ORDER (= pandas' sheet index
    * order): (name, zip entry of the sheet XML). Resolution is the real
    * OPC route — workbook.xml's `<sheet r:id=...>` joined to
    * xl/_rels/workbook.xml.rels targets — because writers do NOT have to
    * name parts sheetN.xml in display order. Only a workbook with NO
    * workbook.xml at all (minimal writers) falls back to the single
    * conventional sheet1.xml; a workbook.xml whose rels part is missing
    * FAILS instead of silently guessing — resolving sheet index 0 to a
    * conventionally-named part that is not the first workbook-order sheet
    * is the same silent-index-shift hazard the dangling-relationship
    * check below refuses.
    */
  private def sheetEntries(zf: ZipFile, path: String): IndexedSeq[(String, String)] = {
    val inventory = zipEntryBytes(zf, "xl/workbook.xml").map { wb =>
      val rels = zipEntryBytes(zf, "xl/_rels/workbook.xml.rels").getOrElse(
        throw new IllegalArgumentException(
          s"$path: xl/workbook.xml is present but xl/_rels/workbook.xml.rels is " +
            "missing — sheet order cannot be resolved; refusing to guess part names"))
      val targets = elements(parseXml(rels), "Relationship").map { r =>
        val t = r.getAttribute("Target")
        r.getAttribute("Id") -> (if (t.startsWith("/")) t.drop(1) else s"xl/$t")
      }.toMap
      elements(parseXml(wb), "sheet").flatMap { s =>
        // the relationship id attribute is namespace-prefixed (r:id by
        // convention); the parser is not namespace-aware, so match the
        // conventional name first and fall back to any *:id prefix
        val rid = {
          val direct = s.getAttribute("r:id")
          if (direct.nonEmpty) direct
          else {
            val attrs = s.getAttributes
            (0 until attrs.getLength).map(attrs.item)
              .collectFirst {
                case a: org.w3c.dom.Attr if a.getName.endsWith(":id") => a.getValue
              }.getOrElse("")
          }
        }
        // FAIL, never skip: dropping a sheet with a dangling relationship
        // would silently shift every later 0-based index onto the wrong
        // sheet — wrong data ingested with no error
        val name = s.getAttribute("name")
        Some(name -> targets.getOrElse(rid,
          throw new IllegalArgumentException(
            s"$path: sheet '$name' references missing relationship '$rid'")))
      }.toIndexedSeq
    }
    inventory match {
      case Some(sheets) =>
        if (sheets.isEmpty) throw new IllegalArgumentException(
          s"$path: xl/workbook.xml declares no sheets")
        sheets
      case None => IndexedSeq("Sheet1" -> "xl/worksheets/sheet1.xml")
    }
  }

  /** Sheet names in workbook order (the `pd.ExcelFile(...).sheet_names`
    * surface). */
  def sheetNames(path: String): Seq[String] = {
    sniffMagic(path)
    val zf = new ZipFile(path)
    try sheetEntries(zf, path).map(_._1)
    finally zf.close()
  }

  /** Read one sheet of an .xlsx into a DataFrame: header row -> column
    * names; a column whose every non-empty cell is numeric becomes
    * DoubleType (pandas inference), everything else StringType.
    * `sheet` selects by 0-based workbook-order index (`Left`, pandas
    * `sheet_name=0` default) or by display name (`Right`) — the
    * `pd.read_excel(..., sheet_name=...)` surface (DIH.py:172-173).
    */
  def read(spark: SparkSession, path: String,
      sheet: Either[Int, String] = Left(0)): DataFrame = {
    sniffMagic(path)
    val zf = new ZipFile(path)
    try {
      val shared: IndexedSeq[String] =
        zipEntryBytes(zf, "xl/sharedStrings.xml").map { b =>
          elements(parseXml(b), "si").map(si => childElements(si, "t")
            .map(_.getTextContent).mkString).toIndexedSeq
        }.getOrElse(IndexedSeq.empty)
      val sheets = sheetEntries(zf, path)
      val entry = sheet match {
        case Left(i) =>
          if (i < 0 || i >= sheets.size) throw new IllegalArgumentException(
            s"$path: sheet index $i out of range (${sheets.size} sheet(s))")
          sheets(i)._2
        case Right(n) => sheets.find(_._1 == n).map(_._2)
          .getOrElse(throw new IllegalArgumentException(
            s"$path: no sheet named '$n' (have: ${sheets.map(_._1).mkString(", ")})"))
      }
      val sheetBytes = zipEntryBytes(zf, entry)
        .getOrElse(throw new IllegalArgumentException(s"$path: missing part $entry"))
      val rows = ArrayBuffer.empty[Map[Int, String]]
      elements(parseXml(sheetBytes), "row").foreach { rowEl =>
        // ECMA-376 makes the cell reference attribute 'r' optional: a cell
        // without it implicitly occupies the column after the previous cell.
        // Track that running index so minimal writers' workbooks don't lose
        // cells to colIndex("") = -1.
        var nextIdx = 0
        val cells = childElements(rowEl, "c").flatMap { c =>
          val ref = c.getAttribute("r")
          val idx = if (ref.isEmpty) nextIdx else colIndex(ref)
          nextIdx = idx + 1
          val t = c.getAttribute("t")
          val value = t match {
            case "s" => childElements(c, "v").headOption
              .map(v => shared(v.getTextContent.trim.toInt))
            case "inlineStr" => Some(childElements(c, "t").map(_.getTextContent).mkString)
            case _ => childElements(c, "v").headOption.map(_.getTextContent)
          }
          value.map(idx -> _)
        }
        rows += cells.toMap
      }
      require(rows.nonEmpty, s"$path: empty sheet")
      val header = rows.head
      val nCols = (rows.map(r => if (r.isEmpty) -1 else r.keys.max).max) + 1
      val names = (0 until nCols).map(i => header.getOrElse(i, s"_c$i"))
      val data = rows.tail.toSeq
      def numeric(s: String): Boolean =
        try { s.toDouble; true } catch { case _: NumberFormatException => false }
      val isDouble = (0 until nCols).map { i =>
        val vals = data.flatMap(_.get(i))
        vals.nonEmpty && vals.forall(numeric)
      }
      val schema = StructType(names.zipWithIndex.map { case (n, i) =>
        StructField(n, if (isDouble(i)) DoubleType else StringType)
      })
      val sparkRows = data.map { r =>
        Row.fromSeq((0 until nCols).map { i =>
          r.get(i) match {
            case Some(v) if isDouble(i) => v.toDouble
            case Some(v) => v
            case None => null
          }
        })
      }
      spark.createDataFrame(spark.sparkContext.parallelize(sparkRows, 1), schema)
    } finally zf.close()
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString()
  }

  /** Write a (small, driver-collected) DataFrame as a minimal single-sheet
    * .xlsx. See [[writeSheets]] for the contract.
    */
  def write(df: DataFrame, path: String): Unit =
    writeSheets(Seq("Sheet1" -> df), path)

  private def sheetXml(df: DataFrame): String = {
    val names = df.columns.toIndexedSeq
    val numericCol = df.schema.fields.map(_.dataType.isInstanceOf[NumericType])
    val rows = df.collect()
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cell(ref: String, v: Any, numeric: Boolean): String = v match {
      case null => ""
      case _ if numeric => s"""<c r="$ref"><v>${v.toString}</v></c>"""
      case _ => s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(v.toString)}</t></is></c>"""
    }
    sb.append("""<row r="1">""")
    names.zipWithIndex.foreach { case (n, i) =>
      sb.append(cell(s"${colRef(i)}1", n, numeric = false))
    }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (row, ri) =>
      sb.append(s"""<row r="${ri + 2}">""")
      names.indices.foreach { i =>
        sb.append(cell(s"${colRef(i)}${ri + 2}", row.get(i), numericCol(i)))
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString()
  }

  /** Write (small, driver-collected) DataFrames as a minimal MULTI-sheet
    * .xlsx — one worksheet per (name, frame) pair, in the given order, so
    * [[read]] by index or by name round-trips: numerics as number cells,
    * everything else as inline strings. Same contract as [[read]]: an
    * interchange/export path for bounded results (reports, samples), not
    * a distributed sink.
    */
  def writeSheets(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "writeSheets needs at least one sheet")
    require(sheets.map(_._1).distinct.size == sheets.size,
      s"duplicate sheet names: ${sheets.map(_._1).mkString(", ")}")
    val n = sheets.size
    val overrides = (1 to n).map { i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
    }.mkString
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        overrides +
        """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    val sheetDecls = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets>$sheetDecls</sheets></workbook>"""
    val wbRelDecls = (1 to n).map { i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>"""
    }.mkString
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        wbRelDecls +
        """</Relationships>"""

    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", wbRels)
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df))
      }
    } finally zos.close()
  }
}
