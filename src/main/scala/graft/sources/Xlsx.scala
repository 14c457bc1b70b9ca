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
  * single sheet, first row = header, shared/inline strings, numeric cells;
  * pandas-style inference promotes all-numeric columns to double.
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
        s"$path is a legacy binary Excel workbook (OLE2 .xls): not supported; " +
          "re-save as .xlsx or export to CSV")
    val isZip = head.length >= 2 && head(0) == 'P'.toByte && head(1) == 'K'.toByte
    if (!isZip)
      throw new IllegalArgumentException(
        s"$path is not an .xlsx workbook (no zip/PK magic)")
  }

  /** Read sheet1 of an .xlsx into a DataFrame: header row -> column names;
    * a column whose every non-empty cell is numeric becomes DoubleType
    * (pandas inference), everything else StringType.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    sniffMagic(path)
    val zf = new ZipFile(path)
    try {
      val shared: IndexedSeq[String] =
        zipEntryBytes(zf, "xl/sharedStrings.xml").map { b =>
          elements(parseXml(b), "si").map(si => childElements(si, "t")
            .map(_.getTextContent).mkString).toIndexedSeq
        }.getOrElse(IndexedSeq.empty)
      val sheetBytes = zipEntryBytes(zf, "xl/worksheets/sheet1.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: no xl/worksheets/sheet1.xml"))
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
    * .xlsx: numerics as number cells, everything else as inline strings.
    * Same contract as [[read]]: an interchange/export path for bounded
    * results (reports, samples), not a distributed sink.
    */
  def write(df: DataFrame, path: String): Unit = {
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

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
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
      put("xl/worksheets/sheet1.xml", sb.toString())
    } finally zos.close()
  }
}
