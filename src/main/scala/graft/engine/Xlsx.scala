package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal OOXML (xlsx) workbook writer — pure JDK, no spreadsheet
  * library. An xlsx file is a zip package of XML parts; the smallest
  * valid single-sheet workbook needs exactly five:
  * `[Content_Types].xml`, `_rels/.rels`, `xl/workbook.xml`,
  * `xl/_rels/workbook.xml.rels`, `xl/worksheets/sheet1.xml`.
  * Strings are written as inline strings (`t="inlineStr"`), which
  * drops the shared-string table a full writer would build; numbers and
  * booleans use native cell types so spreadsheet formulas see real
  * numerics. Backs [[Outputs.writeExcel]] (S8).
  */
object Xlsx {

  /** 0-based column index → A1-style letters (0→A, 25→Z, 26→AA). */
  private[graft] def colLetters(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) {
      sb.insert(0, ('A' + n % 26).toChar)
      n = n / 26 - 1
    }
    sb.toString
  }

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  private def isFinite(v: Any): Boolean = v match {
    case d: Double => !d.isNaN && !d.isInfinite
    case f: Float => !f.isNaN && !f.isInfinite
    case _ => true
  }

  private def cell(ref: String, dt: DataType, v: Any): String = v match {
    case null => "" // empty cell — omitted entirely, like the reference's nulls
    // NaN/Infinity are not valid OOXML numeric cells (Excel/LibreOffice
    // report a corrupt workbook) — write them as inline strings instead
    case _ if isNumeric(dt) && isFinite(v) => s"""<c r="$ref"><v>$v</v></c>"""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case other => s"""<c r="$ref" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
  }

  private def sheetXml(schema: StructType, rows: Array[Row]): String = {
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">"""
    sb ++= "<sheetData>"
    // row 1: the header, as the reference's write_excel does by default
    sb ++= "<row r=\"1\">"
    schema.fields.zipWithIndex.foreach { case (f, c) =>
      sb ++= cell(s"${colLetters(c)}1", StringType, f.name)
    }
    sb ++= "</row>"
    rows.zipWithIndex.foreach { case (row, r) =>
      sb ++= s"""<row r="${r + 2}">"""
      schema.fields.zipWithIndex.foreach { case (f, c) =>
        sb ++= cell(s"${colLetters(c)}${r + 2}", f.dataType, row.get(c))
      }
      sb ++= "</row>"
    }
    sb ++= "</sheetData></worksheet>"
    sb.toString
  }

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
    """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
    """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
    """<Default Extension="xml" ContentType="application/xml"/>""" +
    """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
    """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
    """</Types>"""

  private val rootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
    """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
    """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
    """</Relationships>"""

  private val workbookXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
    """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
    """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>""" +
    """</workbook>"""

  private val workbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
    """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
    """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
    """</Relationships>"""

  /** Stream the workbook to any OutputStream — lets callers route through
    * the Hadoop FileSystem (hdfs:// / s3a:// paths) like every other sink.
    */
  def write(stream: java.io.OutputStream, schema: StructType, rows: Array[Row]): Unit = {
    val parts = Seq(
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rootRels,
      "xl/workbook.xml" -> workbookXml,
      "xl/_rels/workbook.xml.rels" -> workbookRels,
      "xl/worksheets/sheet1.xml" -> sheetXml(schema, rows))
    val out = new ZipOutputStream(stream)
    try parts.foreach { case (name, xml) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(xml.getBytes(StandardCharsets.UTF_8))
      out.closeEntry()
    } finally out.close()
  }

  /** Local-path convenience overload. */
  def write(path: String, schema: StructType, rows: Array[Row]): Unit =
    write(Files.newOutputStream(Paths.get(path)), schema, rows)
}
