package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** K2: Excel sink (and a read-back scan for verification) as a minimal
  * SpreadsheetML OOXML writer — an .xlsx is a zip of XML parts, so the
  * JDK's ZipOutputStream is the whole dependency surface (the
  * reference emits its final report via pandas/openpyxl,
  * finalize_realease.py:584-587; this is the engine-native equivalent).
  *
  * Scale contract: an Excel file is a REPORT artifact — the format
  * itself caps a sheet at 1,048,576 rows — so this sink is
  * deliberately driver-side and BOUNDED: the distributed plan
  * aggregates 100 TB down to report size first, and `write` hard-fails
  * past `maxRows` instead of silently truncating (collect-on-driver is
  * the honest shape here, same as the reference's pandas step; it is
  * NOT a general-purpose sink and the guard keeps it that way).
  *
  * Cell mapping: numeric Spark types → native number cells (non-finite
  * doubles fall back to inline strings — NaN/Infinity are not valid
  * OOXML numbers); booleans → boolean cells; columns the CALLER names
  * in `formulaColumns` → real formula cells (`<f>` — how the reference
  * ships its HYPERLINK column, X17; opt-in per column so a data string
  * that merely starts with '=' can never become a live formula —
  * formula injection); other strings → inline-string cells
  * (`<is><t>`, no sharedStrings table, single-pass write). Control
  * characters XML 1.0 cannot carry are encoded with OOXML's _xHHHH_
  * convention (and decoded by [[read]]). Nulls become empty cells.
  */
object Xlsx {

  val SheetRowLimit = 1048576 // the OOXML per-sheet hard cap

  def write(df: DataFrame, path: String, maxRows: Int = 100000,
            formulaColumns: Set[String] = Set.empty): Unit = {
    // header occupies row 1, so data rows may number at most cap - 1
    require(maxRows <= SheetRowLimit - 1, s"maxRows $maxRows exceeds the xlsx sheet cap")
    val schema = df.schema
    // bounded drain: one extra row just to detect overflow
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"xlsx sink is for bounded report output: got > $maxRows rows — aggregate first")
    val file = new java.io.File(path)
    Option(file.getParentFile).foreach(_.mkdirs())
    val zip = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(file)))
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    try {
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>""")
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
        """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>""")
      val sheet = new StringBuilder(
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      sheet ++= headerRow(schema)
      val formulaIdx = schema.fieldNames.zipWithIndex
        .collect { case (n, i) if formulaColumns.contains(n) => i }.toSet
      rows.zipWithIndex.foreach { case (r, i) => sheet ++= dataRow(schema, r, i + 2, formulaIdx) }
      sheet ++= "</sheetData></worksheet>"
      part("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zip.close()
  }

  private def headerRow(schema: StructType): String =
    schema.fieldNames.zipWithIndex.map { case (n, c) =>
      s"""<c r="${ref(c, 1)}" t="inlineStr"><is><t xml:space="preserve">${esc(n)}</t></is></c>"""
    }.mkString("""<row r="1">""", "", "</row>")

  private def dataRow(schema: StructType, row: Row, rowNum: Int,
                      formulaIdx: Set[Int]): String = {
    val cells = schema.fields.zipWithIndex.flatMap { case (f, c) =>
      if (row.isNullAt(c)) None
      else Some(cell(f.dataType, row, c, ref(c, rowNum), formulaIdx.contains(c)))
    }
    cells.mkString(s"""<row r="$rowNum">""", "", "</row>")
  }

  private def isFinite(v: Any): Boolean = v match {
    case d: Double => !d.isNaN && !d.isInfinite
    case f: Float  => !f.isNaN && !f.isInfinite
    case _         => true
  }

  private def cell(dt: DataType, row: Row, c: Int, r: String,
                   formula: Boolean): String = dt match {
    case _: NumericType if isFinite(row.get(c)) =>
      s"""<c r="$r"><v>${row.get(c)}</v></c>"""
    case BooleanType =>
      s"""<c r="$r" t="b"><v>${if (row.getBoolean(c)) 1 else 0}</v></c>"""
    case StringType if formula && row.getString(c).startsWith("=") =>
      // a real formula cell — Excel recalculates; no cached <v> needed.
      // Only columns the caller DECLARED as formulas get here.
      s"""<c r="$r"><f>${esc(row.getString(c).drop(1))}</f></c>"""
    case _ =>
      // inline string — also the fallback for non-finite numerics
      // (NaN/Infinity are not valid OOXML number cells)
      s"""<c r="$r" t="inlineStr"><is><t xml:space="preserve">${esc(String.valueOf(row.get(c)))}</t></is></c>"""
  }

  /** Column index (0-based) + row number → A1-style cell reference. */
  private[graft] def ref(col: Int, rowNum: Int): String = {
    var c = col; var s = ""
    while (c >= 0) { s = ('A' + c % 26).toChar.toString + s; c = c / 26 - 1 }
    s + rowNum
  }

  /** XML escape + OOXML `_xHHHH_` control-character encoding: XML 1.0
    * cannot carry C0 controls (even as entities), so SpreadsheetML
    * encodes them as `_xHHHH_`; a literal substring that LOOKS like the
    * escape gets its underscore encoded as `_x005F_` first, which keeps
    * the round-trip exact. CR is encoded too (`_x000D_`): a raw CR (or
    * CRLF) survives the writer but XML 1.0 line-ending normalization
    * rewrites it to LF at PARSE time, so a raw-CR cell would silently
    * read back changed — the one control char the `< ' '` guard alone
    * would exempt from encoding but the round-trip contract still
    * needs encoded. */
  private def esc(s: String): String = {
    // the lookahead is not consumed, so only the "_" itself is replaced
    val guarded = LiteralEscape.matcher(s).replaceAll("_x005F_")
    guarded.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c if c < ' ' && c != '\t' && c != '\n' => f"_x${c.toInt}%04X_"
      case c   => c.toString
    }
  }

  private val LiteralEscape = java.util.regex.Pattern.compile("_(?=(x[0-9A-Fa-f]{4}_))")
  private val EscapeSeq = java.util.regex.Pattern.compile("_x([0-9A-Fa-f]{4})_")

  private def unesc(s: String): String = {
    val m = EscapeSeq.matcher(s)
    val sb = new StringBuffer
    while (m.find()) m.appendReplacement(sb,
      java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 16).toChar.toString))
    m.appendTail(sb).toString
  }

  /** Read sheet1 of an .xlsx written by [[write]] (or any producer using
    * number / boolean / inline-string / formula cells): first row =
    * header, every value surfaced as a string column (callers cast to
    * their schema — the verification roundtrip does). JDK DOM parser;
    * driver-side and bounded like the writer. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val zf = new ZipFile(path)
    try {
      val entry = zf.getEntry("xl/worksheets/sheet1.xml")
      require(entry != null, s"$path has no sheet1")
      // hardened parser: xlsx parts never need DOCTYPEs, and a file
      // from another producer must not be able to pull external
      // entities (XXE) through the read-back path
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      dbf.setExpandEntityReferences(false)
      val doc = dbf.newDocumentBuilder().parse(zf.getInputStream(entry))
      val rowNodes = doc.getElementsByTagName("row")
      val parsed = (0 until rowNodes.getLength).map { i =>
        val cells = rowNodes.item(i).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagName("c")
        (0 until cells.getLength).map { j =>
          val c = cells.item(j).asInstanceOf[org.w3c.dom.Element]
          val colIdx = c.getAttribute("r").takeWhile(_.isLetter)
            .foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
          val fs = c.getElementsByTagName("f")
          val value =
            if (fs.getLength > 0) "=" + unesc(fs.item(0).getTextContent)
            else if (c.getAttribute("t") == "inlineStr")
              unesc(c.getElementsByTagName("t").item(0).getTextContent)
            else {
              val vs = c.getElementsByTagName("v")
              if (vs.getLength > 0) vs.item(0).getTextContent else null
            }
          colIdx -> value
        }.toMap
      }
      require(parsed.nonEmpty, s"$path sheet1 has no rows (not even a header)")
      val header = parsed.head
      val width = header.keys.max + 1
      val names = (0 until width).map(i => header.getOrElse(i, s"_c$i"))
      val data = parsed.tail.map { m =>
        Row.fromSeq((0 until width).map(i => m.getOrElse(i, null)))
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq, 1),
        StructType(names.map(n => StructField(n, StringType, nullable = true))))
    } finally zf.close()
  }
}
