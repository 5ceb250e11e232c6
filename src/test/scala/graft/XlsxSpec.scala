package graft

import graft.sources.Xlsx
import org.apache.spark.sql.functions._

/** K2 Excel sink: OOXML structure, value/type/unicode/formula
  * round-trips, the bounded-report guard, and cell-reference math. */
class XlsxSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpFile(name: String): String =
    java.nio.file.Files.createTempDirectory("xlsx").resolve(name).toString

  test("A1-reference math covers the multi-letter columns") {
    assert(Xlsx.ref(0, 1) == "A1")
    assert(Xlsx.ref(25, 3) == "Z3")
    assert(Xlsx.ref(26, 2) == "AA2")
    assert(Xlsx.ref(27, 10) == "AB10")
    assert(Xlsx.ref(701, 1) == "ZZ1")
    assert(Xlsx.ref(702, 1) == "AAA1")
  }

  test("zip contains the four required OOXML parts") {
    val path = tmpFile("parts.xlsx")
    Xlsx.write(Seq((1, "a")).toDF("n", "s"), path)
    val zf = new java.util.zip.ZipFile(path)
    try {
      val names = {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result()
      }
      assert(names.contains("[Content_Types].xml"))
      assert(names.contains("_rels/.rels"))
      assert(names.contains("xl/workbook.xml"))
      assert(names.contains("xl/worksheets/sheet1.xml"))
    } finally zf.close()
  }

  test("values, nulls, unicode, XML metacharacters and formulas round-trip") {
    val path = tmpFile("roundtrip.xlsx")
    val df = Seq(
      (1L, Some(2.5), "plain", "=SUM(A2:A3)"),
      (2L, None, "é <&> \"q\" 中", "=HYPERLINK(\"https://example.org/x\",\"x\")"),
      (3L, Some(-0.001), "", "not a formula")
    ).toDF("id", "score", "txt", "form")
    Xlsx.write(df, path, formulaColumns = Set("form"))
    val back = Xlsx.read(spark, path)
      .select(col("id").cast("long"), col("score").cast("double"),
        col("txt"), col("form"))
      .collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    assert(back(0).getString(3) == "=SUM(A2:A3)")
    assert(back(1).isNullAt(1), "null numeric must stay null")
    assert(back(1).getString(2) == "é <&> \"q\" 中")
    assert(back(1).getString(3) == "=HYPERLINK(\"https://example.org/x\",\"x\")")
    assert(back(2).getDouble(1) == -0.001)
    assert(back(2).getString(3) == "not a formula")
  }

  test("booleans write as native boolean cells") {
    val path = tmpFile("bool.xlsx")
    Xlsx.write(Seq((1, true), (2, false)).toDF("id", "ok"), path)
    val sheet = {
      val zf = new java.util.zip.ZipFile(path)
      try new String(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes, "UTF-8")
      finally zf.close()
    }
    assert(sheet.contains("""t="b""""), sheet)
  }

  test("a data string starting with '=' stays inert unless its column is declared a formula") {
    val path = tmpFile("inert.xlsx")
    // no formulaColumns: the '='-leading value must be a plain string cell
    Xlsx.write(Seq((1, "=2+2")).toDF("id", "v"), path)
    val sheet = {
      val zf = new java.util.zip.ZipFile(path)
      try new String(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes, "UTF-8")
      finally zf.close()
    }
    assert(!sheet.contains("<f>"), sheet)
    val back = Xlsx.read(spark, path).collect()
    assert(back(0).getString(1) == "=2+2")
  }

  test("control characters and literal _xHHHH_ sequences round-trip via OOXML escapes") {
    val path = tmpFile("ctrl.xlsx")
    val tricky = "a\u0001b\u001Fc"     // XML-1.0-invalid controls
    val literal = "see _x0041_ and _x005F_" // looks like the escape itself
    // CR is valid XML but parse-time line-ending normalization would
    // rewrite a raw one to LF — must ride the _x000D_ escape
    val crlf = "line1\r\nline2\rline3"
    Xlsx.write(Seq((1, tricky), (2, literal), (3, crlf)).toDF("id", "s"), path)
    val back = Xlsx.read(spark, path).collect().sortBy(_.getString(0))
    assert(back(0).getString(1) == tricky)
    assert(back(1).getString(1) == literal)
    assert(back(2).getString(1) == crlf)
  }

  test("non-finite doubles fall back to string cells, not invalid number cells") {
    val path = tmpFile("nan.xlsx")
    Xlsx.write(Seq((1, Double.NaN), (2, Double.PositiveInfinity), (3, 1.5))
      .toDF("id", "x"), path)
    val sheet = {
      val zf = new java.util.zip.ZipFile(path)
      try new String(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes, "UTF-8")
      finally zf.close()
    }
    assert(!sheet.contains("<v>NaN</v>") && !sheet.contains("<v>Infinity</v>"), sheet)
    val back = Xlsx.read(spark, path)
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("x").cast("double"))
      .collect().sortBy(_.getString(0))
    assert(back(0).getDouble(1).isNaN)
    assert(back(1).getDouble(1).isPosInfinity)
    assert(back(2).getDouble(1) == 1.5)
  }

  test("maxRows can never clear the OOXML sheet cap (header occupies a row)") {
    intercept[IllegalArgumentException] {
      Xlsx.write(Seq((1, "a")).toDF("n", "s"), tmpFile("cap.xlsx"),
        maxRows = Xlsx.SheetRowLimit)
    }
  }

  test("the bounded-report guard refuses oversized input instead of truncating") {
    val path = tmpFile("big.xlsx")
    val big = spark.range(50).toDF("id")
    intercept[IllegalArgumentException] { Xlsx.write(big, path, maxRows = 10) }
  }

  test("k2 roundtrip query equals the direct report") {
    val got = graft.queries.SourceQueries.k2ExcelRoundtrip(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .sortBy(_._1)
    val want = Tables.part(spark, sfDir)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), round(avg(col("p_retailprice")), 3).as("a"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length == want.length)
    got.zip(want).foreach { case ((b, n, a, link), (wb, wn, wa)) =>
      assert(b == wb && n == wn && a == wa)
      assert(link == s"""=HYPERLINK("https://example.org/brand/$b","$b")""")
    }
  }
}
