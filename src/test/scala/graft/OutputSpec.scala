package graft

import java.nio.file.Files
import java.util.zip.ZipFile

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Axis
import graft.output.{DisplayConfig, Excel, FormatResolver, Html, TableSpec}
import graft.testing.MakeTestDf

/** Presentation sinks: table-spec JSON shape (golden structure), smart format
  * resolution, HTML embedding, and the zero-dependency XLSX writer.
  */
class OutputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val mapper = new ObjectMapper()

  private def table = MakeTestDf(spark).addTotals(Axis.Both)
    .addPercentages(Axis.Cols, ndigits = 1)

  test("spec JSON has the reference shape: values/columns/index with names+dtypes (tablespec.py:22-37)") {
    val spec = mapper.readTree(TableSpec.toJson(table))
    assert(spec.has("values") && spec.has("columns") && spec.has("index"))
    assert(spec.get("values").size() == 6) // 5 data + totals row
    assert(spec.get("columns").get("values").size() == 10) // (n,pct) x 5
    // two column levels -> each column key is a 2-element array
    assert(spec.get("columns").get("values").get(0).size() == 2)
    assert(spec.get("index").get("names").get(0).asText() == "R0")
    val dtypes = (0 until spec.get("columns").get("dtypes").size())
      .map(spec.get("columns").get("dtypes").get(_).asText()).toSet
    assert(dtypes == Set("int", "float")) // n block int, pct block float
  }

  test("NaN and margin serialization: margin row present, nulls preserved") {
    import spark.implicits._
    val ft = graft.core.FlatTable(
      Seq(("r0", Some(1.0)), ("r1", None)).toDF("R0", "c0"), 1)
      .addTotals(Axis.Rows)
    val spec = mapper.readTree(TableSpec.toJson(ft))
    assert(spec.get("values").get(1).get(0).isNull)
    assert(spec.get("index").get("values").get(2).get(0).asText() == "Totals")
  }

  test("smart format resolution: pct columns percent-styled, diff signed (formats.py:75-84)") {
    import org.apache.spark.sql.types.DoubleType
    assert(FormatResolver.resolve(Seq("pct", "c0"), DoubleType, None)("style") == "percent")
    assert(FormatResolver.resolve(Seq("diff"), DoubleType, None)("signDisplay") == "always")
    assert(FormatResolver.resolve(Seq("plain"), DoubleType, None)("maximumFractionDigits") == 2)
    // explicit beats smart
    assert(FormatResolver.resolve(Seq("pct"), DoubleType,
      Some(Map("style" -> "decimal")))("style") == "decimal")
  }

  test("HTML render embeds the web component and the spec JSON (display.py:96-110)") {
    val html = Html.render(table, DisplayConfig(maxRows = 10))
    assert(html.contains("<flatbread-table-display"))
    assert(html.contains("margin-labels=\"Totals,pct\""))
    assert(html.contains("\"values\""))
  }

  test("xlsx writer produces a valid OOXML zip with header, data, and margin styling") {
    val path = Files.createTempFile("flatbread", ".xlsx").toString
    Excel.write(table, path)
    val zip = new ZipFile(path)
    try {
      val names = {
        val e = zip.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result()
      }
      assert(names.contains("[Content_Types].xml"))
      assert(names.contains("xl/worksheets/sheet1.xml"))
      val sheet = new String(zip.getInputStream(
        zip.getEntry("xl/worksheets/sheet1.xml")).readAllBytes())
      assert(sheet.contains("Totals"))  // margin row written
      assert(sheet.contains("r0"))      // data row written
      assert(sheet.contains("s=\"2\"")) // margin style applied
    } finally zip.close()
  }
}
