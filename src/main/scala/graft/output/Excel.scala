package graft.output

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types._

import graft.core.FlatTable

/** Excel export (reference `export_excel`, output/excel/excel.py:100-209 —
  * note the reference's own implementation is broken, SURVEY.md A22; this one
  * re-expresses the intended semantics: auto number formats from smart labels
  * and border accents at margin rows/columns). Zero-dependency XLSX writer:
  * an .xlsx is a zip of OOXML parts, emitted here with inline strings via
  * `java.util.zip` — no POI needed.
  */
object Excel {

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private val contentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
      |</Types>""".stripMargin

  private val rootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private def workbook(sheetName: String) =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
       |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
       |</workbook>""".stripMargin

  private val workbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  /** Styles: 0 plain, 1 bold header, 2 bold margin, 3 percent number format,
    * 4 two-decimal number format. */
  private val styles =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<numFmts count="1"><numFmt numFmtId="164" formatCode="0.0&quot;%&quot;"/></numFmts>
      |<fonts count="2"><font><sz val="11"/></font><font><b/><sz val="11"/></font></fonts>
      |<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
      |<borders count="2"><border/><border><top style="thin"/></border></borders>
      |<cellStyleXfs count="1"><xf/></cellStyleXfs>
      |<cellXfs count="5">
      |<xf numFmtId="0" fontId="0" borderId="0"/>
      |<xf numFmtId="0" fontId="1" borderId="0"/>
      |<xf numFmtId="0" fontId="1" borderId="1" applyBorder="1"/>
      |<xf numFmtId="164" fontId="0" borderId="0" applyNumberFormat="1"/>
      |<xf numFmtId="2" fontId="0" borderId="0" applyNumberFormat="1"/>
      |</cellXfs>
      |</styleSheet>""".stripMargin

  private def colRef(c: Int): String = {
    var n = c + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def cell(r: Int, c: Int, v: Any, style: Int): String = {
    val ref = s"${colRef(c)}${r + 1}"
    v match {
      case null => ""
      case n: Number =>
        s"""<c r="$ref" s="$style"><v>$n</v></c>"""
      case b: Boolean =>
        s"""<c r="$ref" s="$style" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case other =>
        s"""<c r="$ref" s="$style" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>"""
    }
  }

  /** Write the FlatTable as an .xlsx: header row from column keys, index
    * levels as leading columns, percent format on pct-labeled columns, bold +
    * top border on margin rows (reference's auto border/format rules). */
  def write(ft: FlatTable, path: String, sheetName: String = "flatbread",
            maxRows: Int = 100000): Unit = {
    val meta = ft.meta
    val schema = ft.df.schema.fields.map(f => f.name -> f.dataType).toMap
    val rows = ft.ordered.limit(maxRows).collect()
    val marginLabels = meta.marginLabelSeq

    def colStyle(physical: String): Int = {
      val opts = FormatResolver.resolve(meta.columns.find(_.physical == physical)
        .map(_.key).getOrElse(Seq(physical)), schema(physical), None)
      if (opts.get("style").contains("percent")) 3
      else schema(physical) match {
        case DoubleType | FloatType | _: DecimalType => 4
        case _ => 0
      }
    }

    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    sb ++= "\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>"
    // header
    sb ++= "<row r=\"1\">"
    (meta.indexLevels ++ meta.columns.map(_.key.mkString(" / ")))
      .zipWithIndex.foreach { case (h, c) => sb ++= cell(0, c, h, 1) }
    sb ++= "</row>"
    rows.zipWithIndex.foreach { case (row, i) =>
      val isMargin = meta.indexLevels.exists(l =>
        Option(row.get(row.fieldIndex(l))).exists(v =>
          marginLabels.exists(m => v.toString.startsWith(m))))
      sb ++= s"""<row r="${i + 2}">"""
      meta.indexLevels.zipWithIndex.foreach { case (l, c) =>
        sb ++= cell(i + 1, c, row.get(row.fieldIndex(l)), if (isMargin) 2 else 0)
      }
      meta.valueCols.zipWithIndex.foreach { case (vc, j) =>
        val style = if (isMargin) 2 else colStyle(vc)
        sb ++= cell(i + 1, meta.nLevels + j, row.get(row.fieldIndex(vc)), style)
      }
      sb ++= "</row>"
    }
    sb ++= "</sheetData></worksheet>"

    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook(sheetName))
      put("xl/_rels/workbook.xml.rels", workbookRels)
      put("xl/styles.xml", styles)
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zos.close()
  }
}
