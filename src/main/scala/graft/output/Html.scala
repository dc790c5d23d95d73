package graft.output

import graft.core.FlatTable

/** Notebook/HTML sink — mirror of the reference's Jinja template
  * (templates/template.jinja.html + display.py:96-110): a placeholder div
  * replaced by a `FlatbreadTable` web-component instance whose `data`
  * property carries the table-spec JSON and whose element attributes carry
  * the [[DisplayConfig]]. Attribute names and emission rules (value attrs
  * only when set, boolean attrs as empty strings, `margin-labels` joined
  * with ';', `collapse-columns` lowercased) match the template macros.
  */
object Html {

  /** Same public viewer module the reference imports
    * (output/html/constants.py:1-5). */
  val componentUrl: String =
    "https://cdn.jsdelivr.net/gh/flatbread-dataframes/" +
      "flatbread-wc-table-display@v0.1.2/src/viewer.js"

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** HTML fragment (the reference `_repr_html_` output shape). */
  def fragment(ft: FlatTable, cfg: DisplayConfig = DisplayConfig(),
               formats: Map[String, Map[String, Any]] = Map.empty): String = {
    // Jackson does not escape '/', so a cell value containing "</script>"
    // would terminate the script element (HTML injection via data); "<\/"
    // is the standard script-embedding escape and a JSON no-op
    val spec = TableSpec.toJson(ft, cfg.maxRows, formats).replace("</", "<\\/")
    val id = s"id-${java.util.UUID.randomUUID()}"
    val margins = cfg.marginLabels.getOrElse(ft.meta.marginLabelSeq.toSet)

    val attrs = Seq.newBuilder[String]
    def valueAttr(name: String, v: Option[Any]): Unit =
      v.foreach(x => attrs += s"""viewer.setAttribute("$name", "${esc(x.toString)}")""")
    def boolAttr(name: String, on: Boolean): Unit =
      if (on) attrs += s"""viewer.setAttribute("$name", "")"""

    attrs += s"""viewer.setAttribute("hide-settings-menu", "")"""
    valueAttr("locale", cfg.locale)
    valueAttr("na-rep", Some(cfg.naRep))
    if (margins.nonEmpty)
      valueAttr("margin-labels", Some(margins.toSeq.sorted.mkString(";")))
    valueAttr("section-levels", cfg.sectionLevels)
    valueAttr("max-rows", Some(cfg.maxRows))
    valueAttr("max-columns", Some(cfg.maxColumns))
    valueAttr("trim-size", Some(cfg.trimSize))
    valueAttr("separator", Some(cfg.separator))
    valueAttr("collapse-columns", cfg.collapseColumns.map(_.toString))
    boolAttr("hide-group-borders", cfg.hideGroupBorders)
    boolAttr("hide-row-borders", cfg.hideRowBorders)
    boolAttr("hide-thead-border", cfg.hideTheadBorder)
    boolAttr("hide-index-border", cfg.hideIndexBorder)
    valueAttr("column-border-levels", cfg.columnBorderLevels)
    boolAttr("no-wrap", cfg.noWrap)
    boolAttr("show-hover", cfg.showHover)

    s"""<div id="$id"></div>
       |<script type="module">
       |  import { FlatbreadTable } from "$componentUrl"
       |
       |  customElements.whenDefined("flatbread-table").then(() => {
       |    const data = $spec
       |    const viewer = new FlatbreadTable()
       |    viewer.data = data
       |    ${attrs.result().mkString("\n    ")}
       |
       |    const placeholder = document.getElementById("$id")
       |    placeholder.parentNode.replaceChild(viewer, placeholder)
       |  })
       |</script>""".stripMargin
  }

  /** Standalone page wrapping [[fragment]]. */
  def render(ft: FlatTable, cfg: DisplayConfig = DisplayConfig(),
             formats: Map[String, Map[String, Any]] = Map.empty): String =
    s"""<!DOCTYPE html>
       |<html>
       |<head><meta charset="utf-8"/></head>
       |<body>
       |${fragment(ft, cfg, formats)}
       |</body>
       |</html>""".stripMargin

  def write(ft: FlatTable, path: String, cfg: DisplayConfig = DisplayConfig(),
            formats: Map[String, Map[String, Any]] = Map.empty): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      render(ft, cfg, formats))
}
