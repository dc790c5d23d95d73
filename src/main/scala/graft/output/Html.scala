package graft.output

import graft.core.{Defaults, FlatTable}

/** Notebook/HTML sink (reference output/html/display.py:96-310 +
  * templates/template.jinja.html): embeds the table-spec JSON onto the same
  * `flatbread-wc-table-display` web component the reference uses, with the
  * display attributes (locale, na-rep, margin labels, section levels,
  * max-rows, hover) carried as element attributes.
  */
final case class DisplayConfig(
    locale: String = "en-US",
    naRep: String = Defaults.naRep,
    maxRows: Int = 200,
    maxColumns: Int = 40,
    sectionLevels: Int = 0,
    collapseColumns: Boolean = false,
    showHover: Boolean = true,
    borders: Boolean = true
)

object Html {

  // same public web component the reference renders through
  // (output/html/constants.py:1-5)
  private val componentUrl =
    "https://unpkg.com/flatbread-wc-table-display/dist/index.js"

  def render(ft: FlatTable, cfg: DisplayConfig = DisplayConfig(),
             formats: Map[String, Map[String, Any]] = Map.empty): String = {
    val spec = TableSpec.toJson(ft, cfg.maxRows, formats)
    val marginLabels = ft.meta.marginLabelSeq.mkString(",")
    s"""<!DOCTYPE html>
       |<html>
       |<head>
       |  <meta charset="utf-8"/>
       |  <script type="module" src="$componentUrl"></script>
       |</head>
       |<body>
       |  <flatbread-table-display
       |    locale="${cfg.locale}"
       |    na-rep="${cfg.naRep}"
       |    margin-labels="$marginLabels"
       |    section-levels="${cfg.sectionLevels}"
       |    max-rows="${cfg.maxRows}"
       |    max-columns="${cfg.maxColumns}"
       |    ${if (cfg.showHover) "hover-rows" else ""}
       |    ${if (cfg.borders) "show-borders" else ""}>
       |    <script type="application/json">
       |$spec
       |    </script>
       |  </flatbread-table-display>
       |</body>
       |</html>""".stripMargin
  }

  def write(ft: FlatTable, path: String, cfg: DisplayConfig = DisplayConfig()): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render(ft, cfg))
}
