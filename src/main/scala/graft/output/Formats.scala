package graft.output

/** One named output format: smart-detection labels, web-component
  * (`Intl.NumberFormat`) options, and the Excel number-format code
  * (reference `output_formats` / `format_presets` entries,
  * config.defaults.json:38-66 + output/formats.py:7-102).
  *
  * @param dtypes simplified dtypes a user preset may be applied to
  *               (reference tablespec.py:140-151; defaults to numeric)
  */
final case class FormatDef(
    name: String,
    smartLabels: Seq[String],
    htmlOptions: Map[String, Any],
    excelFormat: Option[String],
    dtypes: Seq[String] = Seq("float", "int")
)

/** Format registry: the reference's built-in `output_formats` plus a
  * user-extensible `format_presets` layer. Resolution rules mirror
  * output/formats.py: explicit per-column format first, then "smart"
  * substring detection of a label in the lowercased column text.
  */
object Formats {

  /** Built-in output formats (config.defaults.json:38-66). */
  val outputFormats: Seq[FormatDef] = Seq(
    FormatDef("percentage", Seq("pct"),
      Map("style" -> "percent", "minimumFractionDigits" -> 0,
        "maximumFractionDigits" -> 21),
      Some("0.0%")),
    FormatDef("signed_integer", Seq("diff"),
      Map("signDisplay" -> "always"),
      Some("+#,##0;-#,##0")),
    FormatDef("signed_percentage", Nil,
      Map("style" -> "percent", "signDisplay" -> "always"),
      Some("+0.0%;-0.0%"))
  )

  @volatile private var presets: Map[String, FormatDef] = Map.empty

  /** Register (or replace) a user format preset (`format_presets` layer). */
  def registerPreset(d: FormatDef): Unit = synchronized { presets += d.name -> d }

  def clearPresets(): Unit = synchronized { presets = Map.empty }

  def formatPresets: Map[String, FormatDef] = presets

  /** Lookup for `format(key, "<name>")`: user presets shadow built-ins
    * (reference tablespec.py set_format checks presets first). */
  def preset(name: String): Option[FormatDef] =
    presets.get(name).orElse(outputFormats.find(_.name == name))

  def availableNames: Seq[String] =
    (presets.keys.toSeq ++ outputFormats.map(_.name)).distinct

  /** Searchable text of a column key (formats.py `_get_column_text`):
    * levels joined with a space, lowercased. */
  def columnText(keyParts: Seq[String]): String =
    keyParts.map(_.toLowerCase).mkString(" ")

  /** Smart format detection: first output format whose smart label occurs as
    * a substring of the column text (formats.py:75-84). */
  def smartFor(keyParts: Seq[String]): Option[FormatDef] = {
    val text = columnText(keyParts)
    outputFormats.find(_.smartLabels.exists(text.contains))
  }

  /** All presets' html options, optionally filtered to those applicable to a
    * simplified dtype (reference `get_format_presets`, display.py:254-275). */
  def presetOptions(dtype: Option[String] = None): Map[String, Map[String, Any]] = {
    val all = outputFormats.map(d => d.name -> d) ++ presets.toSeq
    all.collect {
      case (n, d) if dtype.forall(d.dtypes.contains) => n -> d.htmlOptions
    }.toMap
  }
}
