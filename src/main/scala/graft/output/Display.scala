package graft.output

import org.apache.spark.sql.types.DataType

import graft.core.{ColKey, FlatTable}

/** Display configuration — field-for-field mirror of the reference
  * `DisplayConfig` dataclass (output/html/display.py:13-37): data handling,
  * layout control, border controls, visual effects. `None` means "let the
  * web component use its own default", matching the template's conditional
  * attribute emission.
  */
final case class DisplayConfig(
    // data handling
    locale: Option[String] = None,
    naRep: String = "-",
    marginLabels: Option[Set[String]] = None, // None = derive from TableMeta
    // layout control
    collapseColumns: Option[Boolean] = None,
    maxRows: Int = 30,
    maxColumns: Int = 30,
    trimSize: Int = 5,
    separator: String = "...",
    noWrap: Boolean = false,
    columnBorderLevels: Option[Int] = None,
    sectionLevels: Option[Int] = None,
    // border controls
    hideGroupBorders: Boolean = false,
    hideRowBorders: Boolean = false,
    hideTheadBorder: Boolean = false,
    hideIndexBorder: Boolean = false,
    // visual effects
    showHover: Boolean = false
)

/** Fluent display surface over a [[FlatTable]] — the Spark-side equivalent of
  * the reference's `PitaDisplayMixin` chainable setters
  * (output/html/display.py:139-310). Immutable: every setter returns a new
  * `Display`; terminal calls are [[html]] / [[write]] / [[dataSpec]] /
  * [[getJson]].
  *
  * Format state mirrors `TableSpecBuilder._format_options`: explicit options
  * per column/index-level key, set by name via dtype-gated presets or raw
  * option maps ([[format]], [[formatColumns]]).
  */
final case class Display(
    ft: FlatTable,
    config: DisplayConfig = DisplayConfig(),
    formatOptions: Map[String, Map[String, Any]] = Map.empty
) {

  private def withConfig(f: DisplayConfig => DisplayConfig): Display =
    copy(config = f(config))

  // ---- configuration setters (display.py:139-230) -----------------------

  /** Arbitrary config rewrite (reference `configure_display`). */
  def configureDisplay(f: DisplayConfig => DisplayConfig): Display = withConfig(f)

  def setLocale(locale: String): Display = withConfig(_.copy(locale = Some(locale)))
  def setNaRep(naRep: String): Display = withConfig(_.copy(naRep = naRep))
  def setMaxRows(n: Int): Display = withConfig(_.copy(maxRows = n))
  def setMaxColumns(n: Int): Display = withConfig(_.copy(maxColumns = n))
  def setTrimSize(n: Int): Display = withConfig(_.copy(trimSize = n))
  def setSeparator(sep: String): Display = withConfig(_.copy(separator = sep))

  def hideBorders(hide: Boolean = true): Display = withConfig(_.copy(
    hideGroupBorders = hide, hideRowBorders = hide,
    hideTheadBorder = hide, hideIndexBorder = hide))
  def showGroupBorders(show: Boolean = true): Display =
    withConfig(_.copy(hideGroupBorders = !show))
  def showRowBorders(show: Boolean = true): Display =
    withConfig(_.copy(hideRowBorders = !show))
  def showHeaderBorder(show: Boolean = true): Display =
    withConfig(_.copy(hideTheadBorder = !show))
  def showIndexBorder(show: Boolean = true): Display =
    withConfig(_.copy(hideIndexBorder = !show))
  def showHover(show: Boolean = true): Display = withConfig(_.copy(showHover = show))
  def collapseColumns(collapse: Boolean = true): Display =
    withConfig(_.copy(collapseColumns = Some(collapse)))
  def setSectionLevels(levels: Int): Display =
    withConfig(_.copy(sectionLevels = Some(levels)))
  def setMarginLabels(labels: String*): Display =
    withConfig(_.copy(marginLabels = Some(labels.toSet)))
  def setNoWrap(noWrap: Boolean = true): Display = withConfig(_.copy(noWrap = noWrap))
  def setColumnBorderLevels(levels: Int): Display =
    withConfig(_.copy(columnBorderLevels = Some(levels)))

  // ---- formats (display.py:232-275, tablespec.py:119-205) ---------------

  private def schema: Map[String, DataType] =
    ft.df.schema.fields.map(f => f.name -> f.dataType).toMap

  /** Resolve the simplified dtype of a column or index level name
    * (tablespec.py `_resolve_dtype`); error if the key matches neither. */
  private def resolveDtype(key: String): String = {
    val colHit = ft.meta.columns.find(ck => ck.physical == key || ck.leaf == key)
    colHit.map(ck => TableSpec.simpleDtype(schema(ck.physical))).getOrElse {
      if (ft.meta.indexLevels.contains(key)) TableSpec.simpleDtype(schema(key))
      else throw new IllegalArgumentException(
        s"'$key' not found in columns or index level names")
    }
  }

  private def targetKey(key: String): String =
    ft.meta.columns.find(ck => ck.physical == key || ck.leaf == key)
      .map(_.physical).getOrElse(key)

  /** Set format options for one column or index level: either a preset name
    * (dtype-gated for user presets) or explicit options
    * (tablespec.py `set_format`). */
  def format(key: String, presetName: String): Display = {
    val dtype = resolveDtype(key)
    val d = Formats.preset(presetName).getOrElse(
      throw new IllegalArgumentException(
        s"Unknown format '$presetName'. Available: ${Formats.availableNames.mkString(", ")}"))
    val userPreset = Formats.formatPresets.contains(presetName)
    if (userPreset && !d.dtypes.contains(dtype))
      throw new IllegalArgumentException(
        s"Preset '$presetName' is not compatible with '$key' of dtype '$dtype'. " +
          s"This preset supports: ${d.dtypes.mkString(", ")}")
    copy(formatOptions = formatOptions + (targetKey(key) -> d.htmlOptions))
  }

  def format(key: String, options: Map[String, Any]): Display =
    copy(formatOptions = formatOptions + (targetKey(key) -> options))

  /** Pattern match of a column key / index level name against a pattern
    * (tablespec.py `_is_pattern_match`): equality, multi-level prefix,
    * scalar-in-any-level, or substring for flat string keys. */
  private def patternMatch(ck: ColKey, pattern: Seq[String]): Boolean =
    ck.key == pattern ||
      (ck.key.size > 1 &&
        (pattern.size <= ck.key.size && ck.key.take(pattern.size) == pattern ||
          (pattern.size == 1 && ck.key.contains(pattern.head)))) ||
      (ck.key.size == 1 && pattern.size == 1 && ck.key.head.contains(pattern.head))

  /** Set formats for many targets at once (tablespec.py `set_formats`):
    * pattern → preset-name-or-options, matched against columns and index
    * level names. */
  def formatColumns(formats: Map[String, Any]): Display =
    formats.foldLeft(this) { case (d, (pattern, spec)) =>
      val colHits = ft.meta.columns.filter(ck => patternMatch(ck, Seq(pattern)))
      val idxHits = ft.meta.indexLevels.filter(l => l == pattern || l.contains(pattern))
      val keys = colHits.map(_.physical) ++ idxHits
      keys.foldLeft(d)((dd, k) => spec match {
        case name: String            => dd.format(k, name)
        case opts: Map[_, _]         =>
          dd.format(k, opts.asInstanceOf[Map[String, Any]])
        case other                   =>
          throw new IllegalArgumentException(s"unsupported format spec: $other")
      })
    }

  /** One preset applied to every value column (string form of set_formats). */
  def formatColumns(presetName: String): Display =
    ft.meta.columns.foldLeft(this)((d, ck) => d.format(ck.physical, presetName))

  /** Positional list form: one spec per value column, in order. */
  def formatColumns(formats: Seq[Map[String, Any]]): Display = {
    require(formats.size == ft.meta.columns.size,
      s"Expected ${ft.meta.columns.size} formats, got ${formats.size}")
    ft.meta.columns.zip(formats).foldLeft(this) { case (d, (ck, opts)) =>
      d.format(ck.physical, opts)
    }
  }

  /** Available format presets, optionally filtered by simplified dtype
    * (display.py `get_format_presets`). */
  def getFormatPresets(dtype: Option[String] = None): Map[String, Map[String, Any]] =
    Formats.presetOptions(dtype)

  // ---- terminals --------------------------------------------------------

  /** The raw table spec (reference `data_spec`). */
  def dataSpec(): com.fasterxml.jackson.databind.node.ObjectNode =
    TableSpec.build(ft, config.maxRows, formatOptions)

  /** The table spec as JSON (reference `get_json`). */
  def getJson(): String = TableSpec.toJson(ft, config.maxRows, formatOptions)

  /** HTML fragment embedding the web component (reference `_repr_html_`). */
  def html(): String = Html.fragment(ft, config, formatOptions)

  /** Standalone HTML page written to a file. */
  def write(path: String): Unit = Html.write(ft, path, config, formatOptions)
}
