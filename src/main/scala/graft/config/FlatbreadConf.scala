package graft.config

import java.nio.file.{Files, Path, Paths}
import scala.util.Try

/** Layered configuration mirroring the reference's ConfigService
  * (config/service.py:6-144): built-in defaults, deep-merged with
  * `~/.flatbread.json` (user layer) and a project-local `.flatbread.json`
  * discovered by walking up to 5 parent directories, plus runtime overrides.
  * JSON parsing uses the Jackson shipped with Spark (no extra deps).
  */
final case class FlatbreadConf(
    labelTotals: String = "Totals",
    labelSubtotals: String = "Subtotals",
    labelN: String = "n",
    labelPct: String = "pct",
    labelDiff: String = "diff",
    naRep: String = "<NA>",
    pctNdigits: Int = -1,
    /** Reference parity: flatbread defaults `base = 1` everywhere
      * (config.defaults.json:18, accessors/series.py:116,160) — percentage
      * views produce FRACTIONS, scaled to percent at display time by the
      * percent format preset. Pass `base = 100` per call (or set `"base":
      * 100` in `.flatbread.json`) for 0–100-scaled values. */
    pctBase: Int = 1,
    /** When true, apportioned rounding on a hierarchical index partitions its
      * cumsum window by the outer index levels (parallel, spill-safe at
      * scale; each group's rounded values sum to that GROUP's rounded sum).
      * Default false = the reference's single global column-wise cumsum
      * (percentages.py:390-419), whose column total equals the rounded grand
      * total — the two differ when per-group rounded sums don't add up to
      * the rounded global sum, so the parallel variant is opt-in. */
    apportionPartitioned: Boolean = false
)

object FlatbreadConf {

  @volatile private var runtime: Map[String, String] = Map.empty
  @volatile private var cached: Option[FlatbreadConf] = None

  /** The active, layered configuration. */
  def current: FlatbreadConf = cached.getOrElse {
    val c = load()
    cached = Some(c)
    c
  }

  /** Runtime override layer (reference `update_runtime`, service.py:113-123). */
  def updateRuntime(kv: (String, String)*): Unit = synchronized {
    runtime ++= kv
    cached = None
  }

  def reset(): Unit = synchronized { runtime = Map.empty; cached = None }

  private def load(): FlatbreadConf = {
    val layers: Seq[Map[String, String]] =
      Seq(userLayer(), projectLayer()).flatten :+ runtime
    layers.foldLeft(FlatbreadConf())((conf, layer) => applyLayer(conf, layer))
  }

  private def applyLayer(c: FlatbreadConf, m: Map[String, String]): FlatbreadConf = {
    def s(k: String, d: String) = m.getOrElse(k, d)
    def i(k: String, d: Int) = m.get(k).flatMap(v => Try(v.toInt).toOption).getOrElse(d)
    FlatbreadConf(
      labelTotals = s("label_totals", c.labelTotals),
      labelSubtotals = s("label_subtotals", c.labelSubtotals),
      labelN = s("label_n", c.labelN),
      labelPct = s("label_pct", c.labelPct),
      labelDiff = s("label_diff", c.labelDiff),
      naRep = s("na_rep", c.naRep),
      pctNdigits = i("ndigits", c.pctNdigits),
      pctBase = i("base", c.pctBase),
      apportionPartitioned = m.get("apportion_partitioned")
        .map(_.equalsIgnoreCase("true")).getOrElse(c.apportionPartitioned)
    )
  }

  private def userLayer(): Option[Map[String, String]] =
    readJsonFlat(Paths.get(sys.props.getOrElse("user.home", "/"), ".flatbread.json"))

  /** Walk cwd and up to 5 parents for a project `.flatbread.json`
    * (reference service.py:125-144). */
  private def projectLayer(): Option[Map[String, String]] = {
    var dir: Path = Paths.get(".").toAbsolutePath.normalize
    var hops = 0
    while (dir != null && hops <= 5) {
      val f = dir.resolve(".flatbread.json")
      if (Files.exists(f)) return readJsonFlat(f)
      dir = dir.getParent
      hops += 1
    }
    None
  }

  /** Flat string/number JSON object → Map (nested objects flattened with '.'). */
  private[config] def readJsonFlat(p: Path): Option[Map[String, String]] =
    if (!Files.exists(p)) None
    else
      Try {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = mapper.readTree(Files.readAllBytes(p))
        flatten("", node)
      }.toOption

  private def flatten(prefix: String,
                      node: com.fasterxml.jackson.databind.JsonNode): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    if (node.isObject)
      node.properties().asScala.flatMap { e =>
        val key = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
        flatten(key, e.getValue)
      }.toMap
    else Map(prefix -> node.asText())
  }
}
