package graft.output

import java.sql.{Date, Timestamp}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.types._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core.FlatTable

/** Driver-side table spec emitter (reference TableSpecBuilder,
  * output/html/tablespec.py:14-265): collects the (presentation-sized)
  * FlatTable and produces the JSON shape consumed by the
  * `flatbread-wc-table-display` web component:
  * `{values, columns: {values,names,dtypes,formatOptions},
  *   index: {values,names,dtypes,formatOptions}}`.
  * This is the one deliberately non-distributed step (SURVEY.md §3 E3).
  */
object TableSpec {

  private val mapper = new ObjectMapper()

  /** dtype simplification, mirroring config.defaults.json:54-71. */
  def simpleDtype(dt: DataType): String = dt match {
    case StringType                       => "str"
    case BooleanType                      => "bool"
    case _: DecimalType                   => "float"
    case DoubleType | FloatType           => "float"
    case ByteType | ShortType | IntegerType | LongType => "int"
    case TimestampType | DateType         => "datetime"
    case _                                => "str"
  }

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  /** Scalar JSON serialization with the reference's coercions
    * (tablespec.py:243-265): timestamps ISO-8601 with date-only collapsed,
    * decimals to float, NaN/NA to null. */
  private def putValue(arr: ArrayNode, v: Any): Unit = v match {
    case null                  => arr.addNull()
    case d: Double if d.isNaN  => arr.addNull()
    case d: Double             => arr.add(d)
    case f: Float              => if (f.isNaN) arr.addNull() else arr.add(f.toDouble)
    case i: Int                => arr.add(i)
    case l: Long               => arr.add(l)
    case s: Short              => arr.add(s.toInt)
    case b: Byte               => arr.add(b.toInt)
    case b: Boolean            => arr.add(b)
    case d: java.math.BigDecimal => arr.add(d.doubleValue())
    case d: Date               => arr.add(d.toString)
    case t: Timestamp          =>
      val ldt = t.toLocalDateTime
      if (ldt.toLocalTime == java.time.LocalTime.MIDNIGHT)
        arr.add(ldt.toLocalDate.toString)
      else arr.add(ldt.format(tsFmt))
    case other                 => arr.add(other.toString)
  }

  /** Build the spec from a FlatTable (canonical order, truncated). */
  def build(ft: FlatTable, maxRows: Int = 1000,
            formats: Map[String, Map[String, Any]] = Map.empty): ObjectNode = {
    val meta = ft.meta
    val schema = ft.df.schema.fields.map(f => f.name -> f.dataType).toMap
    val rows = ft.ordered.limit(maxRows).collect()

    val root = mapper.createObjectNode()

    val values = root.putArray("values")
    rows.foreach { r =>
      val arr = values.addArray()
      meta.valueCols.foreach { c =>
        putValue(arr, r.get(r.fieldIndex(c)))
      }
    }

    val columns = root.putObject("columns")
    val colVals = columns.putArray("values")
    meta.columns.foreach { ck =>
      if (meta.nColLevels == 1) colVals.add(ck.key.last)
      else {
        val k = colVals.addArray()
        ck.key.foreach(k.add)
      }
    }
    val colNames = columns.putArray("names")
    meta.colNames.foreach(n => if (n.isDefined) colNames.add(n.get) else colNames.addNull())
    val colDtypes = columns.putArray("dtypes")
    meta.valueCols.foreach(c => colDtypes.add(simpleDtype(schema(c))))
    columns.set[ObjectNode]("formatOptions",
      FormatResolver.forColumns(meta, schema, formats, mapper))

    val index = root.putObject("index")
    val idxVals = index.putArray("values")
    rows.foreach { r =>
      if (meta.nLevels == 1)
        putValue(idxVals.addArray(), r.get(r.fieldIndex(meta.indexLevels.head)))
      else {
        val k = idxVals.addArray()
        meta.indexLevels.foreach(l => putValue(k, r.get(r.fieldIndex(l))))
      }
    }
    val idxNames = index.putArray("names")
    meta.indexLevels.foreach(idxNames.add)
    val idxDtypes = index.putArray("dtypes")
    meta.indexLevels.foreach(l => idxDtypes.add(simpleDtype(schema(l))))

    root
  }

  def toJson(ft: FlatTable, maxRows: Int = 1000,
             formats: Map[String, Map[String, Any]] = Map.empty): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(build(ft, maxRows, formats))
}

/** Per-column display-format resolution (reference output/formats.py:7-102 +
  * tablespec.py:119-241): explicit format map first, then "smart" substring
  * matching of the column key text against known labels (pct → percent style,
  * diff → signed), dtype-gated defaults otherwise.
  */
object FormatResolver {

  /** smart label rules (config.defaults.json:28-53). */
  val smartRules: Seq[(String, Map[String, Any])] = Seq(
    "pct"  -> Map("style" -> "percent", "maximumFractionDigits" -> 1),
    "diff" -> Map("signDisplay" -> "always", "maximumFractionDigits" -> 0),
    "n"    -> Map("maximumFractionDigits" -> 0)
  )

  def resolve(keyParts: Seq[String], dtype: DataType,
              explicit: Option[Map[String, Any]]): Map[String, Any] =
    explicit.getOrElse {
      smartRules.collectFirst {
        case (label, opts) if keyParts.exists(p =>
          p == label || p.startsWith(label + "_") ||
            // substring match only for multi-char labels ("n" would otherwise
            // swallow every column containing the letter)
            (label.length > 1 && p.contains(label))) => opts
      }.getOrElse(dtype match {
        case DoubleType | FloatType | _: DecimalType =>
          Map("maximumFractionDigits" -> 2)
        case _ => Map.empty[String, Any]
      })
    }

  private[output] def forColumns(meta: graft.core.TableMeta,
                                 schema: Map[String, DataType],
                                 explicit: Map[String, Map[String, Any]],
                                 mapper: ObjectMapper): ObjectNode = {
    val node = mapper.createObjectNode()
    meta.columns.foreach { ck =>
      val opts = resolve(ck.key, schema(ck.physical), explicit.get(ck.physical))
      if (opts.nonEmpty) {
        val o = node.putObject(ck.physical)
        opts.foreach {
          case (k, v: Int)     => o.put(k, v)
          case (k, v: Double)  => o.put(k, v)
          case (k, v: Boolean) => o.put(k, v)
          case (k, v)          => o.put(k, v.toString)
        }
      }
    }
    node
  }
}
