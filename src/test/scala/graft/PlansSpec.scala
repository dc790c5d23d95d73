package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate over EVERY SparkEntry query (the audit
  * `graft.Plans` prints for humans, frozen as assertions): the scale
  * properties each round fights for — no cartesian products, no
  * single-partition windows outside the presentation layer, pruned scans —
  * must not silently regress when a query is edited. Planning only: each
  * query is constructed and planned at sf0.001, never executed (model-
  * training queries do run their bounded construction-time jobs). */
class PlansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val plans: Seq[(String, SparkPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sfDir).queryExecution.sparkPlan
    }

  /** Queries whose partitionless window runs over PRESENTATION-SIZED data
    * by design — the tabulation layer's final pivot (a handful of rows
    * wide, one row per group label) is ordered/cumulated as a whole on
    * purpose; these windows never see corpus-scale input. Additions
    * require the same justification. */
  private val globalWindowAllowed: Set[String] = Set(
    // flatbread tabulation terminals: the window runs over the FINAL pivot
    // (one row per group label — dozens of rows), computing presentation
    // percentages / apportioned rounding / ordering
    "q07_value_counts", "q09_pct_colwise", "q10_pct_grand", "q11_add_pct",
    "q12_apportioned", "q47_meta_roundtrip", "q48_pct_base_default",
    // rank attached to an already-LIMIT-topK result (<= topK rows)
    "q116_top_ngrams", "q143_cms_heavy_hitters",
    // shard ordinals over the MANIFEST (one row per written file —
    // shard-count-sized, never the corpus; the corpus-side counting is a
    // file-keyed groupBy)
    "q164_write_shards",
    // q184's terminal shard stage is q164's manifest discipline verbatim:
    // the ordinal window runs over the written-file manifest only
    "q184_pretrain_e2e",
    // cell-ordinal window over the K-row cell table (K <= nCells <= 65536,
    // the broadcast-pivot bound — one row per CELL, never the corpus);
    // it appears twice in the plan because the ordinal table feeds two
    // broadcast joins (anchor ordinal + partner lookup)
    "q196_contrastive_triplets",
    // water-fill windows run over the per-source AGGREGATE (one row per
    // source — K rows, never the corpus); the corpus-sized stage is the
    // count groupBy that precedes them
    "q197_epoch_waterfill"
  )

  test("no query plans a CartesianProduct") {
    val offenders = plans.flatMap { case (name, p) =>
      val n = p.collectWithSubqueries { case c: CartesianProductExec => c }.size
      if (n > 0) Some(s"$name: $n CartesianProduct") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("partitionless windows only in the presentation layer") {
    val offenders = plans.flatMap { case (name, p) =>
      val bad = p.collectWithSubqueries {
        case w: WindowExec if w.partitionSpec.isEmpty => w.getClass.getSimpleName
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.getClass.getSimpleName
      }
      if (bad.nonEmpty && !globalWindowAllowed(name))
        Some(s"$name: ${bad.size} partitionless ${bad.distinct.mkString(",")}")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no scan reads the full lineitem width (column pruning holds)") {
    // lineitem is the wide fact table (16 columns); no query needs all of
    // them, so a 16-column ReadSchema means pruning broke.
    val offenders = plans.flatMap { case (name, p) =>
      val wide = p.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.requiredSchema.size >= 16 => s.requiredSchema.size
      }
      if (wide.nonEmpty) Some(s"$name: scan reads ${wide.max} columns") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("scan-level filters reach the parquet reader (PushedFilters)") {
    // named probes: queries whose semantics put a row filter directly over
    // a table scan — the filter must appear in the scan's pushed-down
    // data filters, not only in a FilterExec above it.
    val probes: Seq[(String, String)] = Seq(
      "q20_setops" -> "o_orderstatus"  // status filters over the orders scan
    )
    val byName = plans.toMap
    val offenders = probes.flatMap { case (name, colFrag) =>
      byName.get(name).flatMap { p =>
        val pushed = p.collectWithSubqueries {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.dataFilters.map(_.toString).mkString(";")
        }.mkString(";")
        if (pushed.toLowerCase.contains(colFrag.toLowerCase)) None
        else Some(s"$name: no pushed filter mentioning '$colFrag' (got: $pushed)")
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the LM ref-slice pattern prunes at the scan through the repartition") {
    // The ref slices of the LM queries (q90/q93/q109/q135…) are a
    // documents scan + lang filter + repartition (ExtQueries.docsParEn);
    // their scans are checkpointed out of the FINAL plans, so freeze the
    // pattern itself: whichever side of the repartition the filter is
    // written on, it must reach the parquet scan's data filters.
    def scanFilters(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.dataFilters.map(_.toString)
      }.flatten
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val below = docs.filter(org.apache.spark.sql.functions.col("lang") === "en")
      .repartition(4)
    assert(scanFilters(below).exists(_.contains("lang")),
      "filter below repartition must reach the parquet scan")
    val above = docs.repartition(4)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
    assert(scanFilters(above).exists(_.contains("lang")),
      "filter above repartition must be pushed through it to the scan")
  }
}
