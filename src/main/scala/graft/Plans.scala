package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints formatted physical plans for the headline
  * queries so scan pruning (`ReadSchema`/`PushedFilters`), broadcast joins,
  * and whole-stage codegen spans can be reviewed per round.
  * `runMain graft.Plans [sfDir] [query...]`
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.tail.toSeq
      else Seq("q03_totals_both", "q04_subtotals", "q17_join_revenue",
        "q34_ngram_jaccard", "q37_embed_cosine", "q41_cosine_lsh",
        "q42_ann_ivf", "q23_tumbling_window",
        // r12 additions: residual IVFADC, the atlas, the dup audits
        "q130_residual_ivfpq", "q131_semantic_atlas",
        "q132_dup_histogram", "q133_dup_source_matrix")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
