package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints formatted physical plans for the headline
  * queries so scan pruning (`ReadSchema`/`PushedFilters`), broadcast joins,
  * and whole-stage codegen spans can be reviewed per round.
  * `runMain graft.Plans [sfDir] [query...]`
  *
  * When `SPARK_GRAFT_PLANS_OUT` is set, each query's formatted plan is
  * ALSO written to `$SPARK_GRAFT_PLANS_OUT/<query>_<suffix>.txt`
  * (suffix from `SPARK_GRAFT_PLANS_SUFFIX`, default "plan") — the
  * committable before/after evidence the optimization rounds keep under
  * `plans/rNN/`. */
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
    val outDir = sys.env.get("SPARK_GRAFT_PLANS_OUT")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "plan")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(txt)
      outDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"${n}_$suffix.txt"), txt)
      }
    }
    spark.stop()
  }
}
