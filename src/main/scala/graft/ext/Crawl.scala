package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The full crawl-curation pipeline COMPOSED, in the published RefinedWeb
  * order (Penedo et al. 2023, "The RefinedWeb Dataset for Falcon LLM":
  * URL-level filtering first — it needs no tokenization — then line/
  * document quality, then deduplication, cheapest to most expensive:
  * exact → fuzzy → semantic). Every stage is an existing oracled operator
  * of this library; what this terminal adds (and q138 pins) is their
  * COMPOSITION — each stage consumes exactly the prior stage's survivors
  * through one materialization boundary, no stage re-scans the corpus,
  * and the per-document verdict is auditable.
  *
  * Scale shape: 7 stage boundaries, each a `CheckpointStrategy`
  * materialization of the shrinking survivor set; the only corpus-keyed
  * shuffles are the ones the member operators already make (url-key
  * aggregate, fingerprint aggregate, band buckets, cell pairs). The fate
  * labeling at the end is a chain of skinny id-only left joins. */
object Crawl {

  /** Pipeline stages in drop-precedence order (a document's `fate` is the
    * FIRST stage that dropped it). */
  val Stages: Seq[String] = Seq("url_dedup", "url_rules", "c4", "gopher",
    "exact", "neardup", "semantic")

  /** Run the composed pipeline and label every INPUT row with its `fate`:
    * `kept`, or the first stage that dropped it.
    *
    *   1. `url_dedup`  — canonical-URL keep-best ([[Urls.dedupByUrl]],
    *                     score = `scoreCol`)
    *   2. `url_rules`  — URL hygiene ([[Urls.filterUrls]]: host present,
    *                     blocklist, length, digit fraction)
    *   3. `c4`         — C4 line corrections + page gates
    *                     ([[TextStats.c4Filter]]); survivors' text is the
    *                     CLEANED text downstream, the RefinedWeb posture
    *   4. `gopher`     — Gopher document-quality gates over the cleaned
    *                     text ([[TextStats.gopherFilter]])
    *   5. `exact`      — fingerprint dedup, min-id representative
    *                     ([[Dedup.exact]])
    *   6. `neardup`    — MinHash-LSH near-dup components, min-id winner
    *                     ([[Dedup.minhashDedupPairs]] +
    *                     [[Dedup.nearDupClusters]])
    *   7. `semantic`   — embedding-cosine dedup over `embCol`
    *                     ([[Similarity.semanticDedup]])
    *
    * Returns (idCol, fate). The input must carry an embedding per row
    * (the real pipeline embeds before the semantic stage). */
  def refinedWebFate(docs: DataFrame, idCol: String, urlCol: String,
                     textCol: String, scoreCol: String, embCol: String,
                     blockedDomains: Seq[String] = Nil,
                     maxUrlLen: Int = 2048, maxDigitFrac: Double = 0.5,
                     minJaccard: Double = 0.8, minCos: Double = 0.95,
                     nCells: Int = 16,
                     checkpoint: CheckpointStrategy = CheckpointStrategy.Local)
      : DataFrame = {
    val cp = CheckpointStrategy.materializer(checkpoint)
    val cols = Seq("id", "url", "text", "score", "emb")
    val base = cp(docs.select(col(idCol).as("id"), col(urlCol).as("url"),
      col(textCol).as("text"), col(scoreCol).as("score"),
      col(embCol).as("emb")))
    val s1 = cp(Urls.dedupByUrl(base, "id", "url", "score")
      .select(cols.map(col): _*))
    val s2 = cp(Urls.filterUrls(s1, "url", blockedDomains, maxUrlLen,
      maxDigitFrac))
    val s3 = cp(TextStats.c4Filter(s2, "text"))
    val s4 = cp(TextStats.gopherFilter(s3, "text"))
    val s5 = cp(s4.join(Dedup.exact(s4, "id", "text").select(col("id")),
      Seq("id"), "left_semi"))
    val ndDrops = Dedup.nearDupClusters(
        Dedup.minhashDedupPairs(s5, "id", "text", minJaccard),
        checkpoint = checkpoint)
      .filter(col("id") =!= col("cluster")).select(col("id"))
    val s6 = cp(s5.join(ndDrops, Seq("id"), "left_anti"))
    val s7 = Similarity.semanticDedup(s6, "id", "emb", minCos, nCells,
      checkpoint = checkpoint).select(col("id"))
    val survivors = Stages.zip(Seq(s1, s2, s3, s4, s5, s6, s7))
    val marked = survivors.foldLeft(base.select(col("id"))) {
      case (acc, (name, s)) =>
        acc.join(s.select(col("id")).withColumn(s"__s_$name", lit(1)),
          Seq("id"), "left")
    }
    val fate = Stages.foldRight(lit("kept"): Column) { case (name, after) =>
      when(col(s"__s_$name").isNull, lit(name)).otherwise(after)
    }
    marked.select(col("id").as(idCol), fate.as("fate"))
  }
}
