package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextStats}
import graft.Tables.read

/** Training-data-pipeline operator queries (dedup, similarity search, text
  * analysis, multimodal plumbing) with DuckDB oracles where SQL-expressible.
  * Floating-point rule: ratios divide identical integers; cosines are rounded
  * to 6 dp before any threshold/rank decision so fold-order noise (~1e-13)
  * cannot flip a comparison.
  */
object ExtQueries {

  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    "q30_fingerprint" -> ((s, dir) =>
      read(s, dir, "documents")
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),
    "q31_dedup_exact" -> ((s, dir) =>
      Dedup.exact(read(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),
    "q32_text_stats" -> ((s, dir) =>
      TextStats.analyze(read(s, dir, "documents"), "text")
        .select(col("doc_id"), col("token_count"), col("n_chars_calc"),
          col("punct_ratio"), col("stop_ratio"), col("quality"))
        .orderBy(col("doc_id"))),
    "q33_langid" -> ((s, dir) =>
      read(s, dir, "documents")
        .select(col("doc_id"), TextStats.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),
    "q34_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(read(s, dir, "documents"), "doc_id", "text",
          minJaccard = 0.8)
        .orderBy(col("id1"), col("id2"))),
    "q35_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashDedupPairs(read(s, dir, "documents"), "doc_id", "text",
          minJaccard = 0.8)
        .orderBy(col("id1"), col("id2"))),
    "q36_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(read(s, dir, "documents"), "doc_id", "text",
          maxDist = 3)
        .orderBy(col("id1"), col("id2"))),
    "q37_embed_cosine" -> ((s, dir) =>
      Similarity.cosinePairs(read(s, dir, "embeddings"), "vec_id", "embedding",
          minCos = 0.4)
        .orderBy(col("id1"), col("id2"))),
    "q38_ann_topk" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      Similarity.annTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
          topK = 5)
        .orderBy(col("qid"), col("rank"))
    },
    "q39_ann_lsh" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      Similarity.annLshTopK(e, e.filter(col("vec_id") < 10), "vec_id",
          "embedding", topK = 5)
        .orderBy(col("qid"), col("rank"))
    },
    "q40_multimodal_decode" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal
        .withFakeMedia(read(s, dir, "documents"), "doc_id", "text")
        .as[Multimodal.MediaRow]
      Multimodal.decodeMeta(media).toDF().orderBy(col("id"))
    }
  )

  private val docToks =
    """string_split_regex(lower(trim(text)), '\s+')"""

  /** shared shingle CTEs (word 4-grams, distinct per doc) — mirrors
    * Dedup.shingles for the documents actually present (all >= 4 tokens). */
  private val shingleCtes =
    s"""toks AS (SELECT doc_id, $docToks AS t FROM documents),
       |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(t)-2),
       |         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3]))) AS g FROM toks),
       |d AS (SELECT DISTINCT doc_id, g FROM sh),
       |sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
       |co AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
       |       FROM d a JOIN d b ON a.g=b.g AND a.doc_id<b.doc_id GROUP BY 1,2),
       |j AS (SELECT id1, id2, CAST(c AS DOUBLE)/(s1.n+s2.n-c) AS jaccard
       |      FROM co JOIN sz s1 ON id1=s1.doc_id JOIN sz s2 ON id2=s2.doc_id)""".stripMargin

  private val jaccardSql =
    s"""WITH $shingleCtes
       |SELECT id1, id2, jaccard FROM j WHERE jaccard >= 0.8
       |ORDER BY id1, id2""".stripMargin

  /** cosine CTEs in explicit double arithmetic (mirrors Similarity exactly);
    * rounded to 6 dp before thresholds/ranks. */
  private val cosineCtes =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |       FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
      |      FROM e)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q30_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_dedup_exact" ->
      """WITH f AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents)
        |SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies, fp
        |FROM f GROUP BY fp ORDER BY doc_id""".stripMargin,
    "q32_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $docToks AS toks FROM documents)
         |SELECT doc_id,
         |  CAST(len(toks) AS INT) AS token_count,
         |  CAST(length(text) AS INT) AS n_chars_calc,
         |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)/length(text) AS punct_ratio,
         |  CAST(len(list_filter(toks, x -> list_contains(
         |    ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
         |    / len(toks) AS stop_ratio,
         |  (CASE WHEN len(toks) BETWEEN 30 AND 500 THEN 0.5 ELSE 0.0 END)
         |  + (CASE WHEN CAST(len(list_filter(toks, x -> list_contains(
         |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
         |      / len(toks) >= 0.05 THEN 0.3 ELSE 0.0 END)
         |  + (CASE WHEN CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
         |      / length(text) <= 0.1 THEN 0.2 ELSE 0.0 END) AS quality
         |FROM t ORDER BY doc_id""".stripMargin,
    "q33_langid" ->
      s"""WITH t AS (SELECT doc_id, $docToks AS toks FROM documents),
         |h AS (SELECT doc_id,
         |  len(list_filter(toks, x -> list_contains(
         |    ['the','and','of','to','a','is','in','for','on','with'], x))) AS en,
         |  len(list_filter(toks, x -> list_contains(
         |    ['der','die','das','und','ist','ein','nicht','mit'], x))) AS de,
         |  len(list_filter(toks, x -> list_contains(
         |    ['le','la','les','et','est','un','une','pour'], x))) AS fr,
         |  len(list_filter(toks, x -> list_contains(
         |    ['el','los','las','y','es','un','una','por'], x))) AS es
         |  FROM t)
         |SELECT doc_id,
         |  CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
         |       WHEN de >= fr AND de >= es THEN 'de'
         |       WHEN fr >= es THEN 'fr' ELSE 'es' END AS lang_pred
         |FROM h ORDER BY doc_id""".stripMargin,
    "q34_ngram_jaccard" -> jaccardSql,
    // MinHash-LSH recalls every pair at J >= 0.8 here (128 perms, 32 bands:
    // miss probability < 1e-13 at the data's minimum J of 0.889), so the
    // exact-Jaccard SQL is a valid oracle for the LSH path too.
    "q35_minhash_lsh" -> jaccardSql,
    "q37_embed_cosine" ->
      s"""WITH $cosineCtes,
         |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
         |        round(list_sum(list_transform(range(1, 65),
         |          k -> a.v[k]*b.v[k])) / (a.nrm*b.nrm), 6) AS cos_sim
         |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
         |SELECT id1, id2, cos_sim FROM p WHERE cos_sim >= 0.4
         |ORDER BY id1, id2""".stripMargin,
    "q38_ann_topk" ->
      s"""WITH $cosineCtes,
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 10),
         |p AS (SELECT q.qid, n.vec_id AS neighbor_id,
         |        round(list_sum(list_transform(range(1, 65),
         |          k -> q.qv[k]*n.v[k])) / (q.qnrm*n.nrm), 6) AS cos_sim
         |      FROM n, q WHERE n.vec_id <> q.qid),
         |r AS (SELECT qid, neighbor_id, cos_sim,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |          ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
         |      FROM p)
         |SELECT qid, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "q40_multimodal_decode" ->
      """SELECT doc_id AS id,
        |  CAST(strlen(text) % 640 + 16 AS INT) AS width,
        |  CAST((strlen(text) * 7) % 480 + 16 AS INT) AS height,
        |  CAST(strlen(text) % 30 + 1 AS INT) AS n_frames,
        |  CAST(strlen(text) AS INT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin
    // q36_simhash, q39_ann_lsh: signature-dependent (xxhash64) — not
    // SQL-expressible; covered by rows-only check + ScalaTest recall suites.
  )
}
