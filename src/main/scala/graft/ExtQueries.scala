package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Corpus, Dedup, Eval, Multimodal, Quantize, Retrieval, Serving, Similarity, TextStats, Urls}
import graft.Tables.{read, PresentBy}

/** Training-data-pipeline operator queries (dedup, similarity search, text
  * analysis, multimodal plumbing) with DuckDB oracles. Floating-point rule:
  * ratios divide identical integers; cosines are rounded to 6 dp before any
  * threshold/rank decision so fold-order noise (~1e-13) cannot flip a
  * comparison. Signature-based queries (q36 SimHash, q39 LSH ANN) use
  * hash/plane formulations that are pure ANSI-SQL arithmetic (md5 hex words,
  * integer LCG hyperplanes, quantized integer projections) so DuckDB
  * recomputes the ENTIRE pipeline — signatures, banding, candidate join,
  * re-rank — not just a derived invariant.
  */
object ExtQueries {

  type Q = (SparkSession, String) => DataFrame

  /** documents with the scan spread across the cluster: the table is a single
    * small file, so the CPU-heavy per-row stages that precede any shuffle
    * (tokenize → shingle → signature) would otherwise run in ONE task. At
    * real scale the scan has thousands of splits and this is a no-op-shaped
    * cost (one skinny shuffle of the raw text). */
  private def docsPar(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)

  /** The English reference slice, filtered at the scan: the optimizer
    * pushes the predicate through the repartition either way
    * (PlansSpec freezes that), so this is equivalent to
    * `docsPar(...).filter(...)` — written filter-first to state the
    * intended plan (prune parquet row groups, then spread only the
    * surviving slice) rather than rely on the rewrite. */
  private def docsParEn(s: SparkSession, dir: String): DataFrame =
    read(s, dir, "documents").filter(col("lang") === "en")
      .repartition(s.sparkContext.defaultParallelism)

  /** Shared q177/q180 conversation fixture: each document's whitespace
    * tokens cut into 8-token turns alternating user/assistant — the
    * deterministic turn-array the SFT operators serialize. (size ≥ 1
    * always: split of '' yields [''], so nt ≥ 1 and sequence never
    * descends.) */
  private def sftTurns(s: SparkSession, dir: String): DataFrame =
    docsPar(s, dir)
      .select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("toks"))
      .withColumn("__nt", expr("CAST((size(toks) + 7) DIV 8 AS INT)"))
      .withColumn("turns", transform(sequence(lit(0), col("__nt") - 1),
        w => struct(
          when(w % 2 === 0, lit("user")).otherwise(lit("assistant"))
            .as("role"),
          array_join(slice(col("toks"), w * 8 + 1, lit(8)), " ")
            .as("content"))))
      .select(col("doc_id"), col("turns"))

  /** Shared q185/q187 fixture: first (up to) two turns of the q177
    * conversation as the prompt, 1 + doc_id % 3 candidate completions cut
    * from the token stream; the doc_id % 5 == 0 docs repeat ONE slice n
    * times — the all-tie case both the keep-best tie-break (q185) and the
    * zero-variance advantage convention (q187) exercise. */
  private def bestOfNFixture(s: SparkSession, dir: String): DataFrame =
    docsPar(s, dir)
      .select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("toks"))
      .withColumn("__nt", expr("CAST((size(toks) + 7) DIV 8 AS INT)"))
      .withColumn("prompt",
        transform(sequence(lit(0), least(col("__nt"), lit(2)) - 1),
          w => struct(
            when(w % 2 === 0, lit("user")).otherwise(lit("assistant"))
              .as("role"),
            array_join(slice(col("toks"), w * 8 + 1, lit(8)), " ")
              .as("content"))))
      .withColumn("cands",
        transform(sequence(lit(0), (col("doc_id") % 3).cast("int")),
          j => array_join(slice(col("toks"),
            (when(col("doc_id") % 5 === 0, lit(0)).otherwise(j) * 4 + 17)
              .cast("int"), lit(8)), " ")))
      .select(col("doc_id"), col("prompt"), col("cands"))

  /** q184 fixture: four shared "template" page bodies — 7 lines of exactly
    * 8 words each ending '.', 56 words, stopword-bearing ('the'/'and'/
    * 'that'/'with'/'have' as exact tokens) — engineered to pass every C4
    * line rule (terminal punct, >= 5 words, no 'javascript'), the C4 page
    * gates (>= 3 sentences, no lorem, no brace) and every Gopher gate
    * (50+ words, mean word length in [3,10], all-alpha tokens, >= 2 stop
    * hits). Docs with doc_id % 9 == 0 carry template (doc_id % 4) VERBATIM
    * (exact-duplicate groups for the keep-best stage); % 9 == 1 docs carry
    * it plus [[q184Variant]] (a near-dup at 4-shingle Jaccard ~ 0.87). */
  private val q184Templates: Seq[String] = {
    val subjects = Seq("alpha", "bravo", "charlie", "delta")
    subjects.map { s =>
      Seq(
        s"the $s corpus begins with clean rows here.",
        "every line holds eight plain words that count.",
        "we keep the data neat and very tidy.",
        "tables join rows and columns with care today.",
        "scans read pages while filters prune them fast.",
        s"the $s pipeline packs tokens into batches now.",
        "that is all we have with the data."
      ).mkString("\n")
    }
  }
  private val q184Variant = "a small extra tail line follows here now."

  /** SF dir the q66 serve-only index was built for — rebuilt on change so
    * a run over a different SF can never serve a stale index. */
  private val serveIndexFor =
    new java.util.concurrent.atomic.AtomicReference[String]()

  /** SF dir the q157 postings store was built for — same rebuild-on-change
    * discipline as [[serveIndexFor]]. */
  private val bm25StoreFor =
    new java.util.concurrent.atomic.AtomicReference[String]()

  /** Shared q46/q49 pipeline: media → byte-bigram embedStub → mean-centered
    * LSH near-dup pairs at cos ≥ 0.99 (bits=512/bands=32; recall 1.0 vs the
    * exact join at every tested SF — see the q46 comment). The decode+embed
    * upstream is the dominant cost of a REAL multimodal pipeline, so the
    * prepared projection is checkpointed once inside the pair operator
    * instead of re-executing for each of its ~5 downstream subplans. */
  private def mediaEmbedPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.withFakeMedia(docsPar(s, dir), "doc_id", "text")
      .as[Multimodal.MediaRow]
    val emb = Multimodal.embed(media).toDF()
    Similarity.cosineLshPairs(emb, "id", "embedding", minCos = 0.99,
      bits = 512, bands = 32, center = true,
      checkpoint = Some(graft.ext.CheckpointStrategy.Local))
  }

  val all: Map[String, Q] = Map(
    "q30_fingerprint" -> ((s, dir) =>
      read(s, dir, "documents")
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"),
          TextStats.rollingHash(col("text")).as("rolling_hash"))
        .presentBy(col("doc_id"))),
    "q31_dedup_exact" -> ((s, dir) =>
      Dedup.exact(read(s, dir, "documents"), "doc_id", "text")
        .presentBy(col("doc_id"))),
    "q32_text_stats" -> ((s, dir) =>
      TextStats.analyze(read(s, dir, "documents"), "text")
        .select(col("doc_id"), col("token_count"), col("n_chars_calc"),
          col("punct_ratio"), col("stop_ratio"), col("quality"))
        .presentBy(col("doc_id"))),
    "q33_langid" -> ((s, dir) =>
      read(s, dir, "documents")
        .select(col("doc_id"), TextStats.langId(col("text")).as("lang_pred"))
        .presentBy(col("doc_id"))),
    // stop-gram cap active by default (Dedup.DefaultMaxDocFreq = 1000); the
    // oracle carries no cap — provably equivalent at sf<=0.01 where every
    // document-frequency is bounded by the 500-doc corpus size, and spec-
    // tested for equivalence on the fixture (ExtSpec).
    "q34_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docsPar(s, dir), "doc_id", "text",
          minJaccard = 0.8)
        .presentBy(col("id1"), col("id2"))),
    "q35_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashDedupPairs(docsPar(s, dir), "doc_id", "text",
          minJaccard = 0.8)
        .presentBy(col("id1"), col("id2"))),
    "q36_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docsPar(s, dir), "doc_id", "text",
          maxDist = 3, hasher = Dedup.Hasher.Md5)
        .presentBy(col("id1"), col("id2"))),
    // exact pairs via the grid-blocked self-join — the scale-shaped exact
    // plan (no full-corpus broadcast); the brute-force SQL is the oracle.
    "q37_embed_cosine" -> ((s, dir) =>
      Similarity.cosinePairsBlocked(read(s, dir, "embeddings"), "vec_id",
          "embedding", minCos = 0.4)
        .presentBy(col("id1"), col("id2"))),
    "q38_ann_topk" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      Similarity.annTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
          topK = 5)
        .presentBy(col("qid"), col("rank"))
    },
    "q39_ann_lsh" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      Similarity.annLshTopK(e, e.filter(col("vec_id") < 10), "vec_id",
          "embedding", topK = 5)
        .presentBy(col("qid"), col("rank"))
    },
    "q40_multimodal_decode" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal
        .withFakeMedia(read(s, dir, "documents"), "doc_id", "text")
        .as[Multimodal.MediaRow]
      Multimodal.decodeMeta(media).toDF().presentBy(col("id"))
    },
    // IVF-ANN: deterministic coarse pivots -> nearest-cell assignment ->
    // nProbe probed cells -> exact re-rank; the whole pipeline is mirrored
    // in the DuckDB oracle.
    "q42_ann_ivf" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      Similarity.annIvfTopK(e, e.filter(col("vec_id") < 10), "vec_id",
          "embedding", topK = 5)
        .presentBy(col("qid"), col("rank"))
    },
    // D4-style prototypicality pruning: per semantic cell, drop the 25%
    // most-pivot-similar members, keep the diverse tail. nCells pinned to 16
    // for the oracle (the operator auto-sizes to ~sqrt(n) by default).
    "q83_proto_prune" -> ((s, dir) =>
      Similarity.prototypicalityPrune(read(s, dir, "embeddings"), "vec_id",
          "embedding", keepFrac = 0.75, nCells = 16)
        .presentBy(col("vec_id"))),
    // dedup endgame: pairs -> connected components -> representative per
    // cluster (min id); oracled by a recursive transitive closure in DuckDB
    "q44_dedup_clusters" -> ((s, dir) =>
      Dedup.nearDupClusters(
          Dedup.ngramJaccardPairs(docsPar(s, dir), "doc_id", "text",
            minJaccard = 0.8))
        .presentBy(col("id"))),
    // the deduped-CORPUS terminal: documents minus non-representative
    // near-dup cluster members (LEFT ANTI against the closure clusters);
    // oracle = q44's recursive closure feeding an anti-join
    "q50_dedup_corpus" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      Dedup.removeNearDups(docs, "doc_id",
          Dedup.ngramJaccardPairs(docs, "doc_id", "text", minJaccard = 0.8))
        .select(col("doc_id"))
        .presentBy(col("doc_id"))
    },
    // collection/json scalar-function breadth (SURVEY §2.6): array ops, a
    // map lookup, and json build+extract, all codegen'd built-ins; the
    // oracle checks the VALUES (duckdb computes the same results through its
    // own list/json functions)
    "q45_collection_funcs" -> ((s, dir) =>
      read(s, dir, "documents")
        .select(col("doc_id"),
          sort_array(array_distinct(TextStats.tokens(col("text"))))
            .getItem(0).as("first_tok"),
          array_contains(TextStats.tokens(col("text")), "the")
            .cast("int").as("has_the"),
          element_at(map(lit("len"), length(col("text"))), "len").as("len_via_map"),
          get_json_object(
            concat(lit("{\"n\":"), length(col("text")).cast("string"), lit("}")),
            "$.n").cast("int").as("n_from_json"))
        .presentBy(col("doc_id"))),
    // token accounting at both granularities: whitespace + BPE pre-tokenizer
    "q43_bpe_tokens" -> ((s, dir) =>
      read(s, dir, "documents")
        .select(col("doc_id"),
          TextStats.bpeTokenCount(col("text")).as("bpe_tokens"),
          TextStats.tokenCount(col("text")).as("ws_tokens"))
        .presentBy(col("doc_id"))),
    // Embedding near-dup dedup in the regime LSH is FOR: the corpus gets one
    // deterministic planted near-dup per vector (cos ≈ 0.999, reproducible
    // in SQL), and AUTO-SIZED LSH banding (bits = 0 → autoSignatureBits
    // picks r from the measured corpus count so the n²·b·2⁻ʳ random-
    // collision term stays ≤ ~n BY CONSTRUCTION — the r11-verdict fix for
    // the one superlinear slope: the previously pinned r=16 left a
    // residual that dominated at 10×) + exact re-rank recovers every
    // planted pair. At the auto width (r=32 for this fixture range) the
    // planted-pair miss is ≤ ~1e-7/pair — recall 1.0 in practice — so the
    // brute-force SQL over the same constructed corpus stays the oracle
    // (it never sees the banding parameters at all).
    "q41_cosine_lsh" -> { (s, dir) =>
      val corpus = Similarity.plantNearDups(read(s, dir, "embeddings"),
        "vec_id", "embedding", offset = 1000000L, scale = 0.01)
      Similarity.cosineLshPairs(corpus, "vec_id", "embedding", minCos = 0.95,
          bits = 0, bands = 16)
        .presentBy(col("id1"), col("id2"))
    },
    // The multimodal path END-TO-END under the oracle (VERDICT r2 #7):
    // text → binary media column → per-partition feature extraction
    // (embedStub's byte-bigram feature hashing — pure integer arithmetic,
    // mirrored bucket-for-bucket in SQL) → LSH near-dup pairs over the
    // resulting embeddings. These embeddings are heavily CORRELATED (shared
    // ASCII bigram statistics: median background cosine ≈ 0.78), the regime
    // `center = true` exists for: mean-centered signatures with
    // bits=512/bands=32 recover every true pair at all tested SFs (recall
    // 1.0 vs the exact join; measured candidate mass 0.37% of pairs vs 50%
    // uncentered — the r3 scale-killer fix), so the brute-force SQL over the
    // SQL-recomputed embeddings remains a valid oracle for the whole
    // pipeline. Re-ranking uses raw vectors, so output rows are identical.
    "q46_media_embed_dedup" -> ((s, dir) =>
      mediaEmbedPairs(s, dir).presentBy(col("id1"), col("id2"))),
    // The embedding-dedup ENDGAME: q46's media → embed → centered-LSH pair
    // pipeline composed into connected components (min-label propagation) —
    // one representative per near-dup media cluster. Oracled end-to-end: the
    // DuckDB SQL recomputes the embeddings, the exact pair graph at 0.99,
    // and a recursive transitive closure (q44's pattern over q46's graph).
    "q49_embed_dedup_clusters" -> ((s, dir) =>
      Dedup.nearDupClusters(mediaEmbedPairs(s, dir)).presentBy(col("id"))),
    // The full text-dedup terminal (exact collapse → MinHash-LSH near-dup
    // pairs over representatives → anti-join): closes the band-bucket cap's
    // oversized-identical-group corner structurally (ExtSpec pins that
    // corner with a constructed 50-copy group; the fixture has no exact
    // dups, so here the oracle mirrors the same structure over the
    // exact-representative sub-corpus, and the LSH pair graph is oracled by
    // exact Jaccard at the q35-pinned recall-1.0 parameters).
    "q51_dedup_corpus_terminal" -> { (s, dir) =>
      Dedup.dedupCorpus(docsPar(s, dir), "doc_id", "text", minJaccard = 0.8)
        .select(col("doc_id"))
        .presentBy(col("doc_id"))
    },
    // Benchmark decontamination: per-document distinct-8-gram overlap against
    // an eval set (here: every 20th doc) — 8 is the operator default (the
    // production 8-13-gram window; 4-grams collide on common phrases). One
    // gram-key semi-join — the benchmark side is tiny relative to the corpus
    // and AQE broadcasts it when it fits (not forced).
    "q52_contamination" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      Corpus.benchmarkContamination(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .presentBy(col("doc_id"))
    },
    // Deterministic train/val/test assignment from the md5 of the doc id —
    // zero shuffle, stable as the corpus grows (no re-split leakage). The
    // oracle recomputes the identical bucket arithmetic from md5 hex.
    "q53_hash_split" -> ((s, dir) =>
      Corpus.hashSplit(read(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("bucket"), col("split"))
        .presentBy(col("doc_id"))),
    // Gopher-style repetition metrics: duplicate-word / top-bigram /
    // duplicate-trigram fractions, all per-row integer-ratio arithmetic.
    // docsPar: the CPU-heavy per-row n-gram work must not run in the single
    // task the one-file scan would otherwise produce.
    "q54_repetition" -> ((s, dir) =>
      TextStats.repetitionStats(docsPar(s, dir), "text")
        .select(col("doc_id"), col("dup_word_frac"), col("top_bigram_frac"),
          col("dup_trigram_frac"))
        .presentBy(col("doc_id"))),
    // Repetition gates as a terminal: thresholds chosen to make all three
    // rules bite on the fixture distribution (medians 0.54/0.033/0.0).
    "q89_repetition_filter" -> ((s, dir) =>
      TextStats.repetitionFilter(docsPar(s, dir), "text",
          maxDupWord = 0.55, maxTopBigram = 0.05, maxDupTrigram = 0.03)
        .select(col("doc_id"), col("source"))
        .presentBy(col("doc_id"))),
    // Gopher quality rules (Rae et al. 2021, table A1): seven per-document
    // verdict columns plus the conjunction, all pure per-row expressions —
    // integer counts and one double division each, so the DuckDB oracle
    // replays every rule bit-for-bit. Verdicts cast to INT (0/1) so both
    // engines hash the same representation. docsPar: per-row regex work
    // must not run in the one task a single-file scan would produce.
    "q82_gopher_quality" -> { (s, dir) =>
      val rules = Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stop_hits",
        "gopher_pass")
      TextStats.gopherStats(docsPar(s, dir), "text")
        .select(col("doc_id") +: rules.map(r => col(r).cast("int").as(r)): _*)
        .presentBy(col("doc_id"))
    },
    // C4 page cleaning over a synthesized line-structured corpus (the
    // fixture docs are single-line; q70's trick): 8-token lines, with line
    // (doc_id+i)%4 deciding the ending ('.', '!', none, ' javascript.') and
    // every 5th line truncated to 3 words — so each line rule fires — plus
    // page-level lorem-ipsum (doc_id%11) and brace (doc_id%13) plants.
    // blockWords exercises the badword gate against a real fixture token.
    "q84_c4_filters" -> { (s, dir) =>
      val withLines = docsPar(s, dir)
        .select(col("doc_id"), graft.ext.TextStats.tokens(col("text")).as("__t"))
        .select(col("doc_id"), expr(
          "transform(sequence(0, greatest(cast(ceil(size(__t)/8.0) as int)-1, 0)), i -> " +
            "concat(array_join(slice(__t, i*8+1, case when i%5=4 then 3 else 8 end), ' '), " +
            "case when (doc_id+i)%4=0 then '.' when (doc_id+i)%4=1 then '!' " +
            "when (doc_id+i)%4=2 then '' else ' javascript.' end))").as("__lines"))
        .select(col("doc_id"), concat(
          array_join(col("__lines"), "\n"),
          when(col("doc_id") % 11 === 0, lit("\nsee lorem ipsum terms."))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit("\nconfig { }"))
            .otherwise(lit(""))).as("text"))
      TextStats.c4Stats(withLines, "text", blockWords = Seq("customer"))
        .select(col("doc_id"), col("n_lines"), col("n_lines_kept"),
          col("n_sentences"), col("has_lorem").cast("int").as("has_lorem"),
          col("has_brace").cast("int").as("has_brace"), col("blocked_hits"),
          col("c4_keep").cast("int").as("c4_keep"), col("clean_text"))
        .presentBy(col("doc_id"))
    },
    // Source-level quality gate: keep docs whose source's mean integer
    // quality points clear the bar (7.8 keeps 11/20 fixture sources). The
    // mean is sum(int)/count — fold-order-exact, so the threshold compare is
    // reproducible across engines.
    "q55_source_gate" -> ((s, dir) =>
      Corpus.sourceQualityGate(read(s, dir, "documents"), "source", "text",
          minAvgPoints = 7.8)
        .select(col("doc_id"), col("source"), col("src_docs"), col("avg_points"))
        .presentBy(col("doc_id"))),
    // ANN over int8-quantized embeddings: ranking by quantized cosine, whose
    // dots/norms are exact integer arithmetic — the 4×-narrower scan path for
    // candidate generation at corpus scale. The oracle mirrors the whole
    // pipeline (scale → round → integer dot → rank) value-for-value.
    "q56_ann_quantized" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      Quantize.annTopKQuantized(e, e.filter(col("vec_id") < 10), "vec_id",
          "embedding", topK = 5)
        .presentBy(col("qid"), col("rank"))
    },
    // Deterministic stratified sampling by language: hash-threshold per
    // stratum (en 50%, zh 100%, default 10%) — reproducible across runs and
    // engines, unlike RNG-stream sampleBy.
    "q57_stratified_sample" -> ((s, dir) =>
      Corpus.stratifiedSample(read(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 0.5, "zh" -> 1.0), default = 0.1, salt = "sample1")
        .select(col("doc_id"), col("lang"))
        .presentBy(col("doc_id"))),
    // The decontamination TERMINAL: q52's overlap feeding an anti-join —
    // the corpus with eval-set leaks removed.
    "q58_decontaminated" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      Corpus.decontaminate(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0), "doc_id", "text",
          maxOverlap = 0.5)
        .select(col("doc_id"))
        .presentBy(col("doc_id"))
    },
    // Sequence packing: distributed prefix sum of token counts in doc order,
    // chunk = the 1024-token training sequence the doc's first token lands
    // in. The two-phase range-partition formulation — NOT a global-order
    // window (which would collapse to one partition).
    "q59_pack_sequences" -> { (s, dir) =>
      val docs = read(s, dir, "documents")
        .select(col("doc_id"), TextStats.tokenCount(col("text")).as("tokens"))
      Corpus.packSequences(docs, "doc_id", "tokens", capacity = 1024)
        .select(col("doc_id"), col("tokens"), col("cum_tokens"), col("chunk"))
        .presentBy(col("doc_id"))
    },
    // Incremental ingestion dedup: a constructed arrival batch — the first
    // 100 docs UPPERCASED under new ids (exact dups modulo the fingerprint's
    // case/whitespace normalization) plus 50 genuinely fresh docs — deduped
    // against the full corpus via the Bloom-prefiltered fingerprint probe.
    // The Bloom filter is a performance device only; the confirming
    // semi-join makes the result exact, so the plain NOT IN SQL is the
    // oracle at any fpp.
    "q60_incremental_dedup" -> { (s, dir) =>
      val docs = read(s, dir, "documents")
      val arrivals = docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 1000).as("doc_id"), upper(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id").between(100, 149))
          .select((col("doc_id") + 1000).as("doc_id"),
            concat(col("text"), lit(" zqfreshx")).as("text")))
      Dedup.incrementalExact(arrivals, docs, "doc_id", "text")
        .select(col("doc_id"))
        .presentBy(col("doc_id"))
    },
    // REAL image decode under the oracle: deterministic synthetic PNGs
    // (pixel channels are affine-mod functions of (doc_id, x, y); dims
    // 16+id%8 × 16+3·id%8) are ENCODED per partition, decoded back through
    // the JDK's ImageIO — a real container format, not a stub — and reduced
    // to per-channel means over exact integer sums. The oracle recomputes
    // the statistics ANALYTICALLY from the pixel formula: PNG is lossless,
    // so any decoder deviation (color model, row order, truncation) breaks
    // the hash. docsPar: encode+decode is the CPU-heavy per-row chain.
    "q61_image_decode" -> { (s, dir) =>
      import s.implicits._
      Multimodal.imageStats(
          Multimodal.syntheticImages(docsPar(s, dir), "doc_id"))
        .toDF().withColumnRenamed("id", "doc_id")
        .presentBy(col("doc_id"))
    },
    // REAL audio decode under the oracle — q61's pattern for sound:
    // deterministic 16-bit PCM WAVs (sample i of clip id is
    // ((id·7 + i·31) % 65536) − 32768, length 1000 + id%500) encoded and
    // decoded through the JDK's sampled-sound stack, reduced to exact
    // integer loudness sums; the oracle recomputes avg|s| and RMS from the
    // sample formula — WAV PCM is lossless, so the hash pins the decoder.
    "q62_audio_decode" -> { (s, dir) =>
      import s.implicits._
      Multimodal.audioStats(
          Multimodal.syntheticAudio(docsPar(s, dir), "doc_id"))
        .toDF().withColumnRenamed("id", "doc_id")
        .presentBy(col("doc_id"))
    },
    // REAL COMPRESSED audio decode under the oracle (r9): deterministic
    // G.711 μ-law WAVs (code byte i of clip id is (id·13 + i·17) % 256,
    // length 800 + id%400) decoded through the JDK's ULAW expander (the
    // telephony companding codec — 8-bit log-compressed, 2× smaller than
    // PCM16) into linear 16-bit samples, reduced to exact integer loudness
    // sums. μ-law is lossy as an ENCODER but the DECODE is a fixed integer
    // expansion, and the fixture is defined in CODE space — so the oracle
    // replays the G.711 expansion arithmetically and the hash pins the
    // JDK expander bit-for-bit (the spec separately pins all 256 codes
    // against the CCITT formula).
    "q77_ulaw_audio" -> { (s, dir) =>
      import s.implicits._
      Multimodal.audioStats(
          Multimodal.syntheticCompressedAudio(docsPar(s, dir), "doc_id"))
        .toDF().withColumnRenamed("id", "doc_id")
        .presentBy(col("doc_id"))
    },
    // q77's A-law sibling (r9): G.711 A-law is the OTHER half of the
    // telephony codec pair — different companding curve (13-segment,
    // even-bits-inverted, OPPOSITE sign convention from μ-law) — decoded
    // on the lock-free direct-parse path (format code 6). The fixture is
    // defined in code space, so the oracle replays the CCITT A-law
    // expansion arithmetically; the spec separately pins the direct parser
    // to the JDK's ALAW expander over all 256 codes.
    "q78_alaw_audio" -> { (s, dir) =>
      import s.implicits._
      Multimodal.audioStats(
          Multimodal.syntheticAlawAudio(docsPar(s, dir), "doc_id"))
        .toDF().withColumnRenamed("id", "doc_id")
        .presentBy(col("doc_id"))
    },
    // SemDeDup under the oracle (r9): the q41 planted-near-dup corpus
    // (every vector gets a cos ≈ 0.999 twin at id + 1e6) run through the
    // semantic-dedup terminal — nearest-of-16-pivots cell assignment,
    // intra-cell exact cosine pairs at 0.95, connected components, keep
    // the min id per component. The oracle replays the SAME algorithm
    // (cells, intra-cell pairs, recursive min-label closure): within-cell-
    // only comparison is the operator's DEFINITION (the SemDeDup
    // approximation), not an implementation shortcut, so the two sides
    // agree exactly — including on any planted twin that lands across a
    // cell boundary from its seed.
    "q79_semantic_dedup" -> { (s, dir) =>
      val corpus = Similarity.plantNearDups(read(s, dir, "embeddings"),
        "vec_id", "embedding", offset = 1000000L, scale = 0.01)
      Similarity.semanticDedup(corpus, "vec_id", "embedding",
          minCos = 0.95, nCells = 16)
        .select(col("vec_id"))
        .presentBy(col("vec_id"))
    },
    // q79's PERSISTED-INDEX sibling (r10): the SAME planted corpus and the
    // SAME 16 first-id pivots, but the cell assignment is built once into
    // the bucketed IVF index tables and the dedup is served FROM the index
    // (semanticPairsIndexed reuses the stored assignment — the O(n·K)
    // assignment pass is not re-run). Assignment is bit-stable, so the
    // oracle is q79's SQL verbatim; like q63, the query rebuilds the index
    // per invocation so it is self-contained and its bench number prices
    // build+serve.
    "q81_semantic_dedup_indexed" -> { (s, dir) =>
      val corpus = Similarity.plantNearDups(read(s, dir, "embeddings"),
        "vec_id", "embedding", offset = 1000000L, scale = 0.01)
      Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
        "graft_q81_sem", nCells = 16, buckets = 8)
      Similarity.semanticDedupIndexed(s, "graft_q81_sem", corpus, "vec_id",
          minCos = 0.95)
        .select(col("vec_id"))
        .presentBy(col("vec_id"))
    },
    // Incremental EMBEDDING dedup under the oracle (r10): history = the
    // even-id originals, arrivals = the odd-id originals (fresh — no
    // original-original pair reaches 0.95 in this fixture) plus one
    // planted cos ≈ 0.999 twin per original. Dups of even seeds drop, odd
    // originals and odd-seed dups survive. bits=256/bands=16 is q41's
    // recall-1.0 regime (per-pair miss ~2e-11), so the brute-force
    // arrival×seen cosine join is the oracle — the same operator the
    // streaming epoch loop (dedupIncrementalCosine) replays per batch.
    "q80_incremental_cosine" -> { (s, dir) =>
      val e = read(s, dir, "embeddings").select("vec_id", "embedding")
      val seen = e.filter(col("vec_id") % 2 === 0)
      val arrivals = e.filter(col("vec_id") % 2 === 1).unionByName(
        Similarity.plantNearDups(e, "vec_id", "embedding",
          offset = 1000000L, scale = 0.01).filter(col("vec_id") >= 1000000L))
      Similarity.incrementalCosine(arrivals, seen, "vec_id", "embedding",
          minCos = 0.95, bits = 256, bands = 16)
        .select(col("vec_id"))
        .presentBy(col("vec_id"))
    },
    // The persisted-index serving path under the oracle: build the IVF
    // index (centroids + cell-bucketed vectors as catalog tables — the
    // index-once/query-many shape), then serve top-k FROM THE TABLES with
    // no reassignment. Cell assignment is bit-stable, so serving equals
    // q42's in-memory operator — the oracle SQL is q42's, verbatim, now
    // also pinning the bucketed round-trip. The query deliberately
    // rebuilds per invocation so it is self-contained and can never serve
    // a stale index across SF changes; its BENCH number therefore prices
    // build+serve (q42 minus this is the per-query amortization the
    // persisted index buys — the serving-only plan is pinned by ExtSpec's
    // zero-exchange assertion).
    "q63_ann_ivf_indexed" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      Similarity.buildIvfIndex(e, "vec_id", "embedding", "graft_q63_ivf",
        nCells = 16, buckets = 8)
      Similarity.annIvfTopKIndexed(s, "graft_q63_ivf",
          e.filter(col("vec_id") < 10), "vec_id", "embedding", topK = 5)
        .presentBy(col("qid"), col("rank"))
    },
    // q63's SERVE-ONLY companion: the index is built once per SF dir (the
    // guard below) and every later invocation only serves from the
    // persisted tables. Under Bench's warmup-then-time discipline the
    // build lands in the untimed warmup, so this row prices what the
    // index-once/query-many deployment actually pays per query — the
    // amortization q63's honest build+serve number hides. Same oracle SQL
    // as q42/q63 (served results are bit-identical).
    "q66_ann_serve_only" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      if (serveIndexFor.get != dir) {
        Similarity.buildIvfIndex(e, "vec_id", "embedding", "graft_q66_ivf",
          nCells = 16, buckets = 8)
        serveIndexFor.set(dir)
      }
      Similarity.annIvfTopKIndexed(s, "graft_q66_ivf",
          e.filter(col("vec_id") < 10), "vec_id", "embedding", topK = 5)
        .presentBy(col("qid"), col("rank"))
    },
    // k-means IVF under the hash oracle: centroid updates are fixed-point
    // (unit directions quantized to the 1e-6 grid before the per-dimension
    // integer sum — associative, so partition order cannot move a bit),
    // which makes two full Lloyd iterations bit-reproducible in DuckDB SQL.
    // The previously float-sum update kept this variant spec-only.
    "q67_ann_ivf_kmeans" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      Similarity.annIvfKMeansTopK(e, e.filter(col("vec_id") < 10), "vec_id",
          "embedding", topK = 5, nCells = 8, nProbe = 2, iters = 2)
        .presentBy(col("qid"), col("rank"))
    },
    // Incremental NEAR-dup ingestion dedup (q60's signature-space sibling):
    // arrivals are the first 100 docs with their own FIRST TOKEN appended —
    // the distinct token set is unchanged, so the k=1 SimHash is EQUAL while
    // the exact fingerprint differs (q60's operator would keep them all) —
    // plus 50 genuinely fresh docs (a novel token changes the set). The
    // Bloom prefilter probes the 64-bit signatures directly; the confirming
    // semi-join makes the result exact, so the NOT-EXISTS SQL over
    // recomputed signatures is the oracle at any fpp.
    "q64_incremental_neardup" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val arrivals = docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 2000).as("doc_id"),
          concat(col("text"), lit(" "),
            TextStats.tokens(col("text")).getItem(0)).as("text"))
        .unionByName(docs.filter(col("doc_id").between(100, 149))
          .select((col("doc_id") + 2000).as("doc_id"),
            concat(col("text"), lit(" zqfreshnear")).as("text")))
      Dedup.incrementalNear(arrivals, docs, "doc_id", "text",
          k = 1, hasher = Dedup.Hasher.Md5)
        .select(col("doc_id"))
        .presentBy(col("doc_id"))
    },
    // Hamming ≤ 3 incremental near-dup (the pigeonhole extension of q64):
    // arrivals are small REAL EDITS — the first 100 docs with one novel
    // token appended, which shifts every k=1 bit balance by ±1 and flips
    // the handful of bits sitting at balance 0/1 (typically Hamming 1-3
    // against the original; occasionally 0 or >3 — the oracle recomputes
    // the full pipeline either way, so the fixture needs no planted
    // signatures) — plus 50 fresh docs of wholly novel tokens (Hamming
    // ~32). Block-keyed Bloom probes prefilter; the popcount-Hamming
    // confirm join makes the result exact at any fpp.
    "q65_incremental_neardup_h3" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val freshText = concat_ws(" ", Seq("zqa", "zqb", "zqc", "zqd", "zqe")
        .map(t => concat(lit(t), (col("doc_id") + 3000).cast("string"))): _*)
      val arrivals = docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 3000).as("doc_id"),
          concat(col("text"), lit(" zqeditnear")).as("text"))
        .unionByName(docs.filter(col("doc_id").between(100, 149))
          .select((col("doc_id") + 3000).as("doc_id"), freshText.as("text")))
      Dedup.incrementalNear(arrivals, docs, "doc_id", "text",
          k = 1, hasher = Dedup.Hasher.Md5, maxDist = 3)
        .select(col("doc_id"))
        .presentBy(col("doc_id"))
    },
    // REAL multi-frame decode under the oracle (q61's pattern for video):
    // deterministic animated GIFs (frame f of clip id: gray
    // (id + 11f + 3x + 5y) % 256 over dims 16+id%5 × 12+3id%5, 2 + id%3
    // frames, drawn through an explicit 256-gray palette) are encoded per
    // partition and decoded back through ImageIO's SEQUENCE reader
    // (getNumImages/read(i)); every second frame is sampled — real frame
    // sampling over real frames — and reduced to exact gray sums. The
    // oracle recomputes the per-frame means analytically: the explicit
    // palette makes the GIF round-trip lossless, so any deviation in the
    // frame decoder, the frame COUNT, or the sampling breaks the hash.
    "q68_video_frames" -> { (s, dir) =>
      import s.implicits._
      Multimodal.frameStats(
          Multimodal.syntheticVideos(docsPar(s, dir), "doc_id"), stride = 2)
        .toDF().withColumnRenamed("id", "doc_id")
        .presentBy(col("doc_id"), col("frame_idx"))
    },
    // The SECOND real video container under the SAME oracle pattern (r9):
    // deterministic uncompressed-DIB AVIs (frame f of clip id: gray
    // (id + 11f + 3x + 5y) % 256 over dims 14+id%6 × 10+5id%7, 2 + id%4
    // frames) are hand-encoded into standard RIFF/AVI on the executors and
    // decoded back through the direct container walker (hdrl/strl/strf →
    // movi '00db' chunks, bottom-up BGR rows with 4-byte padding). BI_RGB
    // DIB is raw bytes — lossless — so the oracle recomputes the per-frame
    // means analytically: any deviation in the RIFF walk, the row order /
    // padding math, the frame COUNT, or the sampling breaks the hash. The
    // MJPEG flavor of the same container (JPEG frames, lossy) is
    // spec-checked instead (ExtSpec).
    "q76_avi_frames" -> { (s, dir) =>
      import s.implicits._
      Multimodal.frameStats(
          Multimodal.syntheticAviVideos(docsPar(s, dir), "doc_id"), stride = 2)
        .toDF().withColumnRenamed("id", "doc_id")
        .presentBy(col("doc_id"), col("frame_idx"))
    },
    // Incremental index maintenance under the oracle: the index is built on
    // a 400-vector PREFIX of the corpus (which contains the 16 pivot ids,
    // so the pivot set equals the full build's) and the remaining 100
    // vectors are APPENDED against the frozen centroids. Bit-stable
    // assignment makes build-on-prefix + append IDENTICAL to
    // build-on-everything — the oracle is q42's SQL verbatim, now pinning
    // the append path's bucketed write too.
    "q71_ann_ivf_append" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      Similarity.buildIvfIndex(e.filter(col("vec_id") < 400), "vec_id",
        "embedding", "graft_q71_ivf", nCells = 16, buckets = 8)
      Similarity.appendToIvfIndex(s, "graft_q71_ivf",
        e.filter(col("vec_id") >= 400), "vec_id", "embedding")
      Similarity.annIvfTopKIndexed(s, "graft_q71_ivf",
          e.filter(col("vec_id") < 10), "vec_id", "embedding", topK = 5)
        .presentBy(col("qid"), col("rank"))
    },
    // PII redaction over a deterministic PII-bearing fixture (the corpus
    // text carries no PII, so the query plants an email — two for every
    // third doc — a dashed phone and an IPv4 per doc, all derived from
    // doc_id). The patterns are RE2-compatible by construction
    // (Corpus.PiiPatterns), so the oracle replays the same replacement
    // chain and per-pattern counts verbatim in DuckDB — dialect drift in
    // any pattern breaks the hash, which is the point: a scrub that
    // matches differently across engines is a compliance bug.
    "q69_pii_redaction" -> { (s, dir) =>
      val pii = docsPar(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"),
          when(col("doc_id") % 3 === 0, lit(" admin@test.org"))
            .otherwise(lit("")),
          lit(" or 555-867-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") % 100).cast("string")).as("text"))
      Corpus.redactPii(pii, "text")
        .select(col("doc_id"), col("text_redacted"),
          col("n_emails"), col("n_ips"), col("n_phones"))
        .presentBy(col("doc_id"))
    },
    // C4-style boilerplate line removal: documents are reshaped into lines
    // (header line carrying the source, body = 10-token lines, shared
    // footer), and any line occurring in >= 10 DISTINCT docs is dropped
    // corpus-wide — per-source headers (25+ docs each) and the global
    // footer go, content lines stay. The oracle rebuilds the same line
    // fixture and replays the frequency threshold + in-order reassembly in
    // SQL; kept/dropped counts ride along as the audit columns.
    "q70_boilerplate_lines" -> { (s, dir) =>
      val withLines = docsPar(s, dir)
        .select(col("doc_id"), col("source"),
          graft.ext.TextStats.tokens(col("text")).as("__t"))
        .select(col("doc_id"), col("source"),
          expr("transform(sequence(0, greatest(cast(ceil(size(__t)/10.0) as int)-1, 0)), i -> array_join(slice(__t, i*10+1, 10), ' '))")
            .as("__lines"))
        .select(col("doc_id"),
          concat_ws("\n",
            concat(lit("begin header "), col("source")),
            array_join(col("__lines"), "\n"),
            lit("copyright footer all rights reserved")).as("text"))
      Corpus.removeBoilerplateLines(withLines, "doc_id", "text", minDocs = 10)
        .presentBy(col("doc_id"))
    },
    // Exact substring (8-token-window) duplication report — the
    // span-granular dedup of Lee et al. 2022 as posting lists. docsPar:
    // the window explode is the CPU stage before the first shuffle.
    "q72_duplicate_spans" -> ((s, dir) =>
      graft.ext.Spans.duplicateSpans(docsPar(s, dir), "doc_id", "text", w = 8)
        .presentBy(col("span"))),
    // The removal terminal: same spans, rewritten documents. Output text is
    // whitespace-normalized lowercase by the operator's contract.
    "q73_drop_duplicate_spans" -> ((s, dir) =>
      graft.ext.Spans.dropDuplicateSpans(docsPar(s, dir), "doc_id", "text", w = 8)
        .presentBy(col("doc_id"))),
    // Frequency capping: at most 20 docs per source, ranked by salted md5
    // of the id — deterministic, so the oracle replays the exact ranking.
    "q74_cap_per_source" -> ((s, dir) =>
      Corpus.capPerKey(read(s, dir, "documents"), "source", "doc_id", cap = 20)
        .select(col("doc_id"), col("source"))
        .presentBy(col("doc_id"))),
    // Mixture targeting: sample down to a 50/30/20 mix of three sources
    // (everything else dropped). At the uniform fixture counts the LARGEST
    // weight is the limiting source, so src0 is kept whole and the other
    // two thin to 0.6/0.4 — the oracle recomputes the same
    // count → rate → hash-threshold chain in SQL (doubles end to end; the
    // rates here land on exactly representable values, and the CAST AS
    // DOUBLE keeps DuckDB's decimal literals out of the arithmetic).
    "q75_target_mixture" -> ((s, dir) =>
      Corpus.targetMixture(read(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .select(col("doc_id"), col("source"))
        .presentBy(col("doc_id"))),
    // Sliding-window chunking at 8 tokens / stride 4 (50% overlap, the
    // retrieval-index shape); tail chunks shorter by design.
    "q88_chunk_documents" -> ((s, dir) =>
      Corpus.chunkDocuments(read(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 8, stride = 4)
        .presentBy(col("doc_id"), col("chunk_idx"))),
    // Quality-weighted retention: keep probability = qualityPoints/10 —
    // the soft alternative to a hard quality cutoff. Integer points (not the
    // double score) so the per-row cut is bit-replayable in the oracle.
    "q87_quality_sampling" -> { (s, dir) =>
      val scored = read(s, dir, "documents")
        .withColumn("pts", TextStats.qualityPoints(col("text")))
        .withColumn("frac", col("pts").cast("double") / 10.0)
      Corpus.sampleByFraction(scored, "doc_id", "frac")
        .select(col("doc_id"), col("pts"))
        .presentBy(col("doc_id"))
    },
    // URL hygiene over synthesized per-doc URLs (fixture has no URL column):
    // scheme by doc_id%2, www by %3, host = source + suffix by %7 (two
    // multi-label public suffixes reachable), digit path, %9 docs get a
    // 60-char pad so the maxLen=80 rule fires; blocklist + digit-frac rules
    // split on real fixture variation. Oracle replays extraction and rules.
    "q86_url_filters" -> { (s, dir) =>
      val suffix = expr("case cast(doc_id % 7 as int) when 0 then 'co.uk' " +
        "when 1 then 'com' when 2 then 'org' when 3 then 'net' " +
        "when 4 then 'io' when 5 then 'com.au' else 'de' end")
      val url = concat(
        lit("http"), when(col("doc_id") % 2 === 0, "s").otherwise(""),
        lit("://"), when(col("doc_id") % 3 === 0, "www.").otherwise(""),
        col("source"), lit("."), suffix, lit("/d/"),
        ((col("doc_id") * 37) % 1000).cast("string"),
        when(col("doc_id") % 9 === 0, concat(lit("?pad="), lit("x" * 60)))
          .otherwise(""))
      Urls.urlStats(
          read(s, dir, "documents").select(col("doc_id"), url.as("url")),
          "url", blockedDomains = Seq("src0.com", "src1.org", "src2.co.uk"),
          maxLen = 80, maxDigitFrac = 0.12)
        .select(col("doc_id"), col("url"), col("host"), col("domain"),
          col("url_len"), col("digit_frac"),
          col("blocked").cast("int").as("blocked"),
          col("url_ok").cast("int").as("url_ok"))
        .presentBy(col("doc_id"))
    },
    // α-sampling at the mT5 default α=0.5: realized counts ∝ sqrt(n) per
    // source, limiting source kept whole. sqrt (unlike pow) is correctly
    // rounded everywhere, which is what makes the oracle replay exact.
    // The fixture's sources are UNIFORM (α-sampling would be an identity),
    // so the query first skews the corpus deterministically: four sources
    // keep every row, the rest keep every 4th — two count tiers the
    // sqrt weights then rebalance.
    "q85_temperature_mixture" -> ((s, dir) =>
      Corpus.temperatureMixture(
          read(s, dir, "documents")
            .filter(col("source").isin("src0", "src1", "src2", "src3") ||
              col("doc_id") % 4 === 0),
          "doc_id", "source", alpha = 0.5)
        .select(col("doc_id"), col("source"))
        .presentBy(col("doc_id"))),
    // CCNet-style corpus-wide paragraph dedup over q70's synthesized
    // multi-line docs (per-source headers + a global footer plant repeats;
    // body lines are 10-token slices). First occurrence in (doc_id, idx)
    // order wins; the digit-stripping CCNet key collapses ALL "begin
    // header srcN" paragraphs onto one survivor. Membership preserved:
    // all-dup docs emit empty text_dedup.
    "q92_dedup_paragraphs" -> { (s, dir) =>
      val withLines = docsPar(s, dir)
        .select(col("doc_id"), col("source"),
          graft.ext.TextStats.tokens(col("text")).as("__t"))
        .select(col("doc_id"), col("source"),
          expr("transform(sequence(0, greatest(cast(ceil(size(__t)/10.0) as int)-1, 0)), i -> array_join(slice(__t, i*10+1, 10), ' '))")
            .as("__lines"))
        .select(col("doc_id"),
          concat_ws("\n",
            concat(lit("begin header "), col("source")),
            array_join(col("__lines"), "\n"),
            lit("copyright footer all rights reserved")).as("text"))
      Corpus.dedupParagraphs(withLines, "doc_id", "text")
        .select(col("doc_id"), col("text_dedup"), col("para_total"),
          col("para_kept"))
        .presentBy(col("doc_id"))
    },
    // REAL BPE apply (custom codegen'd expression, graft_bpe_encode): a
    // small well-formed merges table so the oracle can replay the merge
    // loop as rank-ordered replace passes over a US-wrapped char string —
    // valid because for well-formed tables (each side a base char or an
    // earlier merge's output) min-rank iteration == rank-order application.
    // Tokens joined with chr(31) (can't occur in text), ids space-joined.
    "q91_bpe_apply" -> ((s, dir) =>
      TextStats.bpeStats(docsPar(s, dir), "text",
          q91Merges.map { case (a, b) => s"$a $b" }, q91Vocab)
        .select(col("doc_id"), col("bpe_count"),
          array_join(col("bpe_tokens"), "\u001f").as("bpe_str"),
          array_join(transform(col("bpe_ids"), _.cast("string")), " ")
            .as("bpe_ids_str"))
        .presentBy(col("doc_id"))),
    // CCNet-style LM quality score: bigram add-1 model trained on the
    // English slice, every document scored by mean NLL — non-English docs
    // surface as the high-NLL tail, the exact separation CCNet buckets on.
    // docsPar on the scored side (tokenize+explode before the first
    // shuffle); the ref slice feeds one aggregate. Defaults (n=2, k=1,
    // maxVocab 2^20) are what the oracle replays.
    // docsPar on BOTH sides: the ref slice feeds two tokenize+explode
    // aggregates, which over the single-file scan would each run in one
    // task (measured: 9.5s -> ~2s at sf0.1 from this alone)
    "q90_perplexity" -> ((s, dir) =>
      graft.ext.Perplexity.perplexityScore(
          docsPar(s, dir), "doc_id", "text",
          ref = docsParEn(s, dir))
        .select(col("doc_id"), col("lang"), col("lm_grams"), col("lm_oov"),
          col("nll_mean"))
        .presentBy(col("doc_id"))),
    // DSIR (Xie et al. 2023): hashed uni+bigram bag models, target = the
    // English slice vs raw = the whole corpus; per-doc log importance
    // weight = document-order sum of per-bucket log count-ratios. Same
    // float discipline as q90 (integer counts, model-sized ln table,
    // pos-sorted fold, 6 dp); the md5 bucket arithmetic is q53's.
    "q93_dsir_weights" -> ((s, dir) =>
      graft.ext.Dsir.dsirLogWeights(
          docsPar(s, dir), "doc_id", "text",
          target = docsParEn(s, dir))
        .select(col("doc_id"), col("lang"), col("ds_grams"), col("ds_logw"))
        .presentBy(col("doc_id"))),
    // DSIR selection terminal: keep the top 25% by log weight via the
    // histogram-CDF cutoff + boundary tie-fill (equivalent to rank by
    // (ds_logw DESC, doc_id) <= ceil(0.25 n), which is what the oracle
    // replays as one window).
    "q94_dsir_select" -> ((s, dir) =>
      graft.ext.Dsir.dsirSelect(
          docsPar(s, dir), "doc_id", "text",
          target = docsParEn(s, dir),
          keepFrac = 0.25)
        .select(col("doc_id"), col("ds_logw"))
        .presentBy(col("doc_id"))),
    // CCNet head/middle/tail on q90's scores: histogram-CDF terciles over
    // the rounded NLL values, ties land in one bucket as a block.
    "q95_perplexity_buckets" -> ((s, dir) =>
      graft.ext.Perplexity.perplexityBuckets(
          graft.ext.Perplexity.perplexityScore(
            docsPar(s, dir), "doc_id", "text",
            ref = docsParEn(s, dir)))
        .select(col("doc_id"), col("nll_mean"), col("ppl_bucket"))
        .presentBy(col("doc_id"))),
    // Stupid Backoff bigram score (Brants et al. 2007): seen bigrams score
    // c(bg)/c(ctx), unseen back off to alpha * unigram with a +1/+V floor;
    // same capped-broadcast model + document-order fold shape as q90.
    "q109_stupid_backoff" -> ((s, dir) =>
      graft.ext.Perplexity.stupidBackoffScore(
          docsPar(s, dir), "doc_id", "text",
          ref = docsParEn(s, dir))
        .select(col("doc_id"), col("lang"), col("sb_grams"), col("sb_hits"),
          col("sb_logscore"))
        .presentBy(col("doc_id"))),
    // Trainable quality classifier (fastText-recipe logistic regression
    // over hashed uni+bigram features), DISTILLING the heuristic gate:
    // labels come from qualityPoints on every 4th doc (pos = full marks),
    // the model learns to predict the gate from raw text, and the whole
    // corpus is scored — the DataComp/Dolma-style seed-labeled quality
    // model. Training is engine-side and iterative, so the trained weight
    // table is FROZEN through OracleAux and the DuckDB oracle replays the
    // entire corpus-scale scoring pass against it (hashed-gram features,
    // DECIMAL dot product, sigmoid — see the dynamicOracle builder);
    // GD determinism and class separation stay spec-pinned.
    "q111_quality_classifier" -> ((s, dir) => {
      val docs = docsPar(s, dir)
      val slice = docs.filter(col("doc_id") % 4 === 0)
        .withColumn("__pts", TextStats.qualityPoints(col("text")))
      val model = graft.ext.Classifier.train(
        pos = slice.filter(col("__pts") === 10).drop("__pts"),
        neg = slice.filter(col("__pts") < 10).drop("__pts"),
        idCol = "doc_id", textCol = "text", iters = 12, lr = 300.0)
      OracleAux.writeModel("q111_model", model)
      graft.ext.Classifier.score(docs, "doc_id", "text", model)
        .select(col("doc_id"), col("lang"), col("clf_prob"), col("clf_keep"))
        .presentBy(col("doc_id"))
    }),
    // Calibration of the trained quality classifier on a HELD-OUT labeled
    // slice (doc_id % 4 == 2 -- disjoint from q111's % 4 == 0 train slice,
    // same qualityPoints == 10 labeling): reliability-diagram bins of
    // clf_prob vs observed positive rate. Model trained in-query (fewer
    // iters than q111 -- calibration shape, not accuracy, is under test),
    // FROZEN through OracleAux; the oracle replays held-out scoring,
    // labels, and the binning arithmetic.
    "q146_clf_calibration" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val slice = docs.filter(col("doc_id") % 4 === 0)
        .withColumn("__pts", TextStats.qualityPoints(col("text")))
      val model = graft.ext.Classifier.train(
        pos = slice.filter(col("__pts") === 10).drop("__pts"),
        neg = slice.filter(col("__pts") < 10).drop("__pts"),
        idCol = "doc_id", textCol = "text", iters = 6, lr = 300.0)
      OracleAux.writeModel("q146_model", model)
      val held = docs.filter(col("doc_id") % 4 === 2)
        .withColumn("label",
          (TextStats.qualityPoints(col("text")) === 10).cast("int"))
      graft.ext.Classifier.calibrationReport(held, "doc_id", "text",
          "label", model, bins = 10)
        .presentBy(col("bin"))
    },
    // Sentence-level language segmentation: per-segment q33 langid →
    // per-language segment counts, modal language, modal share — the
    // polyglot-page detector. Pure per-row column algebra, zero shuffles.
    "q110_segment_langid" -> ((s, dir) =>
      TextStats.segmentLangStats(read(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_segments"), col("seg_en"), col("seg_de"),
          col("seg_fr"), col("seg_es"), col("lang_major"), col("lang_major_frac"))
        .presentBy(col("doc_id"))),
    // CCNet text normalization as a column op: lower → 1:1 accent fold →
    // digits→0 → strip non-letter/digit/space → collapse whitespace; the
    // md5 of the result is the normalized-identity dedup key. Pure per-row
    // codegen'd expressions, replayed verbatim by the oracle.
    "q96_ccnet_normalize" -> ((s, dir) =>
      read(s, dir, "documents")
        .select(col("doc_id"), Corpus.ccnetNormalize(col("text")).as("text_norm"))
        .select(col("doc_id"), col("text_norm"), md5(col("text_norm")).as("norm_fp"))
        .presentBy(col("doc_id"))),
    // Quality-aware exact dedup: each duplicate group keeps its highest-
    // n_chars member (id tiebreak) instead of the minimum id — one
    // fingerprint shuffle, argmax as min(struct(-score, id)).
    "q97_dedup_keep_best" -> ((s, dir) =>
      graft.ext.Dedup.exactKeepBest(
          read(s, dir, "documents"), "doc_id", "text", "n_chars")
        .presentBy(col("doc_id"))),
    // Per-doc top-5 terms by tf-idf: capped-broadcast df table, one
    // (id, term) shuffle, per-doc rank window; score rounded to 6 dp
    // BEFORE the rank decision, term tiebreak.
    "q98_tfidf_topterms" -> ((s, dir) =>
      graft.ext.Keywords.tfidfTopTerms(docsPar(s, dir), "doc_id", "text")
        .presentBy(col("doc_id"), col("rank")))
    ,
    // Product-quantization ADC top-k (Jégou et al. 2011): 8 subspaces x
    // 16-code codebooks trained on the vec_id < 64 slice by TWO
    // deterministic fixed-point Lloyd iterations (seeded from the first-K
    // set; the oracle re-derives both iterations in SQL — exact integer
    // 1e-6-grid sums, so the centroids replay bit-for-bit); corpus scanned
    // as codes only, queries keep raw subvectors.
    "q103_pq_topk" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      graft.ext.Quantize.pqTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", m = 8, ksub = 16, topK = 5,
          train = e.filter(col("vec_id") < 64), kmeansIters = 2)
        .presentBy(col("qid"), col("rank"))
    },
    // Snapshot diff: old = ids not divisible by 10, new = ids not
    // divisible by 9 with every 7th doc's text edited — all four statuses
    // realized on the fixture.
    "q105_corpus_diff" -> { (s, dir) =>
      val docs = read(s, dir, "documents")
      graft.ext.Audit.corpusDiff(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 9 =!= 0)
            .withColumn("text", when(col("doc_id") % 7 === 0,
              concat(col("text"), lit(" edited v2"))).otherwise(col("text"))),
          "doc_id", "text")
        .select(col("doc_id"), col("status"), col("fp_old"), col("fp_new"))
        .presentBy(col("doc_id"))
    },
    // Per-benchmark contamination report over q52's split, bench names
    // b0/b1/b2 from doc_id % 3 — which benchmark leaked where. k=4 (not
    // the production 8): the report is hits-sized, and the fixture needs
    // plentiful collisions to gate anything.
    "q106_contamination_by_bench" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      Corpus.contaminationByBenchmark(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0)
            .withColumn("bench",
              concat(lit("b"), (col("doc_id") % 3).cast("string"))),
          "doc_id", "text", "bench", k = 4)
        .withColumnRenamed("id", "doc_id")
        .presentBy(col("doc_id"), col("bench"))
    },
    // IVF-PQ (IVFADC): smallest-id L2 cells route each query to 4 of 16
    // cells via an equi-join; ADC re-rank reads codes only. Same
    // kmeans-trained codebook setup as q103 (2 Lloyd iterations, oracled).
    "q104_ivfpq_topk" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      graft.ext.Quantize.ivfPqTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", topK = 5, nCells = 16, nProbe = 4,
          m = 8, ksub = 16, train = e.filter(col("vec_id") < 64),
          kmeansIters = 2)
        .presentBy(col("qid"), col("rank"))
    },
    // RESIDUAL IVF-PQ (the paper's true IVFADC): codes quantize
    // v − centroid(cell) instead of v, queries probe with their own
    // residual — the same (m, ksub) budget spent on the (much smaller)
    // residual structure. One shared codebook trained on train-slice
    // residuals by the same two oracled Lloyd iterations as q104.
    "q130_residual_ivfpq" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      graft.ext.Quantize.ivfPqTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", topK = 5, nCells = 16, nProbe = 4,
          m = 8, ksub = 16, train = e.filter(col("vec_id") < 64),
          kmeansIters = 2, residual = true)
        .presentBy(col("qid"), col("rank"))
    },
    // Min-K% Prob (Shi et al. 2023): membership-inference / memorization
    // probe — mean NLL of only the 20% most surprising bigrams per doc
    // under q90's reference model. Same deterministic n-gram analogue;
    // per-doc DESC sort of its own nll array, prefix fold, 6 dp.
    "q135_mink_prob" -> ((s, dir) =>
      graft.ext.Perplexity.minKProbScore(
          docsPar(s, dir), "doc_id", "text",
          ref = docsParEn(s, dir), kFrac = 0.2)
        .select(col("doc_id"), col("lang"), col("lm_grams"), col("mk_k"),
          col("mink_nll"))
        .presentBy(col("doc_id"))),
    // OPQ-rotated PQ (Ge et al. 2013, the parametric principle): a learned
    // dimension permutation balances per-subspace variance before the
    // split. The permutation (trained on the < 64 slice, deterministic)
    // is frozen through OracleAux; the oracle replays q103's full
    // two-iteration Lloyd + encode + ADC pipeline over the permuted
    // vectors.
    "q136_opq_pq_topk" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      val train = e.filter(col("vec_id") < 64)
      OracleAux.write("q136_perm",
        graft.ext.Quantize.opqPermutation(train, "vec_id", "embedding", 8)
          .map(_.toString).toSeq)
      graft.ext.Quantize.pqTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", m = 8, ksub = 16, topK = 5,
          train = train, kmeansIters = 2, opq = true)
        .presentBy(col("qid"), col("rank"))
    },
    // Frozen-codebook IVF-PQ append (the serving reality: codebooks train
    // once, shards append): build the persisted residual index on
    // ids < 400, append the rest under the FROZEN pivots + codebooks,
    // serve from the bucketed codes table. The pivot set (16 smallest
    // ids) and the train slice (< 64) are contained in the base, so
    // append-then-serve must equal q130's build-from-scratch on the
    // union corpus — the oracle IS q130's.
    "q137_ivfpq_append" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      graft.ext.Quantize.buildIvfPqIndex(e.filter(col("vec_id") < 400),
        "vec_id", "embedding", "graft_q137_ivfpq", nCells = 16,
        buckets = 8, m = 8, ksub = 16,
        train = e.filter(col("vec_id") < 64), kmeansIters = 2,
        residual = true)
      graft.ext.Quantize.appendToIvfPqIndex(s, "graft_q137_ivfpq",
        e.filter(col("vec_id") >= 400), "vec_id", "embedding")
      graft.ext.Quantize.ivfPqTopKIndexed(s, "graft_q137_ivfpq",
          e.filter(col("vec_id") < 10), "vec_id", "embedding", topK = 5,
          nProbe = 4)
        .presentBy(col("qid"), col("rank"))
    },
    // Johnson-Lindenstrauss two-stage ANN: deterministic ±1 sparse-sign
    // projection to 16 dims (the matrix is a FORMULA — the oracle
    // re-derives it), candidates by rounded projected L2, exact cosine
    // re-rank of the 4·topK survivors.
    "q139_jl_ann" -> ((s, dir) => {
      val e = read(s, dir, "embeddings")
      graft.ext.Reduce.jlTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", outDim = 16, topK = 5, rerank = 4)
        .presentBy(col("qid"), col("rank"))
    }),
    // PCA projection under a model trained from ONE exact covariance
    // aggregate (train slice < 200) and a deterministic driver-side
    // Jacobi eigensolve; the frozen mean + components replay through
    // OracleAux like q111's weights — the oracle recomputes every
    // projection value from the literals.
    "q140_pca_project" -> ((s, dir) => {
      val e = read(s, dir, "embeddings")
      val model = graft.ext.Reduce.pcaModel(
        e.filter(col("vec_id") < 200), "vec_id", "embedding", k = 8)
      OracleAux.write("q140_pca",
        model.mean.mkString(" ") +: model.components.map(_.mkString(" ")).toSeq)
      graft.ext.Reduce.pcaProject(e, "vec_id", "embedding", model)
        .withColumnRenamed("id", "vec_id")
        .presentBy(col("vec_id"), col("comp"))
    }),
    // Embedding-space drift report: both snapshots routed through the OLD
    // snapshot's frozen coarse geometry; per cell occupancy then/now +
    // the L2 shift of the cell mean — the rebuild trigger for persisted
    // vector indexes. Fixture: new snapshot drops every 7th vector, adds
    // ids >= 400, and shifts every 3rd vector by +0.05 per component.
    "q141_embedding_drift" -> ((s, dir) => {
      val e = read(s, dir, "embeddings")
      val oldSnap = e.filter(col("vec_id") < 400)
      val newSnap = e.filter(col("vec_id") % 7 =!= 0)
        .withColumn("embedding",
          when(col("vec_id") % 3 === 0,
            transform(col("embedding"),
              x => (x.cast("double") + lit(0.05)).cast("float")))
            .otherwise(col("embedding")))
      graft.ext.Audit.embeddingDrift(oldSnap, newSnap, "vec_id",
          "embedding", nCells = 16)
        .presentBy(col("cell"))
    }),
    // Bounded-state distinct-token audit: q122's `types` per source from a
    // 256-register deterministic HyperLogLog instead of a distinct-key
    // shuffle — the 100 TB cardinality path. Registers are md5-exact
    // integers, the harmonic sum is exactly representable (dyadic terms,
    // 42 < 53 mantissa bits), so the estimate replays bit-for-bit.
    "q142_hll_vocab" -> ((s, dir) =>
      graft.ext.Sketch.approxDistinctTokens(docsPar(s, dir), "text",
          "source", m = 256)
        .presentBy(col("source"))),
    // Tokenizer-fertility audit: per source, word/char volume + BOTH
    // trained tokenizer families' token counts (q91's frozen BPE merges,
    // a q144-style unigram model trained in-query and FROZEN) with
    // tokens-per-word / chars-per-token ratios -- the tokenizer-selection
    // report. Oracle composes the q91 merge-chain replay and the q144
    // recursive-CTE Viterbi under the frozen model, then re-derives every
    // aggregate and ratio.
    "q148_tokenizer_fertility" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val model = graft.ext.Unigram.unigramTrain(docs, "text",
        vocabSize = 64, maxPieceLen = 4, maxWords = 10000, iters = 2)
      OracleAux.write("q148_model", model.map { case (p, sc) => s"$sc $p" })
      graft.ext.Audit.tokenizerFertility(docs, "text", "source",
          q91Merges.map { case (a, b) => s"$a $b" }, model)
        .presentBy(col("source"))
    },
    // Pairwise inter-source vocabulary overlap by HLL inclusion-exclusion
    // -- q127's audit with m-bounded per-source state: est(A) + est(B) -
    // est(A UNION B) over register-wise-max union sketches. One token
    // pass; pair work is register-table joins.
    "q147_hll_source_overlap" -> ((s, dir) =>
      graft.ext.Sketch.hllPairwiseOverlap(docsPar(s, dir), "text",
          "source", m = 256)
        .presentBy(col("src_a"), col("src_b"))),
    // Heavy-hitter tokens by the two-pass count-min recipe: one bounded
    // d×w sketch pass + deterministic doc-sample candidates + broadcast
    // sketch lookup + skinny exact verification of the top k — q116's
    // answer without the distinct-key shuffle.
    "q143_cms_heavy_hitters" -> ((s, dir) =>
      graft.ext.Sketch.cmsHeavyHitters(docsPar(s, dir), "text", k = 20,
          d = 4, w = 1024, sampleFrac = 0.2)
        .presentBy(col("rank"))),
    // Per-source token-count quantiles (p50/p90/p99) from a log-linear
    // histogram sketch (HdrHistogram buckets, rel. error <= 2^-5): bounded
    // state however many documents flow. The sketch is built as a MERGE of
    // two doc_id-parity shard sketches, so the oracled path exercises the
    // exact merge algebra (bucket-count sum = sketch of the union).
    "q149_length_quantiles" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      def shard(p: DataFrame) = graft.ext.Sketch.logHistSketch(p,
        Seq("source"),
        size(graft.ext.TextStats.tokens(coalesce(col("text"), lit("")))),
        subBits = 5)
      graft.ext.Sketch.logHistQuantiles(
          graft.ext.Sketch.logHistMerge(
            shard(docs.filter(col("doc_id") % 2 === 0))
              .unionByName(shard(docs.filter(col("doc_id") % 2 =!= 0))),
            Seq("source")),
          Seq("source"), Seq(0.5, 0.9, 0.99))
        .presentBy(col("source"), col("q"))
    },
    // Length-outlier trim terminal: keep docs inside [p5, p95] of their
    // OWN source's token-count distribution, cutoffs from the bounded
    // log-histogram sketch (outer bucket edges) — two linear passes, the
    // cutoff table broadcast.
    "q152_length_trim" -> ((s, dir) =>
      graft.ext.Sketch.trimByLengthQuantiles(docsPar(s, dir), "text",
          "source", loQ = 0.05, hiQ = 0.95)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("lo_cut"), col("hi_cut"))
        .presentBy(col("doc_id"))),
    // Pairwise source token-set RESEMBLANCE (Jaccard) from bottom-k
    // sketches — q147's overlap audit restated as the ratio near-dup
    // scoping thresholds on, with k-bounded per-source state. The
    // distinct-shuffle is guarded by a per-source HLL threshold (~5k
    // expected survivors), never the full vocabulary.
    "q150_bottomk_resemblance" -> ((s, dir) =>
      graft.ext.Sketch.tokenResemblance(docsPar(s, dir), "text", "source",
          k = 256)
        .presentBy(col("src_a"), col("src_b"))),
    // Weighted exact-size sampling (Efraimidis-Spirakis A-ES): 5 docs per
    // source, weight = qualityPoints + 1 — the exact-k complement of
    // q87's per-row Bernoulli. md5 draws, 6-dp log keys, id tiebreak.
    "q155_weighted_sample" -> ((s, dir) =>
      graft.ext.Corpus.weightedSample(
          docsPar(s, dir).withColumn("weight",
            graft.ext.TextStats.qualityPoints(col("text")) + 1),
          "doc_id", "source", col("weight"), k = 5)
        .select(col("doc_id"), col("source"), col("weight"), col("ws_key"))
        .presentBy(col("doc_id"))),
    // BM25 top-k lexical retrieval (Robertson & Zaragoza 2009, Lucene's
    // non-negative idf): every 37th doc queries the whole corpus with its
    // own distinct tokens — the "more-like-this" decontamination probe.
    // One postings shuffle, query terms broadcast as the inverted-index
    // probe, df from the probed rows, per-term contributions floored onto
    // the 1e-6 grid so the per-pair score is an exact integer sum.
    "q156_bm25_topk" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      // maxDfFrac = 1.0: the fixture's vocabulary is CLOSED (31 words, 30
      // of them in >75% of documents), so the production stopword cap
      // (default 0.5) would prune every term and score nothing here; the
      // cap's pruning behavior is spec-pinned in ExtSpec instead
      Retrieval.bm25TopK(docs, docs.filter(col("doc_id") % 37 === 0),
          "doc_id", "text", "doc_id", "text", topK = 10, maxDfFrac = 1.0)
        .presentBy(col("qid"), col("rank"))
    },
    // BM25 served from the PERSISTED postings store: build on doc_id % 3
    // != 0, append the % 3 == 0 shard (a pure INSERT — new ids mean
    // disjoint postings rows, O(shard) not O(corpus)), then serve every
    // 41st doc as a query. The oracle replays BM25 over the UNION corpus,
    // so "append then serve" must be indistinguishable from a
    // from-scratch build (the q81/q137 store posture for text).
    "q157_bm25_indexed" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      if (bm25StoreFor.get != dir) {
        Retrieval.buildPostingsStore(
          docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text",
          "graft_q157")
        Retrieval.appendToPostingsStore(
          docs.filter(col("doc_id") % 3 === 0), "doc_id", "text",
          "graft_q157")
        bm25StoreFor.set(dir)
      }
      Retrieval.bm25Serve(s, "graft_q157",
          read(s, dir, "documents").filter(col("doc_id") % 41 === 0),
          "doc_id", "text", topK = 10, maxDfFrac = 1.0)
        .presentBy(col("qid"), col("rank"))
    },
    // Per-source quantile normalization of a quality signal (stop-word
    // ratio): q_norm = within-source CUME_DIST computed via the bounded
    // histogram-CDF (one (source, score6) aggregate + a window over THAT,
    // never a per-document window), kept = top half of each source by its
    // OWN distribution — the cross-source calibration step before any
    // global quality threshold.
    "q158_qnorm_by_source" -> { (s, dir) =>
      val scored = TextStats.analyze(docsPar(s, dir), "text")
      Corpus.quantileNormalizeScores(scored, "source",
          col("stop_ratio"), keepTopFrac = 0.5)
        .select(col("doc_id"), col("source"),
          round(col("stop_ratio"), 6).as("stop_r6"), col("q_norm"),
          col("kept"))
        .presentBy(col("doc_id"))
    },
    // Cluster-integral split: every doc gets the split of its >= 0.8-
    // Jaccard near-dup cluster representative (component min id), so a
    // near-dup group can never straddle train/test — the FIX for the leak
    // q125 audits. Singletons reduce to q53's plain hash split.
    "q160_leakfree_split" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      Corpus.leakFreeSplit(docs, "doc_id",
          Dedup.ngramJaccardPairs(docs, "doc_id", "text", minJaccard = 0.8))
        .select(col("doc_id"), col("cluster"), col("bucket"), col("split"))
        .presentBy(col("doc_id"))
    },
    // HTML extraction (the crawl front-end ahead of q96/q70): documents
    // wrapped in a deterministic page shell — title/style head, h1,
    // paragraph tags, an HTML comment, entity escapes, a script tail —
    // then extracted back; recovered = "Doc N <text> \"tail\" <x> &amp;".
    // Pure codegen regex chain, replayed verbatim by the oracle.
    "q162_html_extract" -> { (s, dir) =>
      val html = docsPar(s, dir).select(col("doc_id"),
        concat(lit("<html><head><title>d"), col("doc_id").cast("string"),
          lit("</title><style>p{color:red}</style></head><body><h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><!-- boilerplate --><p>"), col("text"),
          lit("</p><p>&quot;tail&quot; &lt;x&gt; &amp;amp;</p>" +
            "<script>var z = \"<p>not text</p>\";</script></body></html>"))
          .as("html"))
      html.select(col("doc_id"),
          Corpus.htmlToText(col("html")).as("extracted"))
        .withColumn("n_chars_out", length(col("extracted")))
        .presentBy(col("doc_id"))
    },
    // Soft dedup: near-dup clusters downweighted to unit mass (weight =
    // 1/n_copies) instead of dropped — the mixing-stage alternative to
    // q50's hard removal; same >= 0.8-Jaccard pair policy as q44/q160.
    "q163_softdedup_weights" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      Dedup.softDedupWeights(docs, "doc_id",
          Dedup.ngramJaccardPairs(docs, "doc_id", "text", minJaccard = 0.8))
        .select(col("doc_id"), col("cluster"), col("n_copies"), col("weight"))
        .presentBy(col("doc_id"))
    },
    // Training-shard export under the oracle (VERDICT r14 #4): writeShards
    // cuts a SORTED single partition into 64-row files, so shard contents
    // are fully determined — shard i holds sorted rows [64i, 64i+63] — and
    // DuckDB replays the whole manifest as a row_number()//64 grouping.
    // Checks BOTH manifest paths (parquet footer counts, JSONL line
    // counts) against the rows actually read back, per shard: manifest
    // `rows`, read-back `rows_read`, content min/max ids, and a positive
    // byte size. File names carry task UUIDs, so shards are keyed by their
    // name-sorted ordinal (single writer task → cNNN suffixes sort in row
    // order).
    "q164_write_shards" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val base = read(s, dir, "documents").select(col("doc_id"))
        .repartition(1).sortWithinPartitions(col("doc_id"))
      def side(format: String): DataFrame = {
        val path = Queries.scratchDir + s"/q164_$format"
        val manifest =
          graft.sources.IO.writeShards(base, path, 64, format = format)
        val back = (if (format == "json")
            s.read.schema("doc_id LONG").json(path)
          else s.read.parquet(path))
          .select(col("doc_id"),
            element_at(split(input_file_name(), "/"), -1).as("file"))
          .groupBy(col("file"))
          .agg(count(lit(1)).as("rows_read"), min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
        manifest.join(back, Seq("file"))
          .withColumn("shard_idx",
            (row_number().over(Window.orderBy(col("file"))) - 1).cast("long"))
          .select(lit(format).as("format"), col("shard_idx"), col("rows"),
            col("rows_read"), col("min_id"), col("max_id"),
            (col("bytes") > 0).as("bytes_pos"))
      }
      side("parquet").unionByName(side("json"))
        .presentBy(col("format"), col("shard_idx"))
    },
    // Host-graph PageRank (crawl prioritization): 3 damped power-iteration
    // rounds over a deterministic 40-host link graph synthesized from doc
    // ids. All-integer micro-rank arithmetic (div floors), so the oracle
    // unrolls the three rounds as exact BIGINT algebra.
    "q161_host_rank" -> { (s, dir) =>
      val edges = read(s, dir, "documents").select(
        concat(lit("h"), (col("doc_id") % 40).cast("string")).as("src"),
        concat(lit("h"), ((col("doc_id") * 7 + 3) % 40).cast("string")).as("dst"))
      Urls.hostRank(edges, iters = 3)
        .presentBy(col("host"))
    },
    // Hybrid retrieval: reciprocal-rank fusion (RRF, c = 60) of the BM25
    // top-20 over documents.text and the dense cosine top-20 over
    // embeddings for the same query ids — purely rank-based, so the two
    // scorers need no calibration against each other; fused cut at 10.
    "q159_hybrid_rrf" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val e = read(s, dir, "embeddings")
      val sparse = Retrieval.bm25TopK(docs,
          docs.filter(col("doc_id") % 53 === 0), "doc_id", "text",
          "doc_id", "text", topK = 20, maxDfFrac = 1.0)
        .select(col("qid"), col("doc_id"), col("rank"))
      val dense = Similarity.annTopK(e,
          e.filter(col("vec_id") % 53 === 0), "vec_id", "embedding",
          topK = 20)
        .select(col("qid"), col("neighbor_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(sparse, dense), topK = 10)
        .presentBy(col("qid"), col("rank"))
    },
    // Winnowing match report (Schleimer et al. 2003, the MOSS algorithm):
    // rightmost-minimum fingerprints at density 2/(w+1) with the
    // t = w+k-1 shared-substring guarantee — q72's posting lists at
    // fingerprint cost. Pairs sharing >= 2 distinct fingerprints.
    "q154_winnow_matches" -> ((s, dir) =>
      graft.ext.Spans.winnowMatches(docsPar(s, dir), "doc_id", "text",
          k = 4, w = 4, minShared = 2)
        .presentBy(col("id_a"), col("id_b"))),
    // Source-onboarding report: the incoming feed (src19) audited against
    // every held source FROM THE PERSISTED SKETCH STORES — HLL vocabulary
    // overlap, bottom-k Jaccard, length-quantile shift — without
    // rescanning the existing corpus. The query prices build+serve (the
    // q81/q137 posture); at steady state the stores are appended shards
    // and only the one-pass incoming probe runs.
    "q153_onboarding_report" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val existing = docs.filter(col("source") =!= "src19")
      val incoming = docs.filter(col("source") === "src19")
      // OPT r20: ONE tokenize pass feeds ALL THREE store builds — the
      // per-doc token ARRAYS are materialized (not the exploded tokens),
      // so the log-histogram store reads size(__t) off the same blocks
      // instead of re-tokenizing the whole existing corpus a second time;
      // hll/bottom-k explode lazily from the checkpoint.
      val docToks = existing.select(col("source"),
          graft.ext.TextStats.pinnedCol(graft.ext.TextStats.tokens(
            coalesce(col("text"), lit("")))).as("__t"))
        .localCheckpoint()
      val toks = docToks.select(col("source"), explode(col("__t")).as("tok"))
      graft.ext.Sketch.writeSketchStore(
        graft.ext.Sketch.hllSketch(toks, Seq("source"), col("tok")),
        "fb_onboard_hll", "hll",
        Map("m" -> "256", "salt" -> "graft:hll"), Seq("source"))
      graft.ext.Sketch.writeSketchStore(
        graft.ext.Sketch.bottomKSketch(toks, Seq("source"), col("tok"), 256),
        "fb_onboard_bk", "bottomk",
        Map("k" -> "256", "salt" -> "graft:bk"), Seq("source"))
      graft.ext.Sketch.writeSketchStore(
        graft.ext.Sketch.logHistSketch(docToks, Seq("source"),
          size(col("__t")), subBits = 5),
        "fb_onboard_lh", "loghist", Map("subBits" -> "5"), Seq("source"))
      graft.ext.Sketch.onboardingReport(s, "fb_onboard_hll", "fb_onboard_bk",
          "fb_onboard_lh", incoming, "text")
        .presentBy(col("source"))
    },
    // Moore-Lewis cross-entropy difference selection: nll under the
    // in-domain model (English docs of src0-src3) minus nll under the
    // general model (whole corpus); keep the lowest 25% — the classic
    // in-domain selection the plain perplexity filter (q90) can't express.
    // Same histogram-CDF cut + boundary tie-fill as q94 (equivalent to
    // rank by (ml_score ASC, doc_id) <= ceil(0.25 n_scored), which is what
    // the oracle replays as one window).
    "q151_crossentropy_select" -> ((s, dir) => {
      val docs = docsPar(s, dir)
      graft.ext.Perplexity.crossEntropySelect(docs, "doc_id", "text",
          inDomain = docs.filter(col("lang") === "en" &&
            col("source").isin("src0", "src1", "src2", "src3")),
          general = docs, keepFrac = 0.25)
        .select(col("doc_id"), col("lang"), col("ml_grams"), col("nll_in"),
          col("nll_gen"), col("ml_score"), col("selected"))
        .presentBy(col("doc_id"))
    }),
    // The COMPOSED crawl pipeline (RefinedWeb order): URL dedup → URL
    // rules → C4 → Gopher → exact → MinHash near-dup → semantic, one
    // fate per input doc. Fixture synthesis (mirrored in the oracle):
    //  - URLs: q134's page identity (doc_id % 200 over 4 hosts) with
    //    canonical-rule decorations; host example3.com is blocklisted so
    //    the rules stage bites.
    //  - text: token lines of 8 ending in '.', a stop-word-bearing
    //    closing sentence (the Gopher stop gate needs >= 2 hits), and a
    //    'lorem ipsum' tail keyed on the CONTENT hash (md5 % 13) so
    //    exact-duplicate partners decorate identically and the dup
    //    structure survives into the dedup stages while C4's page gate
    //    still bites.
    //  - embeddings: vec_id = doc_id % 250, rows >= 250 perturbed by the
    //    plantNearDups LCG at scale 0.01 — textual strangers with
    //    cos ≈ 0.999 twins, realizing the semantic fate.
    "q138_crawl_pipeline" -> { (s, dir) =>
      val docs = read(s, dir, "documents")
      val emb = read(s, dir, "embeddings")
      // corpus-proportional fixture constants (identical to the fixed
      // 200/250 at the sf0.01 gate, but the URL-survivor set and the
      // semantic-twin groups keep growing linearly with the corpus so the
      // slope run prices every stage): 40% of docs are distinct pages,
      // embedding identity repeats at half the corpus
      val nDocs = docs.count()
      val nPages = math.max(2L * nDocs / 5L, 1L)
      // capped by the embeddings table so every doc resolves a vector
      // (sf0.1 ships fewer embeddings than documents)
      val embK = math.max(math.min(nDocs / 2L, emb.count()), 1L)
      val url = concat(
        lit("http"), when(col("doc_id") % 2 === 0, "s").otherwise(""),
        lit("://"), when(col("doc_id") % 3 === 0, "www.").otherwise(""),
        lit("example"), ((col("doc_id") % nPages) % 4).cast("string"),
        lit(".com/page/"), (col("doc_id") % nPages).cast("string"),
        when(col("doc_id") % 5 === 0, "/").otherwise(""),
        when(col("doc_id") % 7 === 0, "?utm_source=feed").otherwise(""),
        when(col("doc_id") % 11 === 0, "#frag").otherwise(""))
      val toks = graft.ext.TextStats.tokens(coalesce(col("text"), lit("")))
      val lines = graft.ext.TextStats.bound(toks) { t =>
        transform(sequence(lit(0), greatest(ceil(size(t) / 8.0).cast("int"),
            lit(1)) - 1),
          i => concat(array_join(slice(t, i * 8 + 1, lit(8)), " "), lit(".")))
      }
      val body = concat(array_join(lines, "\n"),
        lit("\nthat is all we have with the data."),
        when(conv(substring(md5(coalesce(col("text"), lit(""))), 1, 8), 16, 10)
            .cast("long") % 13 === 0,
          "\nlorem ipsum boilerplate tail.").otherwise(""))
      val pert = zip_with(col("embedding"),
        sequence(lit(0), size(col("embedding")) - 1),
        (x, d) => (x.cast("double") +
          lit(0.01) * ((col("doc_id") * 131L + d * 7919L) % 1000003L *
            2654435761L % 2000003L - 1000001L).cast("double") / 1000001.0
        ).cast("float"))
      val fixture = docs
        .select(col("doc_id"), col("n_chars"), url.as("url"),
          body.as("text2"))
        .join(emb.groupBy((col("vec_id") % embK).as("__vk"))
            .agg(min(struct(col("vec_id").as("v"), col("embedding").as("e")))
              .as("__b"))
            .select(col("__vk"), col("__b.e").as("embedding")),
          col("doc_id") % embK === col("__vk"))
        .select(col("doc_id"), col("n_chars"), col("url"), col("text2"),
          when(col("doc_id") < embK, col("embedding")).otherwise(pert)
            .as("emb"))
        .repartition(s.sparkContext.defaultParallelism)
      graft.ext.Crawl.refinedWebFate(fixture, "doc_id", "url", "text2",
          "n_chars", "emb", blockedDomains = Seq("example3.com"))
        .presentBy(col("doc_id"))
    },
    // URL-level dedup (the RefinedWeb first pass): synthesized URLs where
    // the host+path identity is the PAGE (doc_id % 200) and per-doc
    // decorations cover every canonical rule — scheme s/no-s, www, a
    // trailing slash, tracking params in first-param position, fragments.
    // Keep-best by n_chars per canonical key.
    "q134_url_dedup" -> { (s, dir) =>
      val docs = read(s, dir, "documents")
      val page = (col("doc_id") % 200).cast("string")
      val url = concat(
        lit("http"), when(col("doc_id") % 2 === 0, lit("s")).otherwise(lit("")),
        lit("://"), when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
        lit("example"), ((col("doc_id") % 200) % 4).cast("string"),
        lit(".com/page/"), page,
        when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit("?utm_source=feed&utm_campaign=x"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 1, lit("?id=9&gclid=abc")).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit("#frag")).otherwise(lit("")))
      graft.ext.Urls.dedupByUrl(docs.withColumn("url", url),
          "doc_id", "url", scoreCol = "n_chars")
        .select(col("doc_id"), col("url_canon"), col("n_url_copies"))
        .presentBy(col("doc_id"))
    },
    // Near-dup source matrix: q34's pair graph bucketed by the unordered
    // source pair — within-source boilerplate vs cross-source overlap.
    // Same recall-1 regime as q34 (cap provably inactive at sf<=0.01).
    "q133_dup_source_matrix" -> ((s, dir) =>
      graft.ext.Audit.nearDupSourceMatrix(docsPar(s, dir), "doc_id", "text",
          "source", minJaccard = 0.8)
        .presentBy(col("source1"), col("source2"))),
    // Duplication-structure histogram over a corpus with BOTH duplication
    // modes realized (fixture has no exact dups): every 10th doc gets an
    // exact copy, every 7th an appended-marker near-dup; exact groups
    // collapse first, near-dup CC clusters weight by group size. The
    // oracle replays fingerprint groups + q44's recursive closure over the
    // representatives + the weighted histogram.
    "q132_dup_histogram" -> { (s, dir) =>
      val docs = docsPar(s, dir).select(col("doc_id"), col("text"))
      val corpus = docs
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat(col("text"), lit(" near dup tail")).as("text")))
      graft.ext.Audit.dupClusterHistogram(corpus, "doc_id", "text")
        .presentBy(col("cluster_size"))
    },
    // Semantic corpus atlas: IVF cells over the embedding space, each
    // described by exact per-cell stats + its most DISCRIMINATIVE terms
    // (cell df × corpus idf) — the corpus-cartography report read before
    // deciding mixtures/filters. Fully replayable: smallest-id pivots,
    // 6-dp cosine assignment, integer tallies, q98's idf discipline.
    "q131_semantic_atlas" -> ((s, dir) =>
      graft.ext.Audit.semanticAtlas(
          read(s, dir, "documents"), read(s, dir, "embeddings"),
          "doc_id", "text", "vec_id", "embedding", nCells = 16, topTerms = 5)
        .presentBy(col("cell"), col("rank"))),
    // Quality-aware corpus dedup terminal: q51's exact→LSH→CC pipeline
    // with keep-BEST representatives (n_chars score, id tiebreak) at both
    // the exact and the cluster stage, instead of first-wins.
    "q113_dedup_keep_best_corpus" -> ((s, dir) =>
      Dedup.dedupCorpusKeepBest(docsPar(s, dir), "doc_id", "text", "n_chars")
        .select(col("doc_id"))
        .presentBy(col("doc_id"))),
    // Binary quantization ANN: one bit per dimension (above/below the
    // corpus mean, integer micro-unit cross-multiplied — no division),
    // packed 32 bits/word; Hamming ranks 20 candidates per query, exact
    // cosine re-ranks the top 5. The 32× compression rung below PQ.
    "q112_binary_ann" -> { (s, dir) =>
      val e = read(s, dir, "embeddings")
      graft.ext.Quantize.binaryTopK(e, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", topK = 5, rerank = 4)
        .presentBy(col("qid"), col("rank"))
    },
    // Embedding-norm hygiene: drop the 10% lowest- and 10% highest-norm
    // value blocks via the histogram-CDF pattern (q94/q95) — the pre-index
    // screen for degenerate and outlier vectors. No global corpus rank.
    // The driver embeddings are unit-normalized, so the fixture scales each
    // vector by 1 + (id%20)/10 to realize 20 distinct norm blocks — the
    // operator itself sees an ordinary raw-embedding column.
    "q114_norm_filter" -> ((s, dir) => {
      val scaled = read(s, dir, "embeddings").withColumn("embedding",
        transform(col("embedding"), x => x.cast("double") *
          (lit(1.0) + (col("vec_id") % 20).cast("double") / 10.0)))
      Similarity.filterByNormBand(scaled, "vec_id", "embedding",
          dropLowFrac = 0.1, dropHighFrac = 0.1)
        .select(col("vec_id"), col("vec_norm"))
        .presentBy(col("vec_id"))
    }),
    // Per-source token-length histogram: the length-distribution audit
    // behind truncation/mixture decisions — one groupBy scan, exact
    // integer counts and sums, histogram-sized output.
    "q115_length_histogram" -> ((s, dir) =>
      graft.ext.Audit.lengthHistogram(read(s, dir, "documents"),
          "text", "source", bucketWidth = 20)
        .presentBy(col("source"), col("len_bucket"))),
    // Corpus-wide most-frequent trigrams: the boilerplate radar behind
    // stop-gram lists and repeated-passage analysis. Two map-side-combined
    // shuffles (per-doc gram counts, then gram totals), TakeOrdered top-K.
    "q116_top_ngrams" -> ((s, dir) =>
      graft.ext.Audit.topNgrams(docsPar(s, dir), "doc_id", "text",
          n = 3, topK = 50, minDocFreq = 2)
        .presentBy(col("rank"))),
    // Epoch-repeat mixture: src0 upsampled 2.5x, src1 dropped, src2 kept at
    // 0.25, everything else 1 epoch. Zero-shuffle generator; copy counts
    // are exact-integer floors plus a deterministic md5-bucket draw.
    "q118_repeat_mixture" -> ((s, dir) =>
      Corpus.repeatMixture(read(s, dir, "documents"), "doc_id", "source",
          factors = Map("src0" -> 2.5, "src1" -> 0.0, "src2" -> 0.25),
          default = 1.0)
        .select(col("doc_id"), col("source"), col("copy_idx"))
        .presentBy(col("doc_id"), col("copy_idx"))),
    // Incremental audio dedup vs a frozen media corpus: arrivals are 100
    // byte-identical re-uploads (same synthetic PCM, new ids — fingerprint
    // distance 0) + 50 genuinely new clips (kept unless their energy
    // contour lands within Hamming 1 of some catalog clip — the oracle
    // decides exactly). Signature-table-in incremental Hamming (Bloom +
    // pigeonhole confirm) over the REAL WAV decode.
    "q129_incremental_audio_dedup" -> { (s, dir) =>
      import s.implicits._
      val docs = docsPar(s, dir)
      val seen = Multimodal.audioFingerprints(
          Multimodal.syntheticAudio(docs, "doc_id"))
        .toDF().select(col("id"), col("afp").as("sig"))
      val arrivalIds = docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 5000).as("id"), col("doc_id").as("src"))
        .unionByName(docs.filter(col("doc_id").between(100, 149))
          .select((col("doc_id") + 5000).as("id"),
            (col("doc_id") + 1000000).as("src")))
      val arrMedia = arrivalIds.as[(Long, Long)].map { case (aid, src) =>
        Multimodal.MediaRow(aid,
          Multimodal.syntheticWav(src, (1000 + src % 500).toInt))
      }
      val arrSigs = Multimodal.audioFingerprints(arrMedia)
        .toDF().select(col("id"), col("afp").as("sig"))
      Dedup.incrementalHamming(arrSigs, seen, maxDist = 1)
        .select(col("id").as("doc_id"))
        .presentBy(col("doc_id"))
    },
    // WET-style HTML text extraction over synthesized pages (fixture has
    // no HTML column): script/style/comment blocks dropped, tags stripped,
    // entities decoded, whitespace collapsed — a pure codegen chain the
    // oracle replays with the identical RE2-safe regexes.
    "q128_html_extract" -> { (s, dir) =>
      val page = concat(
        lit("<html><head><title>t</title><style>body{color:red}</style>"),
        lit("<script>var x = '<p>';</script></head><body><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1>\n<p>"), col("text"),
        lit("</p><!-- nav --><div>footer &amp; &lt;links&gt;</div></body></html>"))
      read(s, dir, "documents")
        .select(col("doc_id"),
          TextStats.extractHtmlText(page).as("clean_text"))
        .presentBy(col("doc_id"))
    },
    // Inter-source overlap matrix: cross-corpus duplication audit for
    // mixture design. Gram-keyed self-join bounded by source cardinality
    // per gram; post-join partial agg collapses to source² rows.
    "q127_source_overlap" -> ((s, dir) =>
      graft.ext.Audit.sourceOverlapMatrix(docsPar(s, dir), "text", "source",
          k = 8)
        .presentBy(col("source1"), col("source2"))),
    // Clip-level perceptual hash over the REAL multi-frame decode:
    // synthetic GIFs → composited frames → per-frame dHash → per-bit
    // majority fold. The oracle replays frames, grid, bits and the
    // majority analytically from the q68 pixel formula.
    "q126_video_dhash" -> ((s, dir) =>
      Multimodal.videoDHash(
          Multimodal.syntheticVideos(docsPar(s, dir), "doc_id"))
        .toDF()
        .select(col("id").as("doc_id"), col("n_frames"),
          col("sig_hi"), col("sig_lo"))
        .presentBy(col("doc_id"))),
    // Split-leakage integrity check: near-dup pairs straddling the
    // train/val/test boundary — the leak a per-document hash split cannot
    // prevent. Near-dup machinery's shape + two label joins.
    "q125_split_leak" -> ((s, dir) =>
      Corpus.splitLeakReport(docsPar(s, dir), "doc_id", "text")
        .presentBy(col("id1"), col("id2"))),
    // Per-document novelty (memorization-risk audit): fraction of a doc's
    // distinct 8-shingles appearing in no other document. Inverted-index
    // shape: postings → gram doc-freq → one gram equi-join → per-doc rollup.
    "q124_novelty_score" -> ((s, dir) =>
      graft.ext.Audit.noveltyScore(docsPar(s, dir), "doc_id", "text", k = 8)
        .presentBy(col("doc_id"))),
    // BPE TRAINING end-to-end: induce 20 merges from the corpus itself
    // (distributed word-count table + bounded driver merge loop), then
    // tokenize the corpus with them. The learned merges are FROZEN through
    // OracleAux and the DuckDB oracle both REPLAYS the tokenization with
    // them (q91's replace-chain machinery) and INDUCTIVELY re-derives the
    // training itself: for every rank k it recomputes the word table, applies
    // merges 1..k-1, recounts weighted symbol pairs, and checks the argmax
    // equals merge k — a full cross-engine verification of the merge loop,
    // gating the output rows (see dynamicOracle). The loop is additionally
    // pinned against a hand-computed fixture in ExtSpec.
    "q123_bpe_train" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val (m, v) = TextStats.bpeTrain(docs, "text",
        numMerges = TrainNumMerges, maxWords = TrainMaxWords)
      OracleAux.write("q123_merges", m)
      TextStats.bpeStats(docs, "text", m, v)
        .select(col("doc_id"), col("bpe_count"),
          array_join(col("bpe_tokens"), "\u001f").as("bpe_str"))
        .presentBy(col("doc_id"))
    },
    // UNIGRAM-LM tokenizer (Kudo 2018) end-to-end: train piece scores on
    // the corpus (capped word table + driver EM, the q123 posture), FREEZE
    // the model through OracleAux, Viterbi-encode every document with the
    // distributed encoder. The oracle replays the ENCODE under the frozen
    // integer scores with a recursive-CTE DP -- identical tie-breaks -- so
    // a single deviated segmentation anywhere in the corpus fails the
    // row compare.
    "q144_unigram_tokenize" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val model = graft.ext.Unigram.unigramTrain(docs, "text",
        vocabSize = 64, maxPieceLen = 4, maxWords = 10000, iters = 2)
      OracleAux.write("q144_model", model.map { case (p, sc) => s"$sc $p" })
      graft.ext.Unigram.unigramEncode(docs, "doc_id", "text", model,
        maxPieceLen = 4)
    },
    // FUZZY benchmark decontamination: eval items paraphrased into the
    // corpus share almost no exact 8-gram but sit at high shingle Jaccard.
    // Fixture: every 10th doc spawns a bench item -- lightly edited
    // (appended token, a near-dup the exact checks under-count) for
    // doc_id % 20 == 0, token-reversed (clean) otherwise. Banded MinHash
    // candidates + exact-Jaccard confirm; the oracle replays ground-truth
    // all-pairs Jaccard, so an LSH miss fails the row compare (recall-1
    // contract at J >= 0.8, the q119 settings).
    "q145_fuzzy_contamination" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val toks = TextStats.tokens(col("text"))
      val bench = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 5000).as("bench_id"),
          when(col("doc_id") % 20 === 0,
            concat(col("text"), lit(" "), toks.getItem(0)))
            .otherwise(concat_ws(" ", reverse(toks))).as("bench_text"))
      Corpus.contaminationNear(docs, bench, "doc_id", "text",
          "bench_id", "bench_text", minJaccard = 0.8)
        .withColumnRenamed("id", "doc_id")
        .presentBy(col("doc_id"), col("bench_id"))
    },
    // Per-source vocabulary health: exact type/token/hapax tallies and the
    // Zipf head. Two map-side-combined shuffles, vocabulary-sized output.
    "q122_vocab_report" -> ((s, dir) =>
      graft.ext.Audit.vocabularyReport(docsPar(s, dir), "text", "source")
        .presentBy(col("source"))),
    // Acoustic fingerprinting over the REAL audio decode: synthetic PCM16
    // WAVs → direct RIFF parse → 65-frame energy contour → 64-bit
    // signature. The oracle replays samples, framing, energies and bit
    // packing analytically from the fixture formula.
    "q121_audio_fingerprint" -> ((s, dir) =>
      Multimodal.audioFingerprints(
          Multimodal.syntheticAudio(docsPar(s, dir), "doc_id"))
        .toDF()
        .select(col("id").as("doc_id"), col("sig_hi"), col("sig_lo"))
        .presentBy(col("doc_id"))),
    // Perceptual image hashing over the REAL decode path: synthetic PNGs →
    // ImageIO decode → 9×8 nearest-grid dHash. The oracle recomputes every
    // sampled pixel analytically (q61's losslessness argument), so a
    // decoder or sampling deviation breaks the hash. Signature halves
    // emitted as unsigned 32-bit BIGINTs.
    "q120_image_dhash" -> ((s, dir) =>
      Multimodal.imageDHash(
          Multimodal.syntheticImages(docsPar(s, dir), "doc_id"))
        .toDF()
        .select(col("id").as("doc_id"), col("sig_hi"), col("sig_lo"))
        .presentBy(col("doc_id"))),
    // Incremental MinHash near-dup vs the frozen corpus: arrivals are 100
    // appended-token near-dups (Jaccard ≈ (n-3)/(n-2), high) + 50
    // token-reversed rewrites (shingle sets ≈ disjoint). Probe-confirm:
    // seen band keys → Bloom → band equi-join → exact candidate Jaccard;
    // the oracle replays exact Jaccard over every new×seen pair.
    "q119_incremental_minhash" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val toks = TextStats.tokens(col("text"))
      val arrivals = docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 2000).as("doc_id"),
          concat(col("text"), lit(" "), toks.getItem(0)).as("text"))
        .unionByName(docs.filter(col("doc_id").between(100, 149))
          .select((col("doc_id") + 2000).as("doc_id"),
            concat_ws(" ", reverse(toks)).as("text")))
      Dedup.incrementalMinhash(arrivals, docs, "doc_id", "text",
          minJaccard = 0.8)
        .select(col("doc_id"))
        .presentBy(col("doc_id"))
    },
    // Per-registrable-domain corpus report over q86's synthesized URLs:
    // the blocklist-candidate audit (flag = high dup rate OR low mean
    // quality). One groupBy(domain) scan; domain-cardinality output.
    "q117_domain_report" -> { (s, dir) =>
      val suffix = expr("case cast(doc_id % 7 as int) when 0 then 'co.uk' " +
        "when 1 then 'com' when 2 then 'org' when 3 then 'net' " +
        "when 4 then 'io' when 5 then 'com.au' else 'de' end")
      val url = concat(
        lit("http"), when(col("doc_id") % 2 === 0, "s").otherwise(""),
        lit("://"), when(col("doc_id") % 3 === 0, "www.").otherwise(""),
        col("source"), lit("."), suffix, lit("/d/"),
        ((col("doc_id") * 37) % 1000).cast("string"))
      Urls.domainReport(
          read(s, dir, "documents").select(col("doc_id"), col("text"), url.as("url")),
          "url", "text", shortTokens = 30, maxDupRate = 0.05,
          minAvgQuality = 5.0)
        .presentBy(col("domain"))
    },
    // Per-source corpus audit in one scan: volume, exact-distinct dup
    // rate, short-doc and integer-quality tallies — the before/after
    // report of every curation stage.
    "q101_corpus_report" -> ((s, dir) =>
      graft.ext.Audit.corpusReport(read(s, dir, "documents"), "text", "source")
        .presentBy(col("source"))),
    // Unicode normalization ahead of dedup (UAX #15): canonically
    // equivalent strings with different code-point sequences (NFC "é" vs
    // NFD "e"+COMBINING ACUTE) hash differently and defeat every
    // fingerprint-based dedup stage. The fixture corpus is ASCII, so the
    // query PLANTS the hazard — each doc spawns an NFC twin (… "café")
    // and an NFD twin (… "cafe"+U+0301): raw fingerprints must differ,
    // normalized fingerprints must collapse, and the oracle recomputes
    // BOTH through DuckDB's independent nfc_normalize implementation.
    "q166_nfc_dedup" -> { (s, dir) =>
      graft.funcs.TextFunctions.register(s)
      val d = docsPar(s, dir).select(col("doc_id"), col("text"))
      val twins = d.select((col("doc_id") * 2).as("doc_id"),
          concat(col("text"), lit(" caf\u00e9")).as("text"))
        .unionByName(d.select((col("doc_id") * 2 + 1).as("doc_id"),
          concat(col("text"), lit(" cafe\u0301")).as("text")))
      twins.select(col("doc_id"),
          md5(col("text")).as("fp_raw"),
          md5(graft.funcs.TextFunctions.unicodeNormalize(col("text")))
            .as("fp_nfc"))
        .presentBy(col("doc_id"))
    },
    // SymSpell deletion-neighborhood typo pairs over a SHORT field: the
    // near-dup regime shingles/SimHash can't serve (one typo in a 20-char
    // title destroys most 4-grams; its delete-variant key matches
    // exactly, recall 1.0 by invariant, confirmed by the exact DP
    // distance). Titles are salted with the doc id so the only planted
    // structure is the per-doc deletion twin and substitution twin; the
    // oracle replays variants, frequency cap, candidate join and
    // levenshtein confirm verbatim.
    // BYTE-LEVEL BPE under the oracle (VERDICT r15 #4): the production
    // GPT-2 discipline — pre-tokenize with the lookahead pattern, remap
    // each pre-token's UTF-8 bytes into the published bytes→unicode
    // stand-in alphabet, merge with a well-formed byte-level table, ids
    // from the vocab — replayed INDEPENDENTLY by DuckDB (hex-decoded byte
    // remap, rank-order replace loop, RS-split lookahead emulation). The
    // synthesized prefix/suffix plant every path the corpus text lacks:
    // capitalized word, multi-byte é, contraction 's, a 3-space run (the
    // \s+(?!\S) split + the ĠĠ whitespace merge), an interior newline
    // (Ċ), and a trailing whitespace run. The planted text NORMALIZES
    // non-RE2 whitespace to ' ' on BOTH sides (the same class literal in
    // the oracle's base CTE): the engine's pre-tokenizer classifies \s
    // with UNICODE_CHARACTER_CLASS (the reference discipline —
    // BpeExpressions preTok), the oracle replay runs under RE2's
    // ASCII-only \s, and the two classes differ exactly on
    // [\x0B U+0085 U+00A0 U+1680 U+2000-200A U+2028 U+2029 U+202F
    // U+205F U+3000] — so the replayed split is provable only over the
    // shared ASCII whitespace set, which the normalization pins.
    "q170_byte_bpe" -> ((s, dir) =>
      TextStats.bpeStats(
          docsPar(s, dir).select(col("doc_id"),
            concat(lit("The r\u00e9sum\u00e9, it's here   and "),
              regexp_replace(coalesce(col("text"), lit("")),
                NonRe2WhitespaceJava, " "),
              lit("\n the end  ")).as("text2")),
          "text2", q170Merges.map { case (a, b) => s"$a $b" }, q170Vocab,
          byteLevel = true)
        .select(col("doc_id"), col("bpe_count"),
          array_join(col("bpe_tokens"), "\u001f").as("bpe_str"),
          array_join(transform(col("bpe_ids"), _.cast("string")), " ")
            .as("bpe_ids_str"))
        .presentBy(col("doc_id"))),
    // WORDPIECE tokenization (BERT, Devlin et al. 2019) under the oracle:
    // greedy longest-match-first with ## continuations, whole-word [UNK]
    // on any unmatched position, uncased lowercase, per-char punctuation
    // split. DuckDB replays the greedy loop INDEPENDENTLY as a recursive
    // CTE over the distinct-word table (cursor state machine: longest
    // matching vocabulary piece per step via list_filter + list_reduce).
    // The planted suffix exercises greedy-beats-composition ("the" whole,
    // not th+##e), multi-piece words, digits, punctuation splits,
    // contractions, and a guaranteed-[UNK] word (ø has no vocab entry).
    // TOKENIZE-AND-PACK terminal: WordPiece tokens (q172's fixed vocab,
    // no planted suffix) concatenated in doc_id order and cut every 512
    // tokens — one row per training sequence, documents spanning chunk
    // boundaries, plus the per-chunk document-boundary spans
    // (doc_id:off:len per segment — the attention/loss-mask metadata
    // packed-sequence trainers require). The oracle replays the greedy
    // tokenization AND the packing AND the spans AND the per-doc-restart
    // position_ids from one global token rank over (doc_id, position):
    // chunk = rn//512, per-(chunk, doc) offset = min(rn) % 512, length =
    // count, position = rn − min(rn) over (chunk, doc) — a boundary off
    // by one token anywhere in the corpus shifts every later chunk and
    // fails the hash.
    // FILL-IN-THE-MIDDLE training prep (Bavarian et al. 2022): a
    // deterministic half of the corpus is re-serialized for infilling in
    // BOTH published orderings (PSM and suffix-first SPM) with
    // StarCoder-style sentinels; gate and cut points are md5 draws, so
    // DuckDB replays the exact transform — gate/cuts from the same hex
    // arithmetic, three substrs, sentinel concat. The two modes share
    // one gate and one (lo, hi) pair, so psm/spm must contain the SAME
    // pieces; any drift in the draw, the split arithmetic, or the
    // serialization order fails the hash.
    // T5 SPAN CORRUPTION (Raffel et al. 2020): one md5-placed span per
    // full 20-token window masked behind an ordinal sentinel; corrupted
    // input + sentinel-delimited targets emitted as the training pair.
    // The oracle replays the hex draw, every slice boundary, the
    // sentinel ordinals and the final closing sentinel — an off-by-one
    // in any window of any document fails the hash.
    // MP3 METADATA over the frame-header walker: one synthetic MPEG-1
    // Layer III clip per document (1 + id%4 frames, bitrate cycling
    // 128/192/256 by (id+i)%3 — every header field is id-arithmetic), so
    // DuckDB replays frame count, duration and average bitrate with no
    // codec on its side. Parse runs on the executors per row — the stub
    // path's shape with a real header walk in the decode slot; the
    // 1-frame clips pin the CBR (vbr = false) branch.
    "q179_mp3_meta" -> { (s, dir) =>
      import s.implicits._
      val media = docsPar(s, dir).select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map(id => Multimodal.MediaRow(id,
          Multimodal.syntheticMp3(id, (1 + id % 4).toInt))))
      Multimodal.mp3Meta(media).toDF()
        .select(col("id").as("doc_id"), col("sample_rate"), col("channels"),
          col("n_frames"), col("duration_ms"), col("avg_kbps"), col("vbr"))
        .presentBy(col("doc_id"))
    },
    // JPEG METADATA over the marker walker: one synthetic JPEG per
    // document — width/height/component-count/progressive are all
    // id-arithmetic while DQT/DHT/entropy payloads are noise, so DuckDB
    // replays every header field with no codec on its side (the q179
    // posture for images). Even ids are baseline SOF0, odd progressive
    // SOF2; the marker structure is the fixed 5 length-carrying
    // segments. Parse runs per row on the executors — the stub path's
    // shape with a real marker walk in the decode slot.
    "q200_jpeg_meta" -> { (s, dir) =>
      import s.implicits._
      val media = docsPar(s, dir).select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map(id => Multimodal.MediaRow(id,
          Multimodal.syntheticJpeg(id))))
      Multimodal.jpegMeta(media).toDF()
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("precision"), col("n_components"), col("progressive"),
          col("n_segments"))
        .presentBy(col("doc_id"))
    },
    // PRETRAINING-PIPELINE CAPSTONE (VERDICT r18 #2): the FULL path raw
    // docs → quality gates → quality-aware dedup → mixture → tokenize →
    // pack → shard as ONE oracled terminal, one materialization per
    // stage. Fixture: q138-style token-line bodies (lorem tail on
    // doc_id % 13), q184Templates planted as exact-dup groups (% 9 == 0)
    // and near-dup variants (% 9 == 1), page-identity URLs with the
    // example3.com blocklist slice, embeddings joined by doc_id % embK.
    // refinedWebFate runs ALL SEVEN stages; the capstone keeps every doc
    // that REACHED the dedup stages (fate ∈ kept/exact/neardup/semantic
    // — i.e. the gopher survivor set) and delegates dedup to the
    // quality-aware dedupCorpusKeepBest (n_chars winners, not min-id),
    // then temperature-mixes by lang, WordPiece-tokenizes, packs 512-token
    // chunks and ships 8-chunk shards with a verified manifest. The
    // oracle replays EVERY stage: URL keep-best + blocklist, C4 line/page
    // rules, all seven Gopher gates, fingerprint + exact-Jaccard-closure
    // keep-best dedup, the sqrt-weight mixture cut, the greedy WordPiece
    // walk, the global pack rank, and the per-shard manifest counts —
    // a drift anywhere in the chain fails the per-chunk hash.
    "q184_pretrain_e2e" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = read(s, dir, "documents")
      val emb = read(s, dir, "embeddings")
      val nDocs = docs.count()
      val np = math.max(2L * nDocs / 5L, 1L)
      val embK = math.max(math.min(nDocs / 2L, emb.count()), 1L)
      val toks = TextStats.tokens(coalesce(col("text"), lit("")))
      val lines = TextStats.bound(toks) { t =>
        transform(sequence(lit(0), greatest(ceil(size(t) / 8.0).cast("int"),
            lit(1)) - 1),
          i => concat(array_join(slice(t, i * 8 + 1, lit(8)), " "), lit(".")))
      }
      val ownBody = concat(array_join(lines, "\n"),
        lit("\nthat is all we have with the data."),
        when(col("doc_id") % 13 === 0, "\nlorem ipsum boilerplate tail.")
          .otherwise(""))
      val tmpl = element_at(array(q184Templates.map(lit): _*),
        (col("doc_id") % 4).cast("int") + 1)
      val body = when(col("doc_id") % 9 === 0, tmpl)
        .when(col("doc_id") % 9 === 1, concat(tmpl, lit("\n" + q184Variant)))
        .otherwise(ownBody)
      val url = concat(lit("http://example"),
        ((col("doc_id") % np) % 4).cast("string"),
        lit(".com/page/"), (col("doc_id") % np).cast("string"))
      val fixture = docs
        .select(col("doc_id"), col("n_chars"), col("lang"), url.as("url"),
          body.as("text2"))
        .join(emb.filter(col("vec_id") < embK)
          .select(col("vec_id"), col("embedding")),
          col("doc_id") % embK === col("vec_id"))
        .drop("vec_id")
        .repartition(s.sparkContext.defaultParallelism)
        .localCheckpoint()
      // OPT r20: the fixture is already localCheckpointed two lines up —
      // materializeInput = false spares refinedWebFate's second full
      // corpus+embedding copy (its stage chain reads the fixture blocks)
      val fate = graft.ext.Crawl.refinedWebFate(fixture, "doc_id", "url",
        "text2", "n_chars", "embedding", blockedDomains = Seq("example3.com"),
        materializeInput = false)
      // stage 1 (clean): the quality gates from the fate report — every
      // document that reached the dedup stages passed url+c4+gopher
      val quality = fixture
        .join(fate.filter(col("fate").isin("kept", "exact", "neardup",
            "semantic")).select(col("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("text2"), col("n_chars"), col("lang"))
        .localCheckpoint()
      // stage 2 (dedup): quality-aware winners, NOT first-wins min-id
      val dd = Dedup.dedupCorpusKeepBest(quality, "doc_id", "text2",
        "n_chars").localCheckpoint()
      // stage 3 (mixture): alpha-sample by language. OPT r20: no barrier —
      // the mixture is a single-consumer codegen filter (its count
      // aggregate collected inside temperatureMixture already ran), and
      // packTokenArrays materializes its own ranged input two operators
      // downstream, so the old localCheckpoint here was a pure extra pass.
      val mixed = Corpus.temperatureMixture(dd, "doc_id", "lang", alpha = 0.5)
      // stage 4 (tokenize) + stage 5 (pack)
      val wp = TextStats.wordPieceStats(mixed, "text2", q172Vocab)
        .select(col("doc_id"), col("wp_tokens"))
      val packed = Corpus.packTokenArrays(wp, "doc_id", "wp_tokens",
          capacity = 512)
        .select(col("chunk"), col("n_ids"),
          md5(array_join(col("ids"), "")).as("ids_hash"),
          array_join(transform(col("doc_spans"), x =>
            concat_ws(":", x.getField("doc"), x.getField("off"),
              x.getField("len"))), " ").as("spans_str"))
        .repartition(1).sortWithinPartitions(col("chunk"))
        .localCheckpoint()
      // stage 6 (shard): the q164 manifest discipline — single sorted
      // writer makes shard membership chunk DIV 8, replayable in SQL
      val path = Queries.scratchDir + "/q184_shards"
      val manifest = graft.sources.IO.writeShards(packed, path, 8)
      val back = s.read.parquet(path)
        .select(col("chunk"),
          element_at(split(input_file_name(), "/"), -1).as("file"))
      val perFile = back.groupBy(col("file")).agg(count(lit(1)).as("rows_read"))
      val withIdx = manifest.join(perFile, Seq("file"))
        .withColumn("shard_idx",
          (row_number().over(Window.orderBy(col("file"))) - 1).cast("long"))
      packed.join(back, Seq("chunk")).join(withIdx, Seq("file"))
        .select(col("chunk"), col("n_ids"), col("ids_hash"), col("spans_str"),
          col("shard_idx"), col("rows").as("shard_rows"), col("rows_read"),
          (col("bytes") > 0).as("bytes_pos"))
        .presentBy(col("chunk"))
    },
    // SEMANTIC DOCUMENT ORDERING for in-context pretraining (Shi et al.
    // 2023): IVF cells over the embeddings (16 smallest-id pivots, the
    // q42 assignment discipline), then a deterministic greedy
    // nearest-unvisited cosine chain within each cell — `ic_order` is the
    // chain position packTokenArrays consumes so related docs pack
    // adjacently. The oracle replays the ENTIRE walk as a recursive-CTE
    // state machine (visited list + struct-max argmax per hop, cosines as
    // the suite's in-order double fold rounded 6 dp) — one wrong hop
    // anywhere reorders the tail and fails the hash.
    "q183_semantic_order" -> { (s, dir) =>
      Similarity.semanticOrder(read(s, dir, "embeddings"), "vec_id",
          "embedding", nCells = 16)
        .select(col("vec_id"), col("cell"), col("ic_order"))
        .presentBy(col("vec_id"))
    },
    // FIRST-FIT-DECREASING batch layout (Multipack): token counts sorted
    // (len desc, id), greedy first-fit into 256-token batches inside
    // 64-doc rank groups — the density step past q178's bucketing (no
    // bucket-edge padding; oversize docs isolate themselves because
    // nothing fits beside them). The oracle replays EVERY seat assignment
    // with a recursive-CTE state machine over the same rank order (fills
    // list + first-fit position per step), so one wrong seat anywhere
    // fails the hash.
    "q182_ffd_binpack" -> { (s, dir) =>
      val toks = docsPar(s, dir).select(col("doc_id"),
        size(TextStats.tokens(coalesce(col("text"), lit(""))))
          .cast("int").as("n_tok"))
      Corpus.binPackBatches(toks, "doc_id", "n_tok", capacity = 256,
          groupDocs = 64)
        .select(col("doc_id"), col("n_tok"), col("pack_group"),
          col("batch_in_group"))
        .presentBy(col("doc_id"))
    },
    // PREFERENCE-PAIR (DPO) PREP: each document's 8-token turns split into
    // a prompt half (first ceil(nt/2) turns) and a response half; the
    // chosen branch is the response verbatim, the rejected branch appends
    // ' [no]' to every response turn — so the two branches differ in BOTH
    // text and span geometry. The oracle replays both serializations and
    // every span via the q177 window prefix-sums: rejected-branch offsets
    // shift by 5 per PRECEDING response turn and span lengths by 5, so a
    // fold error anywhere fails the hash; one-turn docs pin the
    // empty-branch edge (chosen == rejected == prompt, no spans). The
    // shared-prefix law (chosen[0:prefix_len] == rejected[0:prefix_len])
    // is pinned in ExtSpec.
    "q181_preference_pairs" -> { (s, dir) =>
      val fix = sftTurns(s, dir)
        .withColumn("__np", expr("CAST((size(turns) + 1) DIV 2 AS INT)"))
        .withColumn("prompt", expr("slice(turns, 1, __np)"))
        .withColumn("resp",
          expr("slice(turns, __np + 1, size(turns) - __np)"))
        .withColumn("rej", transform(col("resp"), t => struct(
          t.getField("role").as("role"),
          concat(t.getField("content"), lit(" [no]")).as("content"))))
        .select(col("doc_id"), col("prompt"), col("resp"), col("rej"))
      def spansStr(c: String) = array_join(transform(col(c), x =>
        concat_ws(":", x.getField("off"), x.getField("len"))), " ")
      Corpus.preferencePairs(fix, "prompt", "resp", "rej")
        .select(col("doc_id"), col("prefix_len"),
          col("chosen_text"), col("rejected_text"),
          spansStr("chosen_spans").as("chosen_spans_str"),
          spansStr("rejected_spans").as("rejected_spans_str"))
        .presentBy(col("doc_id"))
    },
    // QUALITY-ANNEALED CURRICULUM: n_chars as the quality proxy, anneal
    // fraction 0.2 — the top fifth by (chars desc, id) forms the
    // shuffled tail of the training order, the rest the shuffled main
    // phase. The oracle replays the count, the floor(n·0.2) cut, both
    // md5 shuffle keys, and every rank; one row on the wrong side of
    // either boundary anywhere fails the hash.
    "q207_anneal_order" -> { (s, dir) =>
      val d = read(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      Corpus.annealOrder(d, "doc_id", "n_chars", annealFrac = 0.2)
        .select(col("doc_id"), col("phase"), col("quality_rank"),
          col("train_order"))
        .presentBy(col("doc_id"))
    },
    // DETOKENIZER ROUND-TRIP: byte-level BPE encode → vocab-free token
    // decode must reproduce the normalized input EXACTLY, corpus-wide —
    // the q190 external-law shape: the Spark side hashes its
    // encode-then-decode reconstruction, the oracle hashes the
    // normalized ORIGINAL text it re-derives independently (bytes the
    // reconstruction never saw). Any pre-tokenizer drop, merge-table
    // corruption, or stand-in-alphabet mapping error anywhere fails.
    "q208_detok_roundtrip" -> { (s, dir) =>
      val norm = docsPar(s, dir).select(col("doc_id"),
        regexp_replace(coalesce(col("text"), lit("")),
          NonRe2WhitespaceJava, " ").as("text2"))
      TextStats.bpeStats(norm, "text2",
          q170Merges.map { case (a, b) => s"$a $b" }, byteLevel = true)
        .select(col("doc_id"), length(col("text2")).as("n_chars_norm"),
          md5(graft.funcs.BpeFunctions.bpeDetok(col("bpe_tokens"),
            byteLevel = true)).as("detok_md5"))
        .presentBy(col("doc_id"))
    },
    // pass@k: 8 synthetic samples per problem with an id-arithmetic
    // correctness grid (modulus 1 + id%4 spreads c over 2..8; every 7th
    // problem fails everything — the pass@k = 0 branch) evaluated at
    // k ∈ {1, 4, 8, 10} — k = 10 > n pins the NULL convention. The
    // oracle replays the counts, both falling-factorial integer
    // products, and the single division.
    "q204_pass_at_k" -> { (s, dir) =>
      val samples = read(s, dir, "documents")
        .select(col("doc_id"), explode(sequence(lit(1L), lit(8L))).as("j"))
        .withColumn("ok", pmod(col("doc_id"), lit(7)) =!= 0 &&
          pmod(col("doc_id") + col("j"),
            lit(1) + pmod(col("doc_id"), lit(4))) === 0)
      Eval.passAtK(samples, "doc_id", "ok", ks = Seq(1, 4, 8, 10))
        .presentBy(col("doc_id"), col("k"))
    },
    // BRADLEY-TERRY ARENA: one synthetic battle per document between its
    // source and an id-arithmetic opponent, winner biased toward the
    // higher source ordinal — then 8 quantized MM iterations. The oracle
    // replays the battle synthesis, the undirected pair counts, and all
    // 8 iterations as unrolled CTEs whose only cross-row sums are
    // INTEGER (the nano-unit quantization makes the fixed point
    // engine-exact); one strength off by one nano anywhere fails.
    "q205_bt_arena" -> { (s, dir) =>
      val d = read(s, dir, "documents").filter(col("source").isNotNull)
        .withColumn("ia", expr("CAST(substr(source, 4) AS BIGINT)"))
        .withColumn("ib",
          pmod(col("ia") + 1 + pmod(col("doc_id"), lit(19)), lit(20)))
        .withColumn("ma", col("source"))
        .withColumn("mb", concat(lit("src"), col("ib").cast("string")))
        .withColumn("win",
          when(pmod(col("doc_id") * 31, col("ia") + col("ib") + 2)
            <= col("ia"), col("ma")).otherwise(col("mb")))
      Eval.btRatings(d, "ma", "mb", "win", iters = 8)
        .presentBy(col("model"))
    },
    // DISTINCT-N diversity: bigram uniqueness share over each document's
    // token stream — the oracle replays the gram build, the per-row
    // distinct count, and the single division.
    "q206_distinct_ngrams" -> { (s, dir) =>
      val d = docsPar(s, dir).select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("toks"))
      Eval.distinctN(d, "toks", n = 2)
        .select(col("doc_id"), col("grams_n"), col("uniq_n"),
          col("distinct_n"))
        .presentBy(col("doc_id"))
    },
    // FLAC METADATA over the STREAMINFO walker: one synthetic FLAC per
    // document — rate/channels/total-samples/MD5 are all id-arithmetic
    // (the q179/q200 posture), so the oracle recomputes every unpacked
    // bit field including the hex-encoded embedded MD5 with no codec on
    // its side. The PADDING block + frame-sync tail pin the block walk
    // and the strict-tail rule.
    "q201_flac_meta" -> { (s, dir) =>
      import s.implicits._
      val media = docsPar(s, dir).select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map(id => Multimodal.MediaRow(id,
          Multimodal.syntheticFlac(id))))
      Multimodal.flacMeta(media).toDF()
        .select(col("id").as("doc_id"), col("sample_rate"), col("channels"),
          col("bits_per_sample"), col("total_samples"), col("duration_ms"),
          col("n_blocks"), col("md5_hex"))
        .presentBy(col("doc_id"))
    },
    // SPECULATIVE-DECODING ACCEPTANCE: target = the document's tokens,
    // draft = the same stream with every k-th token (k = 3 + id%5)
    // replaced by 'x' — so acceptance is the exact prefix up to the
    // first REAL mismatch (a document whose k-th token IS 'x' accepts
    // further; the oracle replays the comparison, not the corruption
    // schedule). Every output field is integer arithmetic plus one IEEE
    // division.
    "q202_spec_accept" -> { (s, dir) =>
      val d = docsPar(s, dir).select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("target"))
      val withDraft = d.withColumn("draft",
        transform(col("target"), (t, i) =>
          when((i + 1) % (lit(3) + pmod(col("doc_id"), lit(5))) === 0,
            lit("x")).otherwise(t)))
      Serving.specAcceptance(withDraft, "doc_id", "draft", "target")
        .select(col("doc_id"), col("n_draft"), col("n_target"),
          col("n_accept"), col("accept_rate"), col("toks_per_step"))
        .presentBy(col("doc_id"))
    },
    // NEEDLE-IN-A-HAYSTACK PREP: each document spliced with a fixed
    // 5-token needle at the 0/25/50/75/100% depth grid — the oracle
    // replays every insertion offset (integer DIV) and the spliced
    // stream's hash, so one token out of place at any depth in any
    // document fails.
    "q203_needle_prep" -> { (s, dir) =>
      val d = docsPar(s, dir).select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("toks"))
      Eval.needleInsert(d, "doc_id", "toks",
          Seq("the", "magic", "number", "is", "42"))
        .presentBy(col("doc_id"), col("depth_pct"))
    },
    // GAE ADVANTAGE: synthetic PPO trajectories — doc_id is the episode,
    // 1 + doc_id % 7 steps, rewards/values from exact integer mod grids
    // divided ONCE (single-IEEE-op doubles both engines replay) — run
    // through the backward δ + γλ·A recursion. The oracle re-derives the
    // trajectories and descends the SAME multiply-add chain with a
    // recursive CTE from the terminal step, so every advantage matches
    // bit for bit — no power-series reformulation, no rounding.
    "q198_gae_advantage" -> { (s, dir) =>
      val steps = read(s, dir, "documents")
        .select(col("doc_id"), explode(sequence(lit(1L),
          lit(1L) + pmod(col("doc_id"), lit(7L)))).as("stp"))
        .withColumn("rwd",
          (pmod(col("doc_id") * 3 + col("stp") * 5, lit(13)) - 6)
            .cast("double") / 4.0)
        .withColumn("vl",
          (pmod(col("doc_id") + col("stp") * 7, lit(11)) - 5)
            .cast("double") / 3.0)
      Corpus.gaeAdvantage(steps, "doc_id", "stp", "rwd", "vl")
        .select(col("doc_id"), col("step"), col("reward"), col("value"),
          col("delta"), col("advantage"), col("ret"))
        .presentBy(col("doc_id"), col("step"))
    },
    // ROUGE-2: q194's deterministic candidate corruption (every 5th token
    // 'x', every 11th dropped) scored recall-side — clipped bigram
    // overlap, both gram totals, P/R as one-division doubles and the
    // fixed 2PR/(P+R) expression. No libm anywhere, so nothing rounds:
    // the oracle replays every bigram count and the exact IEEE divisions.
    "q199_rouge_eval" -> { (s, dir) =>
      val d = docsPar(s, dir).select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("ref"))
      // OPT r19: rougeN consumes its input three times (both gram-count
      // sides + the base join) — materialize the tokenized fixture once
      // (3 corpus passes → 1, the q194 posture).
      val withCand = d.withColumn("cand",
        filter(transform(sequence(lit(1), size(col("ref"))),
          i => when(i % 11 === 0, lit(null).cast("string"))
            .when(i % 5 === 0, lit("x"))
            .otherwise(element_at(col("ref"), i))), x => x.isNotNull))
        .localCheckpoint()
      Eval.rougeN(withCand, "doc_id", "cand", "ref", n = 2)
        .select(col("doc_id"), col("overlap"), col("c_grams"),
          col("r_grams"), col("rouge_p"), col("rouge_r"), col("rouge_f"))
        .presentBy(col("doc_id"))
    },
    // EPOCH WATER-FILL: the budgeted mixture plan over the corpus's 20
    // sources — weight shares 1..5 from the source ordinal (src<k> gets
    // 1 + k%5), budget = 1.8× total chars (exact integer DIV), repeat cap
    // 2.5 epochs. The parameters are engineered so the saturated set is a
    // strict non-empty prefix (high-share/low-supply sources fill up, the
    // rest sit at the water level). The oracle replays the entire closed
    // form — the price sort, both running integer sums, the
    // cross-multiplied saturation test, the max-over-prefix saturated
    // totals, and the one-op-at-a-time IEEE level/alloc divisions — so one
    // source flipped across the water line anywhere fails the hash.
    "q197_epoch_waterfill" -> { (s, dir) =>
      val docs = read(s, dir, "documents")
      val total = docs.filter(col("source").isNotNull)
        .agg(sum(col("n_chars"))).collect()(0).getLong(0)
      val weights = (0 until 20).map(i => s"src$i" -> (1L + i % 5)).toMap
      Corpus.epochWaterfill(docs, "source", "n_chars", weights,
          budgetTokens = total * 18L / 10L, maxEpochs = 2.5)
        .presentBy(col("source"))
    },
    // BEST-OF-N rejection sampling to SFT: each document's first (up to)
    // two turns are the prompt, 1 + doc_id % 3 candidate completions are
    // cut from the token stream (doc_id % 5 == 0 docs repeat ONE
    // candidate n times — the all-tie case), every candidate is
    // serialized through the shared chat template (prompt prefix
    // verbatim, the q181 law n-way), scored with a deterministic proxy
    // (length mod 19 — engineered collisions), and the keep-best step
    // selects max score with smallest-cand_id tie-break. The oracle
    // replays prompt prefix-sums, every candidate serialization, the
    // score, and the argmax with the same tie-break; one character or
    // one tie broken the other way anywhere fails the hash.
    "q185_best_of_n" -> { (s, dir) =>
      val scored = Corpus.bestOfNCandidates(bestOfNFixture(s, dir),
          "prompt", "cands")
        .withColumn("score", (length(col("cand_text")) % 19).cast("int"))
      Corpus.keepBestCandidate(scored, "doc_id", "score")
        .select(col("doc_id"), col("n_cands"), col("cand_id"),
          col("score"), col("cand_text"),
          array_join(transform(col("cand_spans"), x =>
            concat_ws(":", x.getField("off"), x.getField("len"))), " ")
            .as("spans_str"))
        .presentBy(col("doc_id"))
    },
    // SPAN-PRESERVING TRUNCATION: q177's serialized conversations cut to
    // the last 200 code points (side=left, the chat convention), loss
    // spans intersected with the kept window and re-based — a span
    // straddling the cut keeps its surviving suffix, one fully outside
    // drops. The oracle rebuilds text + spans via the q177 prefix-sum
    // chain and replays the interval algebra per span; one boundary off
    // by one anywhere fails the hash.
    "q186_chat_truncate" -> { (s, dir) =>
      val chat = Corpus.chatTemplate(sftTurns(s, dir), "turns")
      Corpus.truncateChat(chat, "chat_text", "loss_spans", 200L, "left")
        .select(col("doc_id"), col("orig_len"), col("kept_from"),
          col("trunc_text"),
          array_join(transform(col("trunc_spans"), x =>
            concat_ws(":", x.getField("off"), x.getField("len"))), " ")
            .as("spans_str"))
        .presentBy(col("doc_id"))
    },
    // UNCORRUPT ROUND-TRIP: q176's span-corruption pair inverted — every
    // sentinel in `corrupted` spliced back with its masked span from
    // `targets` — and the reconstruction hashed against an oracle that
    // independently re-derives the ORIGINAL token stream (the q190
    // external-law pattern for the denoising objective): one span
    // misplaced, truncated, or swapped between windows anywhere fails
    // the hash.
    "q192_uncorrupt_roundtrip" -> { (s, dir) =>
      val toks = docsPar(s, dir).select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("toks"))
      val pair = Corpus.spanCorrupt(toks, "doc_id", "toks")
      Corpus.uncorruptSpans(pair, "corrupted", "targets")
        .select(col("doc_id"), col("n_rebuilt").as("n_toks"),
          md5(array_join(col("rebuilt"), "\u001f")).as("toks_md5"))
        .presentBy(col("doc_id"))
    },
    // CONTRASTIVE TRIPLETS: the q79 planted corpus (every seed vector
    // gets a ~0.99-cosine jittered twin) mined for embedding-training
    // triplets over the SAME 16 first-id cells — the planted twin is the
    // positive, the most-similar in-cell vector below 0.5 the hard
    // negative, a deterministic other-cell representative the easy
    // negative. The oracle replays assignment, every in-cell cosine,
    // both band argmaxes with their tie-breaks, and the partner-cell
    // modular arithmetic.
    "q196_contrastive_triplets" -> { (s, dir) =>
      val corpus = Similarity.plantNearDups(read(s, dir, "embeddings"),
        "vec_id", "embedding", offset = 1000000L, scale = 0.01)
      Similarity.contrastiveTriplets(corpus, "vec_id", "embedding",
          posMin = 0.95, negMax = 0.5, nCells = 16)
        .presentBy(col("anchor_id"))
    },
    // MAJORITY VOTE: 4 deterministic synthetic answer samples per doc
    // ((doc_id·7 + j·13) mod 5 mod 3, with every 17th (doc_id + j) a
    // failed NULL extraction) collapsed to the modal answer — the
    // pattern lands 2-1-1 majorities, 2-2 ties (the lexicographic
    // tie-break, exercised corpus-wide) and unanimous docs. The oracle
    // replays the vote synthesis, counts, and (count desc, answer) argmax.
    "q195_majority_vote" -> { (s, dir) =>
      val votes = docsPar(s, dir)
        .select(col("doc_id"), explode(sequence(lit(1), lit(4))).as("j"))
        .withColumn("ans",
          when(pmod(col("doc_id") + col("j"), lit(17)) === 0,
            lit(null).cast("string"))
            .otherwise(concat(lit("ans"),
              pmod(pmod(col("doc_id") * 7 + col("j") * 13, lit(5)), lit(3))
                .cast("string"))))
        .select(col("doc_id"), col("ans"))
      Eval.majorityVote(votes, "doc_id", "ans")
        .presentBy(col("doc_id"))
    },
    // BLEU EVAL: each document scored against a deterministic corruption
    // of itself — every 5th token replaced by 'x', every 11th dropped
    // (original positions) — so the metric exercises partial clipped
    // matches at all four orders AND a real brevity penalty (the drops
    // make the candidate shorter). The oracle replays every gram count,
    // the clipping, and the fixed 6-dp IEEE expression.
    "q194_bleu_eval" -> { (s, dir) =>
      val d = docsPar(s, dir).select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("ref"))
      // OPT r19: bleuScore consumes its input three times (candidate-gram
      // counts, reference-gram counts, base row join) — materialize the
      // tokenized fixture once instead of re-running tokenize + the
      // corruption transform per consumer (3 corpus passes → 1).
      val withCand = d.withColumn("cand",
        filter(transform(sequence(lit(1), size(col("ref"))),
          i => when(i % 11 === 0, lit(null).cast("string"))
            .when(i % 5 === 0, lit("x"))
            .otherwise(element_at(col("ref"), i))), x => x.isNotNull))
        .localCheckpoint()
      Eval.bleuScore(withCand, "doc_id", "cand", "ref")
        .select(col("doc_id"), col("c_len"), col("r_len"),
          col("m1"), col("m2"), col("m3"), col("m4"),
          col("t1"), col("t4"), col("bp"), col("bleu"))
        .presentBy(col("doc_id"))
    },
    // PREFIX-CACHE GROUPING: a prompt corpus synthesized with the
    // hierarchy a serving fleet actually sees — 16 system-preamble tokens
    // shared per source (exactly block 1 at blockSize 16), 16 more per
    // (source, lang) (block 2), then the document's own tokens — run
    // through the vLLM-style chained block-hash analysis: which prompts
    // hit a warm KV prefix, how deep (shared_blocks/reuse_toks), and
    // which cache line they share (prefix_group, the routing key).
    // Planted exact-duplicate documents surface as full-depth sharing.
    "q193_prefix_cache" -> { (s, dir) =>
      val toks = concat(
        transform(sequence(lit(0), lit(15)),
          i => concat(lit("p:"), coalesce(col("source"), lit("")), lit(":"),
            i.cast("string"))),
        transform(sequence(lit(0), lit(15)),
          i => concat(lit("q:"), coalesce(col("source"), lit("")), lit(":"),
            coalesce(col("lang"), lit("")), lit(":"), i.cast("string"))),
        TextStats.tokens(coalesce(col("text"), lit(""))))
      val prompts = docsPar(s, dir).select(col("doc_id"), toks.as("toks"))
      Serving.prefixCacheGroups(prompts, "doc_id", "toks", 16)
        .select(col("doc_id"), col("n_toks"), col("n_blocks"),
          col("shared_blocks"), col("reuse_toks"), col("prefix_group"))
        .presentBy(col("doc_id"))
    },
    // SLIDING-WINDOW CHUNKING: each document's token stream split into
    // 32-token views at 24-token steps (8-token overlap keeps boundary
    // context in both views — the HF return_overflowing_tokens
    // convention an embedding indexer consumes); the final window always
    // reaches the last token and may be short. The oracle replays the
    // window-count formula, every start offset, the clamped slice and
    // its length; one token or boundary off anywhere fails the hash.
    "q191_sliding_windows" -> { (s, dir) =>
      val toks = docsPar(s, dir).select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("toks"))
      Corpus.slidingWindows(toks, "doc_id", "toks", window = 32,
          stride = 24)
        .select(col("doc_id"), col("win_id"), col("win_start"),
          col("n_win_toks"),
          array_join(col("win_toks"), "\u001f").as("win_str"))
        .presentBy(col("doc_id"), col("win_id"))
    },
    // UNPACK ROUND-TRIP: q174's WordPiece stream packed at 512 and then
    // REBUILT per document from the chunks' doc_spans alone — the
    // delivery-integrity law unpack(pack(X)) == X, proven externally:
    // the emitted md5 is of the RECONSTRUCTION, the oracle's md5 is of
    // the ORIGINAL stream (re-derived by the greedy WordPiece walk), so
    // one token lost, duplicated, or reordered anywhere in pack OR
    // unpack fails the hash. Docs with empty token streams pack to
    // nothing and are absent on both sides.
    "q190_unpack_roundtrip" -> { (s, dir) =>
      val toks = TextStats.wordPieceStats(docsPar(s, dir), "text",
          q172Vocab)
        .select(col("doc_id"), col("wp_tokens"))
      val packed = Corpus.packTokenArrays(toks, "doc_id", "wp_tokens",
        capacity = 512)
      Corpus.unpackTokenChunks(packed)
        .select(col("doc").as("doc_id"), col("n_ids"),
          md5(array_join(col("ids"), "\u001f")).as("ids_md5"))
        .presentBy(col("doc_id"))
    },
    // DDP BATCH SCHEDULE: every (doc, epoch) pair placed at (epoch, step,
    // device_rank) — md5-shuffled per epoch (the q102 key convention),
    // exactly worldSize=8 rows per step, each epoch's trailing n % 8 rows
    // dropped (drop-last). The per-epoch rank is ONE two-phase prefix sum
    // over (epoch, key, id) — no global window. The oracle replays the
    // hash, the per-epoch row_number, the div/mod placement and the
    // drop-last cut; one row misplaced anywhere fails the hash.
    "q189_ddp_schedule" -> { (s, dir) =>
      Corpus.batchSchedule(
          read(s, dir, "documents").select(col("doc_id")),
          "doc_id", worldSize = 8, epochs = 2)
        .select(col("doc_id"), col("epoch"), col("step"),
          col("device_rank"))
        .presentBy(col("epoch"), col("step"), col("device_rank"))
    },
    // GROUP-RELATIVE ADVANTAGE (GRPO): q185's scored candidate rows
    // normalized per prompt group — advantage = (score - mean) / std,
    // population std, zero-variance groups (the doc_id % 5 all-tie docs)
    // emit 0. Every float is derived from DECIMAL-exact integer moments
    // by a fixed expression over identical operands, so DuckDB replays
    // it bit for bit — mean, std, and every advantage value hash-compared
    // at full double precision.
    "q187_grpo_advantage" -> { (s, dir) =>
      val scored = Corpus.bestOfNCandidates(bestOfNFixture(s, dir),
          "prompt", "cands")
        .withColumn("score", (length(col("cand_text")) % 19).cast("int"))
        .select(col("doc_id"), col("cand_id"), col("score"))
      Corpus.groupAdvantage(scored, "doc_id", "score")
        .select(col("doc_id"), col("cand_id"), col("score"),
          col("group_n"), col("group_mean"), col("group_std"),
          col("advantage"))
        .presentBy(col("doc_id"), col("cand_id"))
    },
    // MASKED TOKEN PACKING: q180's (tokens, loss mask) streams packed
    // into 256-token training chunks with doc_spans intact — the packed
    // SFT input (tokens + aligned mask + the boundaries block-diagonal
    // attention resets on). The oracle composes the q180 mask replay
    // with the q174-style global pack rank: per-doc counts → global
    // offsets → chunk = g DIV 256, tokens/mask re-aggregated in global
    // order and every (doc, off, len) span re-derived; one token, mask
    // bit, or span boundary wrong anywhere fails the hash.
    "q188_sft_pack" -> { (s, dir) =>
      val chat = Corpus.chatTemplate(sftTurns(s, dir), "turns")
        .select(col("doc_id"), col("chat_text"), col("loss_spans"))
      val tlm = Corpus.tokenLossMask(chat, "doc_id", "chat_text",
          "loss_spans")
        .select(col("doc_id"), col("mask_tokens"), col("loss_mask"))
      Corpus.packMaskedTokens(tlm, "doc_id", "mask_tokens", "loss_mask",
          256L)
        .select(col("chunk"),
          array_join(col("toks"), "\u001f").as("toks_str"),
          array_join(transform(col("mask"), _.cast("string")), "")
            .as("mask_str"),
          col("n_toks"),
          array_join(transform(col("doc_spans"), x =>
            concat_ws(":", x.getField("doc"), x.getField("off"),
              x.getField("len"))), " ").as("spans_str"))
        .presentBy(col("chunk"))
    },
    // INSTRUCTION-TUNING (SFT) CHAT-TEMPLATE serializer: each document's
    // whitespace tokens are cut into 8-token turns alternating
    // user/assistant, serialized through the ChatML-shaped template, and
    // the loss-mask spans (0-based char offsets covering each assistant
    // turn's content + the <|im_end|> stop sentinel) ride along — the SFT
    // analogue of q174's doc_spans. The oracle replays the template
    // concat AND every span via window prefix-sums over per-turn piece
    // lengths; one span off by one character anywhere fails the hash.
    "q177_chat_sft" -> { (s, dir) =>
      Corpus.chatTemplate(sftTurns(s, dir), "turns")
        .select(col("doc_id"), col("n_turns"), col("chat_text"),
          array_join(transform(col("loss_spans"), x =>
            concat_ws(":", x.getField("off"), x.getField("len"))), " ")
            .as("spans_str"))
        .presentBy(col("doc_id"))
    },
    // TOKEN-ALIGNED LOSS MASK: q177's character spans converted to the
    // per-token 0/1 mask a trainer feeds the loss — single-char
    // separator tokenization makes token offsets exact prefix
    // arithmetic on both engines; a token straddling a span boundary
    // (endTok glued to the last content token) masks 1, whole-token
    // granularity. The oracle rebuilds text + spans, re-derives every
    // token offset with a window prefix-sum and replays the overlap
    // test per token — one mask bit wrong anywhere fails the hash.
    "q180_sft_token_mask" -> { (s, dir) =>
      val chat = Corpus.chatTemplate(sftTurns(s, dir), "turns")
        .select(col("doc_id"), col("chat_text"), col("loss_spans"))
      Corpus.tokenLossMask(chat, "doc_id", "chat_text", "loss_spans")
        .select(col("doc_id"),
          array_join(col("mask_tokens"), "\u001f").as("toks_str"),
          array_join(transform(col("loss_mask"), _.cast("string")), "")
            .as("mask_str"))
        .presentBy(col("doc_id"))
    },
    // SEQUENCE-LENGTH BUCKETING for padded SFT batches: token counts →
    // width-16 buckets padded to the bucket edge, 256-token batches
    // filled in doc_id order within each bucket (prefixSum's two-phase
    // rank discipline — no global window). The oracle replays bucket
    // assignment, seats-per-batch, and every (batch, seat) pair from one
    // per-bucket row_number; a rank off by one anywhere in any bucket
    // fails the hash.
    "q178_length_buckets" -> { (s, dir) =>
      val toks = docsPar(s, dir).select(col("doc_id"),
        size(TextStats.tokens(coalesce(col("text"), lit(""))))
          .cast("int").as("n_tok"))
      Corpus.lengthBucketBatches(toks, "doc_id", "n_tok",
          bucketWidth = 16, capacity = 256)
        .select(col("doc_id"), col("n_tok"), col("bucket"),
          col("padded_len"), col("batch_in_bucket"), col("seq_in_batch"))
        .presentBy(col("doc_id"))
    },
    "q176_span_corrupt" -> { (s, dir) =>
      val toks = docsPar(s, dir).select(col("doc_id"),
        TextStats.tokens(coalesce(col("text"), lit(""))).as("toks"))
      Corpus.spanCorrupt(toks, "doc_id", "toks")
        .select(col("doc_id"), col("n_masked"),
          array_join(col("corrupted"), "\u001f").as("corrupted_str"),
          array_join(col("targets"), "\u001f").as("targets_str"))
        .presentBy(col("doc_id"))
    },
    "q175_fim" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val psm = Corpus.fimTransform(docs, "doc_id", "text", fimFrac = 0.5)
        .withColumnRenamed("fim_text", "psm_text")
        .withColumnRenamed("fim_applied", "was_applied")
      Corpus.fimTransform(psm, "doc_id", "text", fimFrac = 0.5, spm = true)
        .select(col("doc_id"), col("fim_applied"),
          col("psm_text"), col("fim_text").as("spm_text"))
        .presentBy(col("doc_id"))
    },
    "q174_pack_token_ids" -> { (s, dir) =>
      val toks = TextStats.wordPieceStats(docsPar(s, dir), "text", q172Vocab)
        .select(col("doc_id"), col("wp_tokens"))
      Corpus.packTokenArrays(toks, "doc_id", "wp_tokens", capacity = 512)
        .select(col("chunk"), col("n_ids"),
          array_join(col("ids"), "\u001f").as("ids_str"),
          array_join(transform(col("doc_spans"), x =>
            concat_ws(":", x.getField("doc"), x.getField("off"),
              x.getField("len"))), " ").as("spans_str"),
          array_join(transform(
            Corpus.packedPositionIds(col("doc_spans")), _.cast("string")),
            " ").as("pos_str"))
        .presentBy(col("chunk"))
    },
    // WORDPIECE TRAINING end-to-end (Schuster & Nakajima 2012; the HF
    // trainer's likelihood scoring): induce 20 merges on the corpus —
    // each iteration takes the admissible pair maximizing
    // count(pair)/(count(a)*count(b)) under EXACT integer
    // cross-multiplication — FREEZE the merges and vocabulary through
    // OracleAux, then greedy-tokenize every document with the trained
    // vocabulary. The oracle re-derives EVERY merge selection inductively
    // (word table from scratch, merges 1..k-1 applied, score argmax via a
    // HUGEINT dominance join with the same lexicographic tie-break and
    // minPairCount floor) and replays the greedy tokenization under the
    // frozen vocabulary, gated on all selections matching.
    "q173_wordpiece_train" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      val (m, v) = TextStats.wordPieceTrainFull(docs, "text",
        numMerges = TrainNumMerges, maxWords = TrainMaxWords,
        minPairCount = Q173MinPairCount)
      OracleAux.write("q173_merges", m.map { case (a, b) => s"$a $b" })
      OracleAux.write("q173_vocab", v)
      TextStats.wordPieceStats(docs, "text", v)
        .select(col("doc_id"), col("wp_count"),
          array_join(col("wp_tokens"), "\u001f").as("wp_str"),
          array_join(transform(col("wp_ids"), _.cast("string")), " ")
            .as("wp_ids_str"))
        .presentBy(col("doc_id"))
    },
    "q172_wordpiece" -> { (s, dir) =>
      TextStats.wordPieceStats(
          docsPar(s, dir).select(col("doc_id"),
            concat(coalesce(col("text"), lit("")),
              lit(" The theming ending 1234 don't re-do \u00f8yen")).as("text2")),
          "text2", q172Vocab)
        .select(col("doc_id"), col("wp_count"),
          array_join(col("wp_tokens"), "\u001f").as("wp_str"),
          array_join(transform(col("wp_ids"), _.cast("string")), " ")
            .as("wp_ids_str"))
        .presentBy(col("doc_id"))
    },
    // Cross-table fuzzy key join (entity resolution): left = the catalog
    // slice's titles, right = the other documents' titles (non-matching
    // mass) plus one planted deletion twin per catalog title — each left
    // key matches exactly its twin at distance 1. The oracle is a plain
    // exact-levenshtein theta-join in DuckDB (a genuinely independent
    // plan; the variant machinery is recall-1.0 by the SymSpell
    // invariant, so the exact join IS the semantics).
    "q171_typo_join" -> { (s, dir) =>
      val base = docsPar(s, dir).select(col("doc_id"),
        concat(substring(col("text"), 1, 16), lit("-"),
          col("doc_id")).as("title"))
      val leftT = base.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("left_id"), col("title").as("lkey"))
      val rightT = base.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("right_id"), col("title").as("rkey"))
        .unionByName(base.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 1000000L).as("right_id"),
            concat(substring(col("title"), 1, 1),
              substring(col("title"), 3, 100)).as("rkey")))
      Dedup.typoJoin(leftT, rightT, "left_id", "lkey", "right_id", "rkey",
          maxDist = 1)
        .presentBy(col("left_id"), col("right_id"))
    },
    "q168_typo_pairs" -> { (s, dir) =>
      val base = docsPar(s, dir).select(col("doc_id"),
        concat(substring(col("text"), 1, 16), lit("-"),
          col("doc_id")).as("title"))
      val all = base
        .select((col("doc_id") * 3).as("doc_id"), col("title"))
        .unionByName(base.select((col("doc_id") * 3 + 1).as("doc_id"),
          concat(substring(col("title"), 1, 1),
            substring(col("title"), 3, 100)).as("title")))
        .unionByName(base.select((col("doc_id") * 3 + 2).as("doc_id"),
          concat(lit("z"), substring(col("title"), 2, 100)).as("title")))
      Dedup.deletionNeighborPairs(all, "doc_id", "title", maxDist = 1)
        .presentBy(col("id1"), col("id2"))
    },
    // Incremental typo dedup (q168's key space in q60's incremental
    // shape): arrivals whose short title sits within Levenshtein 1 of the
    // HELD catalog drop at ingestion — Bloom over the catalog's
    // delete-variant keys, variant equi-join confirm, exact DP decision.
    // Arrivals = the non-catalog docs plus one planted deletion twin per
    // catalog title; the oracle replays membership as a NOT EXISTS over
    // the exact distance (the Bloom/variant machinery is recall-1.0 by
    // the SymSpell invariant, so the confirm IS the semantics).
    "q169_incremental_typo" -> { (s, dir) =>
      val base = docsPar(s, dir).select(col("doc_id"),
        concat(substring(col("text"), 1, 16), lit("-"),
          col("doc_id")).as("title"))
      val seen = base.filter(col("doc_id") % 3 === 0)
      val arrivals = base.filter(col("doc_id") % 3 =!= 0)
        .unionByName(seen.select((col("doc_id") + 1000000L).as("doc_id"),
          concat(substring(col("title"), 1, 1),
            substring(col("title"), 3, 100)).as("title")))
      Dedup.incrementalTypo(arrivals, seen, "doc_id", "title", maxDist = 1)
        .presentBy(col("doc_id"))
    },
    // Accent folding (the CCNet normalize stage after q166's NFC): NFD +
    // combining-mark strip, replayed through DuckDB's INDEPENDENT
    // strip_accents (utf8proc) — the fixture is ASCII, so the accents are
    // planted; ASCII text must pass through identical (fast-path law).
    "q167_accent_fold" -> { (s, dir) =>
      graft.funcs.TextFunctions.register(s)
      val planted = concat(col("text"),
        lit(" crème brûlée déjà vu naïve " +
          "façade niño über açaí"))
      docsPar(s, dir).select(col("doc_id"),
          graft.funcs.TextFunctions.stripAccents(planted).as("folded"))
        .withColumn("fp", md5(col("folded")))
        .presentBy(col("doc_id"))
    },
    // Token-coverage curve (vocabulary sizing): fraction of token
    // occurrences covered by the top-k types, computed from the
    // COUNT-VALUE histogram (no vocabulary sort, no per-term rank — ties
    // are interchangeable mass by construction). The k list straddles the
    // fixture's 31-word closed vocabulary, so the k > |V| clamp is
    // exercised (coverage 1.0 at k = 100).
    "q165_vocab_coverage" -> ((s, dir) =>
      graft.ext.Audit.vocabCoverage(docsPar(s, dir), "text",
          Seq(1L, 5L, 10L, 31L, 100L))
        .presentBy(col("k"))),
    // Deterministic epoch shuffle: reproducible (part, key) placement from
    // the md5 of (id, epoch) — the RNG-free training-order primitive.
    "q102_epoch_shuffle" -> ((s, dir) =>
      graft.ext.Audit.epochShuffle(read(s, dir, "documents"), "doc_id",
          epoch = 1, numParts = 32)
        .select(col("doc_id"), col("shuffle_part"), col("shuffle_key"))
        .presentBy(col("doc_id"))),
    // Greedy token-budget curation: top up a 10k-token budget by quality
    // points (doc_id tiebreak) via the two-phase distributed prefix sum —
    // the keep set is the maximal affordable prefix.
    "q100_token_budget" -> ((s, dir) =>
      Corpus.selectUnderTokenBudget(
          read(s, dir, "documents")
            .select(col("doc_id"),
              TextStats.qualityPoints(col("text")).as("quality"),
              TextStats.tokenCount(col("text")).as("tokens")),
          "doc_id", "tokens", "quality", budget = 10000L)
        .select(col("doc_id"), col("quality"), col("tokens"), col("cum_tokens"))
        .presentBy(col("doc_id"))),
    // GPT-3-style span decontamination over q52's corpus/bench split:
    // colliding 8-grams plus a 2-token margin are cut out, the rest of the
    // document survives (contrast q58, which drops whole documents).
    "q99_mask_contamination" -> { (s, dir) =>
      val docs = docsPar(s, dir)
      Corpus.maskContamination(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0), "doc_id", "text",
          k = 8, margin = 2)
        .select(col("doc_id"), col("text_clean"), col("spans_hit"),
          col("tokens_total"), col("tokens_masked"))
        .presentBy(col("doc_id"))
    },
    // Backward as-of join (merge_asof semantics): every click matched to
    // the user's latest purchase at-or-before it. Union + one user_id
    // shuffle + last(ignoreNulls) carry-forward — no range predicate ever
    // reaches a join, so the plan can never be a nested loop.
    "q107_asof_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val buys = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.ext.Joins.asofJoin(clicks, buys, Seq("user_id"), "ts", "ts",
          payload = Seq("value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("ts_matched"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("value").as("purchase_value"))
        .presentBy(col("event_id"))
    },
    // Bucketized point-in-interval range join: clicks inside the 2-hour
    // window after each error, per user — intervals replicate to their
    // covered 7200 s epoch buckets and the match is an EQUI-join on
    // (user_id, bucket) + exact residual, never a theta join.
    "q108_range_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 7200 SECONDS")).as("w_end"))
      graft.ext.Joins.rangeJoin(clicks, errors, Seq("user_id"),
          "ts", "w_start", "w_end", bucketSeconds = 7200L)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .cast("double").as("sum_value"))
        .presentBy(col("err_id"))
    }
  )

  /** q91's merges ranking: WELL-FORMED (each side a base char or an earlier
    * merge's output), which is what licenses the oracle's rank-order replay.
    * `def`s, not `val`s: referenced from both maps, and a val declared after
    * a map that captures it is still null at object init. */
  private def q91Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("o", "n"), ("e", "r"), ("o", "r"), ("a", "t"))

  private def q91Vocab: Seq[String] = Seq(
    "the", "th", "in", "an", "er", "on", "at", "or", "e", "t", "a", " ")

  /** DuckDB replay of the BPE merge loop: wrap every char as ␟c␟, then one
    * `replace` pass per merge in rank order — `replace`'s left-to-right
    * non-overlapping scan IS the all-occurrences merge pass, and the
    * double-separator boundary (`␟a␟␟b␟` → `␟ab␟`) keeps adjacency intact
    * while making cross-token substring matches impossible. */
  private def mergedExpr(merges: Seq[(String, String)], src: String): String =
    merges.foldLeft(src) { case (acc, (a0, b0)) =>
      val a = a0.replace("'", "''"); val b = b0.replace("'", "''")
      s"replace($acc, chr(31)||'$a'||chr(31)||chr(31)||'$b'||chr(31), " +
        s"chr(31)||'$a$b'||chr(31))"
    }

  private def q91MergedExpr(src: String): String = mergedExpr(q91Merges, src)

  /** q123/q173 trainer parameters — ONE definition feeding both the query
    * lambda and the oracle generator (ADVICE r16): the oracle GATES its
    * rows on replaying every selection under these exact values, so a
    * silent drift between the two sides would empty the oracle and fail
    * the driver compare with no hint at the cause. */
  private val TrainNumMerges = 20
  private val TrainMaxWords = 10000
  private val Q173MinPairCount = 2L

  /** The whitespace set Java's UNICODE_CHARACTER_CLASS `\s` matches and
    * RE2's ASCII `\s` does not (Unicode White_Space minus `[\t\n\f\r ]`).
    * q170's planted text normalizes these to ' ' on BOTH engines (ADVICE
    * r16): the Spark byte-level pre-tokenizer runs the reference's
    * Unicode `\s`, the DuckDB replay runs RE2's ASCII `\s`, and any
    * corpus document containing one of these characters would
    * pre-tokenize differently on the two sides — a false oracle failure,
    * not silent wrongness. Two spellings of ONE class: Java regex for
    * the Spark side, RE2 `\x{...}` for the oracle side. */
  private val NonRe2WhitespaceJava =
    "[\\x0B\\u0085\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]"
  private val NonRe2WhitespaceRe2 =
    "[\\x{000B}\\x{0085}\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}" +
      "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"

  /** q170's BYTE-LEVEL merges, in the GPT-2 stand-in alphabet
    * (Ġ = U+0120 is byte 0x20 ' ', Ċ = U+010A is 0x0A '\n', Ã/© are the
    * self-mapped bytes 0xC3/0xA9 — é's UTF-8 pair). WELL-FORMED like
    * [[q91Merges]] (each side a base symbol or an earlier output), which
    * licenses the oracle's rank-order replay; the table deliberately
    * covers a space-prefixed word chain (Ġt→Ġthe), a capitalized word
    * (The), a contraction ('s), a multi-byte character (Ã©), and a
    * whitespace-run merge (ĠĠ). */
  private def q170Merges: Seq[(String, String)] = Seq(
    ("\u0120", "t"), ("h", "e"), ("i", "n"), ("\u0120", "a"),
    ("\u0120t", "he"), ("a", "n"), ("\u0120a", "n"), ("\u0120an", "d"),
    ("e", "r"), ("T", "he"), ("'", "s"), ("\u00c3", "\u00a9"),
    ("\u0120", "\u0120"), ("o", "r"), ("o", "n"))

  /** q170's vocab: merged tokens + a subset of base symbols — symbols NOT
    * listed (u, m, digits, …) exercise the −1 unknown-id path. */
  private def q170Vocab: Seq[String] = Seq(
    "\u0120the", "\u0120and", "The", "\u0120t", "\u0120a", "\u0120an",
    "he", "in", "an", "er", "or", "on", "'s", "\u00c3\u00a9",
    "\u0120", "\u0120\u0120", "\u010a", "a", "d", "e", "h", "i", "n",
    "o", "r", "s", "t", ".", ",")

  /** q172's WordPiece vocabulary: [UNK] + a few multi-char pieces that
    * exercise the greedy longest-match rule against their own prefixes
    * and continuations, plus full single-char coverage of [a-z0-9] (word
    * and ## forms) and the four punctuation marks the planted suffix
    * uses — anything else (e.g. ø) is a whole-word [UNK] in BOTH
    * engines. */
  private def q172Vocab: Seq[String] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    Seq("[UNK]", "the", "th", "end", "##ing", "don", "do", "re", "an",
      "##nd", "##en") ++ singles ++ singles.map("##" + _) ++
      Seq(".", ",", "'", "-")
  }

  // replace(chr(11)) mirrors TextStats.tokens' translate("\u000B", " "):
  // \x0B is the one char where Java-ASCII \s (Spark's split) and RE2 \s
  // (this string_split_regex) disagree — both sides normalize it to ' '
  // so a vertical tab in a corpus document cannot diverge the two engines
  private val docToks =
    """string_split_regex(lower(trim(replace(text, chr(11), ' '))), '\s+')"""

  /** [[docToks]] with the Spark side's null-text coalesce: operators whose
    * Scala pipeline tokenizes `coalesce(text, '')` (q116/q122/q127/q128)
    * must replay the SAME empty-document semantics — a bare `text` would
    * silently drop NULL-text rows from the unnest while Spark still emits
    * the [''] token (latent today: the fixture has no NULL text). */
  private val docToksC =
    """string_split_regex(lower(trim(replace(coalesce(text, ''), chr(11), ' '))), '\s+')"""

  /** Shared perplexity-replay header: tokenized documents (`t`) and the
    * per-document scored-bigram stream (`dg`/`sc`) — the REF-INDEPENDENT
    * half of the q90 machinery, shared by every model [[pplModelCtes]]
    * stacks on top (q151 scores the same stream under TWO models). */
  private def pplHeaderCtes: String =
    s"""WITH t AS (SELECT doc_id, lang, source, $docToks AS toks FROM documents),
       |dg AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
       |  FROM t WHERE len(toks) >= 2),
       |sc AS (SELECT doc_id, i AS pos,
       |    concat_ws(' ', toks[i], toks[i+1]) AS gram, toks[i] AS ctx
       |  FROM dg)""".stripMargin

  /** One bigram add-1 model + scoring pass, parametric over the reference
    * slice (`refWhere` over `t`) and a CTE prefix `p` (so two models can
    * share one WITH list): trains capped gram/unigram counts, scores the
    * shared `sc` stream, folds per-document NLLs in DOCUMENT ORDER — ends
    * at `${p}f` = (doc_id, lm_grams, lm_oov, s). */
  private def pplModelCtes(refWhere: String, p: String): String =
    s"""${p}r AS (SELECT toks FROM t WHERE $refWhere),
       |${p}rg AS (SELECT unnest(CASE WHEN len(toks) >= 2
       |    THEN list_transform(range(1, len(toks)),
       |      i -> concat_ws(' ', toks[i], toks[i+1]))
       |    ELSE [] END) AS gram FROM ${p}r),
       |${p}gc AS (SELECT gram, count(*) AS c FROM ${p}rg GROUP BY 1
       |  QUALIFY row_number() OVER (ORDER BY c DESC, gram) <= 1048576),
       |${p}ru AS (SELECT unnest(toks) AS u FROM ${p}r),
       |${p}uc AS (SELECT u, count(*) AS c FROM ${p}ru GROUP BY 1
       |  QUALIFY row_number() OVER (ORDER BY c DESC, u) <= 1048576),
       |${p}vv AS (SELECT count(*) + 1 AS v FROM ${p}uc),
       |${p}j AS (SELECT sc.doc_id, sc.pos, ${p}gc.c AS cg, ${p}uc.c AS cc
       |  FROM sc LEFT JOIN ${p}gc ON sc.gram = ${p}gc.gram
       |    LEFT JOIN ${p}uc ON sc.ctx = ${p}uc.u),
       |${p}nl AS (SELECT doc_id, pos, cg IS NULL AS oov,
       |    -ln(CAST(coalesce(cg, 0) + 1 AS DOUBLE) /
       |        CAST(coalesce(cc, 0) + (SELECT v FROM ${p}vv) AS DOUBLE)) AS nll
       |  FROM ${p}j),
       |${p}f AS (SELECT doc_id, count(*) AS lm_grams,
       |    count(*) FILTER (WHERE oov) AS lm_oov,
       |    list_sum(list(nll ORDER BY pos)) AS s
       |  FROM ${p}nl GROUP BY 1)""".stripMargin

  /** Shared q90/q95 perplexity replay CTEs: bigram add-1 model trained on
    * the English slice, per-document mean NLL summed in DOCUMENT ORDER —
    * ends at `f` = (doc_id, lm_grams, lm_oov, s). */
  private def pplCtes: String =
    s"""$pplHeaderCtes,
       |${pplModelCtes("lang = 'en'", "")}""".stripMargin

  /** Shared q93/q94 DSIR replay CTEs: hashed uni+bigram buckets (q53's md5
    * arithmetic, salt "graft:dsir", B = 10000), bucket-count models on the
    * target (lang='en') vs raw (all documents) slices, per-bucket add-1
    * log-ratios, and the per-document document-order fold. Every bucket a
    * document emits exists in `rc` (raw = the scored corpus itself), so the
    * LEFT JOIN to `lr` never misses — mirroring the Spark side, where the
    * unseen-bucket constant never fires for the same reason. */
  private def dsirCtes: String =
    s"""WITH t AS (SELECT doc_id, lang, $docToks AS toks FROM documents),
       |g AS (SELECT doc_id, lang, list_concat(toks,
       |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
       |      i -> concat_ws(' ', toks[i], toks[i+1])) ELSE [] END) AS grams
       |  FROM t),
       |bk AS (SELECT doc_id, lang, list_transform(grams, x ->
       |    CAST(CAST(('0x' || substr(md5(x || ':graft:dsir'), 1, 8)) AS BIGINT)
       |      % 10000 AS INT)) AS bks FROM g),
       |e0 AS (SELECT doc_id, lang, bks,
       |    unnest(range(1, len(bks) + 1)) AS pos FROM bk),
       |e AS (SELECT doc_id, lang, pos, bks[pos] AS bucket FROM e0),
       |tc AS (SELECT bucket, count(*) AS c FROM e WHERE lang = 'en' GROUP BY 1),
       |rc AS (SELECT bucket, count(*) AS c FROM e GROUP BY 1),
       |tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM tc) AS tt,
       |               (SELECT coalesce(sum(c), 0) FROM rc) AS tr),
       |lr AS (SELECT rc.bucket,
       |    ln(CAST(coalesce(tc.c, 0) + 1 AS DOUBLE) / CAST(tt + 10000 AS DOUBLE))
       |  - ln(CAST(rc.c + 1 AS DOUBLE) / CAST(tr + 10000 AS DOUBLE)) AS lr
       |  FROM rc LEFT JOIN tc USING (bucket), tot),
       |j AS (SELECT e.doc_id, e.pos, lr.lr FROM e LEFT JOIN lr USING (bucket)),
       |f AS (SELECT doc_id, count(*) AS ds_grams,
       |    round(list_sum(list(lr ORDER BY pos)), 6) AS ds_logw
       |  FROM j GROUP BY 1)""".stripMargin

  /** shared shingle CTEs (word k-grams, distinct per doc) over any source
    * relation — mirrors Dedup.shinglesOfTokens INCLUDING the short-doc
    * fallback (a doc under k tokens collapses to one whole-document
    * shingle). Current fixtures have no sub-k docs at any SF, but the
    * fallback must live in the oracle, not in a comment: without it, a
    * future fixture with a 4-7-token doc would silently drop that doc from
    * the oracle's rows while the Spark side still emits it. */
  private def shingleCtesOver(src: String, k: Int, p: String) =
    s"""${p}toks AS (SELECT doc_id, $docToks AS t FROM $src),
       |${p}sh AS (SELECT doc_id, unnest(CASE WHEN len(t) >= $k
       |         THEN list_transform(range(1, len(t)-(${k - 2})),
       |           i -> concat_ws(' ', ${(0 until k).map(j => s"t[i+$j]").mkString(", ")}))
       |         ELSE [array_to_string(t, ' ')] END) AS g FROM ${p}toks),
       |${p}d AS (SELECT DISTINCT doc_id, g FROM ${p}sh)""".stripMargin

  private def shingleBaseOver(src: String, k: Int = 4) =
    shingleCtesOver(src, k, "")

  /** q121's analytic acoustic-fingerprint replay, parametric over a
    * `(k, base)` source CTE — `base` drives the synthetic sample/length
    * formulas, `k` is the row identity. Emits `${p}s(k, hi, lo)` (unsigned
    * 32-bit halves), so one WITH list can carry TWO signature pipelines
    * (q129 compares arrivals against the seen catalog). */
  private def afpCtesOver(src: String, p: String): String =
    s"""${p}d AS (SELECT k, base,
       |    CAST(1000 + base % 500 AS BIGINT) AS n FROM $src),
       |${p}sm AS (SELECT k, n, i.range AS i,
       |    abs(((base*7 + i.range*31) % 65536) - 32768) AS a
       |  FROM ${p}d, range(0, 1500) i WHERE i.range < n),
       |${p}e AS (SELECT k, (i * 65) // n AS f, SUM(a) AS en
       |  FROM ${p}sm GROUP BY 1, 2),
       |${p}b AS (SELECT a.k, a.f - 1 AS pos,
       |    CASE WHEN a.en > q.en THEN 1 ELSE 0 END AS bit
       |  FROM ${p}e a JOIN ${p}e q ON a.k = q.k AND q.f = a.f - 1
       |  WHERE a.f >= 1),
       |${p}s AS (SELECT k,
       |    CAST(SUM(CASE WHEN pos >= 32
       |      THEN bit * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END)
       |      AS BIGINT) AS hi,
       |    CAST(SUM(CASE WHEN pos < 32
       |      THEN bit * (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS BIGINT) AS lo
       |  FROM ${p}b GROUP BY 1)""".stripMargin

  private val shingleBase = shingleBaseOver("documents")

  private val jaccardSql =
    s"""WITH $shingleBase,
       |sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
       |co AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
       |       FROM d a JOIN d b ON a.g=b.g AND a.doc_id<b.doc_id GROUP BY 1,2),
       |j AS (SELECT id1, id2, CAST(c AS DOUBLE)/(s1.n+s2.n-c) AS jaccard
       |      FROM co JOIN sz s1 ON id1=s1.doc_id JOIN sz s2 ON id2=s2.doc_id)
       |SELECT id1, id2, jaccard FROM j WHERE jaccard >= 0.8
       |ORDER BY id1, id2""".stripMargin

  /** SimHash signature CTEs in SQL (Md5 hasher), parametric over source,
    * shingle width, and CTE-name prefix so one WITH list can carry TWO
    * signature pipelines (q64 compares arrivals against the seen corpus):
    * lower-64-md5 words → 64 bit-balance sums → four 16-bit sign blocks
    * `${p}blk(doc_id, b0..b3)` (the 64-bit signature, split the way the
    * pigeonhole join needs it). */
  private def simhashBlockCtes(src: String, k: Int, p: String): String = {
    val sums = (0 until 64).map { i =>
      val w = if (i < 32) "w0" else "w1"
      s"SUM(CASE WHEN ($w >> ${i % 32}) & 1 = 1 THEN 1 ELSE -1 END) AS s_$i"
    }.mkString(",\n|  ")
    val blks = (0 until 4).map { j =>
      val terms = (0 until 16)
        .map(t => s"(CASE WHEN s_${j * 16 + t} > 0 THEN ${1L << t} ELSE 0 END)")
        .mkString(" + ")
      s"($terms) AS b$j"
    }.mkString(",\n|  ")
    s"""${shingleCtesOver(src, k, p)},
       |${p}w AS (SELECT doc_id,
       |  CAST(('0x' || substr(md5(g), 25, 8)) AS BIGINT) AS w0,
       |  CAST(('0x' || substr(md5(g), 17, 8)) AS BIGINT) AS w1 FROM ${p}d),
       |${p}s AS (SELECT doc_id,
       |  $sums
       |  FROM ${p}w GROUP BY doc_id),
       |${p}blk AS (SELECT doc_id,
       |  $blks
       |  FROM ${p}s)""".stripMargin
  }

  /** Full SimHash pipeline in SQL, mirroring Dedup.simhashPairs with the
    * Md5 hasher: signature blocks → pigeonhole block join → Hamming
    * distance. The O(n²) OR-join is fine for the oracle (it runs on the
    * 500-doc fixture, not at scale). */
  private val simhashSql: String =
    s"""WITH ${simhashBlockCtes("documents", 4, "")},
       |pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
       |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
       |       + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS INT) AS dist
       |  FROM blk a JOIN blk b ON a.doc_id < b.doc_id
       |    AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
       |SELECT id1, id2, dist FROM pr WHERE dist <= 3 ORDER BY id1, id2""".stripMargin

  /** cosine CTEs in explicit double arithmetic (mirrors Similarity exactly);
    * rounded to 6 dp before thresholds/ranks. */
  private val cosineCtes =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |       FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
      |      FROM e)""".stripMargin

  /** The whole binary-ANN pipeline replayed: micro-unit quantization,
    * cross-multiplied mean-threshold bits packed 32/word, xor+popcount
    * Hamming candidates (topK·rerank = 20, (ham, id) order), exact cosine
    * re-rank with the q39 rounding/tie conventions. */
  private val binaryAnnSql: String =
    s"""WITH $cosineCtes,
       |qz AS (SELECT vec_id,
       |  list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv
       |  FROM n),
       |nn AS (SELECT count(*) AS cnt FROM qz),
       |st AS (SELECT d, sum(qv[d]) AS s
       |  FROM qz CROSS JOIN (SELECT unnest(range(1, 65)) AS d) GROUP BY d),
       |th AS (SELECT list(s ORDER BY d) AS sl FROM st),
       |bs AS (SELECT vec_id,
       |    list_transform(range(0, 2), w -> list_sum(list_transform(range(0, 32),
       |      k -> CASE WHEN qv[w*32 + k + 1] * cnt > sl[w*32 + k + 1]
       |           THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END))) AS words
       |  FROM qz CROSS JOIN nn CROSS JOIN th),
       |hm AS (SELECT q.vec_id AS qid, c.vec_id AS id,
       |    list_sum(list_transform(range(1, 3),
       |      j -> bit_count(xor(q.words[j], c.words[j])))) AS ham
       |  FROM bs c JOIN bs q ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |cd AS (SELECT qid, id FROM hm
       |  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY ham, id) <= 20),
       |p2 AS (SELECT cd.qid, cd.id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, 65),
       |      k -> q.v[k]*c.v[k])) / (q.nrm*c.nrm), 6) AS cos_sim
       |  FROM cd JOIN n c ON cd.id = c.vec_id JOIN n q ON cd.qid = q.vec_id),
       |r AS (SELECT qid, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM p2)
       |SELECT qid, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  /** q139: the JL matrix re-derived from its LCG parity formula, projected
    * distances ranked, then q112's exact-cosine re-rank chain. */
  private val jlAnnSql: String =
    s"""WITH $cosineCtes,
       |jp AS (SELECT vec_id, list_transform(range(0, 16), j ->
       |    list_sum(list_transform(range(0, 64), d ->
       |      v[d+1] * (1.0 - 2.0 * CAST(((j*2654435761 + d*40503) % 1000003) % 2
       |        AS DOUBLE)))) / sqrt(16.0)) AS y
       |  FROM n),
       |qj AS (SELECT vec_id AS qid, y AS qy FROM jp WHERE vec_id < 10),
       |dd AS (SELECT qj.qid, jp.vec_id AS id,
       |    round(list_sum(list_transform(range(1, 17),
       |      k -> (qj.qy[k]-jp.y[k])*(qj.qy[k]-jp.y[k]))), 6) AS jl_d2
       |  FROM jp JOIN qj ON jp.vec_id <> qj.qid),
       |cd AS (SELECT qid, id FROM dd
       |  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY jl_d2, id) <= 20),
       |p2 AS (SELECT cd.qid, cd.id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, 65),
       |      k -> q.v[k]*c.v[k])) / (q.nrm*c.nrm), 6) AS cos_sim
       |  FROM cd JOIN n c ON cd.id = c.vec_id JOIN n q ON cd.qid = q.vec_id),
       |r AS (SELECT qid, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM p2)
       |SELECT qid, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  /** q141: both snapshots assigned to the OLD snapshot's smallest-id
    * pivots by rounded L2, per-(cell, dim) 1e-6-grid integer sums →
    * dimension-ordered mean lists, occupancy shares from 1-row totals,
    * in-order L2 shift of the means at 6 dp. */
  private val embeddingDriftSql: String =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |o AS (SELECT vec_id AS id, v FROM e WHERE vec_id < 400),
       |nw AS (SELECT vec_id AS id,
       |    CASE WHEN vec_id % 3 = 0
       |      THEN list_transform(v, x -> CAST(CAST(x + 0.05 AS REAL) AS DOUBLE))
       |      ELSE v END AS v
       |  FROM e WHERE vec_id % 7 <> 0),
       |piv AS (SELECT id AS pid, v AS pv FROM o ORDER BY id LIMIT 16),
       |ao AS (SELECT o.id, o.v, pid FROM o CROSS JOIN piv
       |  QUALIFY row_number() OVER (PARTITION BY o.id ORDER BY
       |    round(list_sum(list_transform(range(1, 65),
       |      k -> (o.v[k]-pv[k])*(o.v[k]-pv[k]))), 6), pid) = 1),
       |an AS (SELECT nw.id, nw.v, pid FROM nw CROSS JOIN piv
       |  QUALIFY row_number() OVER (PARTITION BY nw.id ORDER BY
       |    round(list_sum(list_transform(range(1, 65),
       |      k -> (nw.v[k]-pv[k])*(nw.v[k]-pv[k]))), 6), pid) = 1),
       |mo1 AS (SELECT ao.pid AS cell, dd.d,
       |    sum(CAST(floor(ao.v[dd.d]*1000000.0) AS BIGINT)) AS s,
       |    count(*) AS n
       |  FROM ao CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
       |  GROUP BY 1, 2),
       |mo AS (SELECT cell, max(n) AS n_old,
       |    list(CAST(s AS DOUBLE)/1000000.0/n ORDER BY d) AS mv
       |  FROM mo1 GROUP BY 1),
       |mn1 AS (SELECT an.pid AS cell, dd.d,
       |    sum(CAST(floor(an.v[dd.d]*1000000.0) AS BIGINT)) AS s,
       |    count(*) AS n
       |  FROM an CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
       |  GROUP BY 1, 2),
       |mn AS (SELECT cell, max(n) AS n_new,
       |    list(CAST(s AS DOUBLE)/1000000.0/n ORDER BY d) AS mv
       |  FROM mn1 GROUP BY 1),
       |j AS (SELECT coalesce(mo.cell, mn.cell) AS cell,
       |    coalesce(mo.n_old, 0) AS n_old, coalesce(mn.n_new, 0) AS n_new,
       |    mo.mv AS mvo, mn.mv AS mvn
       |  FROM mo FULL OUTER JOIN mn ON mo.cell = mn.cell),
       |t AS (SELECT sum(n_old) AS tot_o, sum(n_new) AS tot_n FROM j)
       |SELECT j.cell, CAST(j.n_old AS BIGINT) AS n_old,
       |  CAST(j.n_new AS BIGINT) AS n_new,
       |  CAST(j.n_old AS DOUBLE)/CAST(t.tot_o AS DOUBLE) AS share_old,
       |  CAST(j.n_new AS DOUBLE)/CAST(t.tot_n AS DOUBLE) AS share_new,
       |  CASE WHEN j.mvo IS NOT NULL AND j.mvn IS NOT NULL THEN
       |    round(sqrt(list_sum(list_transform(range(1, 65),
       |      k -> (j.mvo[k]-j.mvn[k])*(j.mvo[k]-j.mvn[k])))), 6)
       |  END AS l2_shift
       |FROM j CROSS JOIN t ORDER BY cell""".stripMargin

  /** q142: the full HLL replay — md5 register/rank words, string-arithmetic
    * leading-zero rank (no float log), max per register, exact dyadic
    * harmonic sum, α·m²/S with linear/large corrections, 6-dp round.
    * α·m² folds as (α·256)·256 on the Spark side — ×2^8 twice is exact, so
    * α·65536 here is the identical double. */
  private val hllVocabSql: String =
    s"""WITH t AS (SELECT source, unnest($docToksC) AS tok FROM documents),
       |h AS (SELECT source, md5(tok || ':graft:hll') AS h FROM t),
       |rw AS (SELECT source,
       |    CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 256 AS reg,
       |    length(regexp_extract(substr(h, 9, 8), '^0*')) AS z,
       |    substr(h, 9, 8) AS w
       |  FROM h),
       |rk AS (SELECT source, reg,
       |    CASE WHEN z = 8 THEN 33 ELSE z * 4 +
       |      (CASE WHEN v >= 8 THEN 0 WHEN v >= 4 THEN 1
       |            WHEN v >= 2 THEN 2 ELSE 3 END) + 1 END AS rank
       |  FROM (SELECT source, reg, z,
       |      CASE WHEN z = 8 THEN 0
       |           ELSE CAST(('0x' || substr(w, z + 1, 1)) AS BIGINT) END AS v
       |    FROM rw)),
       |m AS (SELECT source, reg, max(rank) AS maxr FROM rk GROUP BY 1, 2),
       |g AS (SELECT source, count(*) AS filled,
       |    sum(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << maxr) AS DOUBLE)) AS hs
       |  FROM m GROUP BY 1),
       |e AS (SELECT source, filled, 256 - filled AS zeros,
       |    (CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
       |        + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
       |      * CAST(65536 AS DOUBLE)
       |      / (hs + CAST(256 - filled AS DOUBLE)) AS eraw
       |  FROM g)
       |SELECT source, CAST(filled AS BIGINT) AS filled,
       |  round(CASE
       |    WHEN eraw <= CAST(640 AS DOUBLE) AND zeros > 0
       |      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / CAST(zeros AS DOUBLE))
       |    WHEN eraw > CAST(4294967296 AS DOUBLE) / CAST(30 AS DOUBLE)
       |      THEN -CAST(4294967296 AS DOUBLE)
       |        * ln(CAST(1 AS DOUBLE) - eraw / CAST(4294967296 AS DOUBLE))
       |    ELSE eraw END, 6) AS est_distinct,
       |  CASE WHEN eraw <= CAST(640 AS DOUBLE) AND zeros > 0 THEN 'linear'
       |       WHEN eraw > CAST(4294967296 AS DOUBLE) / CAST(30 AS DOUBLE) THEN 'large'
       |       ELSE 'raw' END AS regime
       |FROM e ORDER BY source""".stripMargin

  /** q147: q142's register machinery extended with pair algebra — the
    * pair-scoped register-wise-max union sketches (UNION ALL + max — the
    * engine's greatest/coalesce full-outer, identically), the same
    * harmonic-sum/correction estimate for sources and unions, and the
    * inclusion-exclusion arithmetic on the rounded 6-dp estimates. */
  private val hllOverlapSql: String =
    s"""WITH t AS (SELECT source, unnest($docToksC) AS tok FROM documents),
       |h AS (SELECT source, md5(tok || ':graft:hll') AS h FROM t),
       |rw AS (SELECT source,
       |    CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 256 AS reg,
       |    length(regexp_extract(substr(h, 9, 8), '^0*')) AS z,
       |    substr(h, 9, 8) AS w
       |  FROM h),
       |rk AS (SELECT source, reg,
       |    CASE WHEN z = 8 THEN 33 ELSE z * 4 +
       |      (CASE WHEN v >= 8 THEN 0 WHEN v >= 4 THEN 1
       |            WHEN v >= 2 THEN 2 ELSE 3 END) + 1 END AS rank
       |  FROM (SELECT source, reg, z,
       |      CASE WHEN z = 8 THEN 0
       |           ELSE CAST(('0x' || substr(w, z + 1, 1)) AS BIGINT) END AS v
       |    FROM rw)),
       |m AS (SELECT source, reg, max(rank) AS maxr FROM rk GROUP BY 1, 2),
       |g AS (SELECT source, count(*) AS filled,
       |    sum(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << maxr) AS DOUBLE)) AS hs
       |  FROM m GROUP BY 1),
       |e AS (SELECT source, 256 - filled AS zeros,
       |    (CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
       |        + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
       |      * CAST(65536 AS DOUBLE)
       |      / (hs + CAST(256 - filled AS DOUBLE)) AS eraw
       |  FROM g),
       |es AS (SELECT source, round(CASE
       |    WHEN eraw <= CAST(640 AS DOUBLE) AND zeros > 0
       |      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / CAST(zeros AS DOUBLE))
       |    WHEN eraw > CAST(4294967296 AS DOUBLE) / CAST(30 AS DOUBLE)
       |      THEN -CAST(4294967296 AS DOUBLE)
       |        * ln(CAST(1 AS DOUBLE) - eraw / CAST(4294967296 AS DOUBLE))
       |    ELSE eraw END, 6) AS v FROM e),
       |pr AS (SELECT a.source AS sa, b.source AS sb
       |  FROM es a CROSS JOIN es b WHERE a.source < b.source),
       |pu AS (SELECT sa, sb, reg, max(maxr) AS maxr FROM (
       |    SELECT pr.sa, pr.sb, m.reg, m.maxr FROM pr JOIN m ON m.source = pr.sa
       |    UNION ALL
       |    SELECT pr.sa, pr.sb, m.reg, m.maxr FROM pr JOIN m ON m.source = pr.sb)
       |  GROUP BY 1, 2, 3),
       |gu AS (SELECT sa, sb, count(*) AS filled,
       |    sum(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << maxr) AS DOUBLE)) AS hs
       |  FROM pu GROUP BY 1, 2),
       |eu AS (SELECT sa, sb, 256 - filled AS zeros,
       |    (CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
       |        + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
       |      * CAST(65536 AS DOUBLE)
       |      / (hs + CAST(256 - filled AS DOUBLE)) AS eraw
       |  FROM gu),
       |esu AS (SELECT sa, sb, round(CASE
       |    WHEN eraw <= CAST(640 AS DOUBLE) AND zeros > 0
       |      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / CAST(zeros AS DOUBLE))
       |    WHEN eraw > CAST(4294967296 AS DOUBLE) / CAST(30 AS DOUBLE)
       |      THEN -CAST(4294967296 AS DOUBLE)
       |        * ln(CAST(1 AS DOUBLE) - eraw / CAST(4294967296 AS DOUBLE))
       |    ELSE eraw END, 6) AS vu FROM eu)
       |SELECT esu.sa AS src_a, esu.sb AS src_b,
       |  ea.v AS est_a, eb.v AS est_b, esu.vu AS est_union,
       |  round(ea.v + eb.v - esu.vu, 6) AS est_inter,
       |  round(round(ea.v + eb.v - esu.vu, 6) / least(ea.v, eb.v), 6)
       |    AS containment
       |FROM esu JOIN es ea ON ea.source = esu.sa
       |  JOIN es eb ON eb.source = esu.sb
       |ORDER BY src_a, src_b""".stripMargin

  /** q143: the two-pass count-min replay — d×w cell counts (md5 salted per
    * row), md5-threshold doc-sample candidates, min-over-rows estimates,
    * (est desc, tok) top-k, exact verification join. */
  private val cmsHeavyHittersSql: String =
    s"""WITH t AS (SELECT doc_id, unnest($docToksC) AS tok FROM documents),
       |sk AS (SELECT r.range AS row,
       |    CAST(('0x' || substr(md5(tok || ':graft:cms:'
       |      || CAST(r.range AS VARCHAR)), 1, 8)) AS BIGINT) % 1024 AS cell,
       |    count(*) AS c
       |  FROM t CROSS JOIN range(0, 4) r GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT tok FROM t
       |  WHERE CAST(('0x' || substr(md5(doc_id || ':graft:cms:sample'), 1, 8))
       |    AS BIGINT) % 10000 < 2000),
       |est AS (SELECT cand.tok, min(coalesce(sk.c, 0)) AS est_count
       |  FROM cand CROSS JOIN range(0, 4) r
       |  LEFT JOIN sk ON sk.row = r.range AND sk.cell =
       |    CAST(('0x' || substr(md5(cand.tok || ':graft:cms:'
       |      || CAST(r.range AS VARCHAR)), 1, 8)) AS BIGINT) % 1024
       |  GROUP BY 1),
       |top AS (SELECT tok, est_count FROM est
       |  ORDER BY est_count DESC, tok LIMIT 20),
       |ex AS (SELECT t.tok, count(*) AS exact_count
       |  FROM t JOIN top ON t.tok = top.tok GROUP BY 1)
       |SELECT row_number() OVER (ORDER BY top.est_count DESC, top.tok) AS rank,
       |  top.tok, CAST(top.est_count AS BIGINT) AS est_count,
       |  CAST(coalesce(ex.exact_count, 0) AS BIGINT) AS exact_count
       |FROM top LEFT JOIN ex ON top.tok = ex.tok
       |ORDER BY rank""".stripMargin

  /** q149: the log-histogram replay — integer bucket arithmetic
    * (floor(log2 v) as binary digit count − 1, shift-down/shift-up bucket
    * floors), per-source bucket counts (the shard merge is a count sum, so
    * building from all documents replays the merged shards exactly),
    * partitioned cumulative window, ceil(q·n) target pick. */
  private val lengthQuantilesSql: String =
    s"""WITH t AS (SELECT source, len($docToksC) AS v FROM documents),
       |b AS (SELECT source, v, greatest(length(bin(v)) - 6, 0) AS sh FROM t),
       |bk AS (SELECT source, (v >> sh) << sh AS lo,
       |    (CAST(1 AS BIGINT) << sh) AS w FROM b),
       |sk AS (SELECT source, lo, w, count(*) AS c FROM bk GROUP BY 1, 2, 3),
       |cm AS (SELECT source, lo, w, c,
       |    CAST(sum(c) OVER (PARTITION BY source ORDER BY lo) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM sk),
       |qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
       |    CAST(0.99 AS DOUBLE)]) AS q)
       |SELECT source, q, n, lo AS est_lo, lo + w - 1 AS est_hi,
       |  CAST(lo + lo + w - 1 AS DOUBLE) / CAST(2 AS DOUBLE) AS est_mid
       |FROM cm CROSS JOIN qs
       |WHERE cum >= greatest(1, CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT))
       |  AND cum - c < greatest(1, CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT))
       |ORDER BY source, q""".stripMargin

  /** q152: q149's bucket/cumsum machinery at (0.05, 0.95), outer-edge
    * cutoffs per source, then the broadcast-join filter pass. */
  private val lengthTrimSql: String =
    s"""WITH t AS (SELECT doc_id, source, len($docToksC) AS v FROM documents),
       |b AS (SELECT source, v, greatest(length(bin(v)) - 6, 0) AS sh FROM t),
       |bk AS (SELECT source, (v >> sh) << sh AS lo,
       |    (CAST(1 AS BIGINT) << sh) AS w FROM b),
       |sk AS (SELECT source, lo, w, count(*) AS c FROM bk GROUP BY 1, 2, 3),
       |cm AS (SELECT source, lo, w, c,
       |    CAST(sum(c) OVER (PARTITION BY source ORDER BY lo) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM sk),
       |qs AS (SELECT unnest([CAST(0.05 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS q),
       |sel AS (SELECT source, q, lo, w FROM cm CROSS JOIN qs
       |  WHERE cum >= greatest(1, CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT))
       |    AND cum - c < greatest(1, CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT))),
       |cuts AS (SELECT source,
       |    min(CASE WHEN q = CAST(0.05 AS DOUBLE) THEN lo END) AS lo_cut,
       |    min(CASE WHEN q = CAST(0.95 AS DOUBLE) THEN lo + w - 1 END) AS hi_cut
       |  FROM sel GROUP BY 1)
       |SELECT t.doc_id, t.source, t.v AS n_tokens, cuts.lo_cut, cuts.hi_cut
       |FROM t JOIN cuts USING (source)
       |WHERE t.v >= cuts.lo_cut AND t.v <= cuts.hi_cut
       |ORDER BY doc_id""".stripMargin

  /** q150: the bottom-k replay — q142's register machinery under the guard
    * salt for the per-source distinct estimate, the identical IEEE
    * threshold chain on the 6-dp estimate, hash-word filter + distinct +
    * per-source rank ≤ k, then the pair-scoped union rank and Broder's
    * |S ∩ A ∩ B| / |S| estimator. */
  private val bottomkResemblanceSql: String =
    s"""WITH t AS (SELECT source, unnest($docToksC) AS tok FROM documents),
       |h AS (SELECT source, md5(tok || ':graft:bk:guard') AS h FROM t),
       |rw AS (SELECT source,
       |    CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 256 AS reg,
       |    length(regexp_extract(substr(h, 9, 8), '^0*')) AS z,
       |    substr(h, 9, 8) AS w
       |  FROM h),
       |rk AS (SELECT source, reg,
       |    CASE WHEN z = 8 THEN 33 ELSE z * 4 +
       |      (CASE WHEN v >= 8 THEN 0 WHEN v >= 4 THEN 1
       |            WHEN v >= 2 THEN 2 ELSE 3 END) + 1 END AS rank
       |  FROM (SELECT source, reg, z,
       |      CASE WHEN z = 8 THEN 0
       |           ELSE CAST(('0x' || substr(w, z + 1, 1)) AS BIGINT) END AS v
       |    FROM rw)),
       |m AS (SELECT source, reg, max(rank) AS maxr FROM rk GROUP BY 1, 2),
       |g AS (SELECT source, count(*) AS filled,
       |    sum(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << maxr) AS DOUBLE)) AS hs
       |  FROM m GROUP BY 1),
       |e AS (SELECT source, 256 - filled AS zeros,
       |    (CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
       |        + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
       |      * CAST(65536 AS DOUBLE)
       |      / (hs + CAST(256 - filled AS DOUBLE)) AS eraw
       |  FROM g),
       |es AS (SELECT source, round(CASE
       |    WHEN eraw <= CAST(640 AS DOUBLE) AND zeros > 0
       |      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / CAST(zeros AS DOUBLE))
       |    WHEN eraw > CAST(4294967296 AS DOUBLE) / CAST(30 AS DOUBLE)
       |      THEN -CAST(4294967296 AS DOUBLE)
       |        * ln(CAST(1 AS DOUBLE) - eraw / CAST(4294967296 AS DOUBLE))
       |    ELSE eraw END, 6) AS est FROM e),
       |thr AS (SELECT source, CAST(ceil(least(CAST(1 AS DOUBLE),
       |      CAST(1024 AS DOUBLE) / greatest(est * CAST(0.8 AS DOUBLE),
       |        CAST(1 AS DOUBLE)))
       |    * CAST(4294967296 AS DOUBLE)) AS BIGINT) AS thr FROM es),
       |hv AS (SELECT DISTINCT source, md5(tok || ':graft:bk') AS hv FROM t),
       |sv AS (SELECT hv.source, hv.hv FROM hv JOIN thr USING (source)
       |  WHERE CAST(('0x' || substr(hv.hv, 1, 8)) AS BIGINT) < thr.thr),
       |sk AS (SELECT source, hv FROM (SELECT source, hv,
       |    row_number() OVER (PARTITION BY source ORDER BY hv) AS r FROM sv)
       |  WHERE r <= 256),
       |gs AS (SELECT DISTINCT source FROM sk),
       |pr AS (SELECT a.source AS sa, b.source AS sb
       |  FROM gs a CROSS JOIN gs b WHERE a.source < b.source),
       |au AS (SELECT pr.sa, pr.sb, sk.hv, CAST(1 AS BIGINT) AS ina
       |  FROM pr JOIN sk ON sk.source = pr.sa),
       |bu AS (SELECT pr.sa, pr.sb, sk.hv, CAST(1 AS BIGINT) AS inb
       |  FROM pr JOIN sk ON sk.source = pr.sb),
       |u AS (SELECT sa, sb, hv, coalesce(ina, 0) AS ina, coalesce(inb, 0) AS inb
       |  FROM au FULL JOIN bu USING (sa, sb, hv)),
       |r AS (SELECT sa, sb, ina, inb,
       |    row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS rk FROM u)
       |SELECT sa AS src_a, sb AS src_b, count(*) AS union_k,
       |  CAST(sum(ina * inb) AS BIGINT) AS shared,
       |  round(CAST(sum(ina * inb) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS est_jaccard
       |FROM r WHERE rk <= 256 GROUP BY 1, 2
       |ORDER BY src_a, src_b""".stripMargin

  /** q155: the A-ES replay — q87's quality points + 1 as the weight, the
    * 52-bit md5 draw, the 6-dp log key, the per-source rank window with
    * id tiebreak. */
  private val weightedSampleSql: String =
    s"""WITH t AS (SELECT doc_id, source, text, $docToks AS toks FROM documents),
       |p AS (SELECT doc_id, source,
       |    (CASE WHEN len(toks) BETWEEN 30 AND 500 THEN 5 ELSE 0 END)
       |  + (CASE WHEN CAST(len(list_filter(toks, x -> list_contains(
       |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
       |      / len(toks) >= 0.05 THEN 3 ELSE 0 END)
       |  + (CASE WHEN CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
       |      / length(text) <= 0.1 THEN 2 ELSE 0 END) + 1 AS w
       |  FROM t),
       |k AS (SELECT doc_id, source, w,
       |    round(ln((CAST(('0x' || substr(md5(doc_id || ':graft:wsample'), 1, 13))
       |        AS BIGINT) + 1) / CAST(4503599627370497 AS DOUBLE))
       |      / CAST(w AS DOUBLE), 6) AS ws_key
       |  FROM p WHERE w > 0)
       |SELECT doc_id, source, CAST(w AS INT) AS weight, ws_key FROM (
       |  SELECT *, row_number() OVER (PARTITION BY source
       |    ORDER BY ws_key DESC, doc_id) AS r FROM k)
       |WHERE r <= 5 ORDER BY doc_id""".stripMargin

  /** q154: the winnowing replay — 4-gram md5-word hashes, the packed
    * (hash·2^22 + reversed-pos) rightmost-minimum over a 4-row frame,
    * full windows only, distinct per-doc fingerprints, df cap, pair join.
    * Shift/pack arithmetic is BIGINT-exact in both engines. */
  private val winnowMatchesSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |g AS (SELECT doc_id, i - 1 AS pos,
       |    CAST(('0x' || substr(md5(concat_ws(' ',
       |      toks[i], toks[i+1], toks[i+2], toks[i+3])), 1, 8)) AS BIGINT) AS hv
       |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 2)) AS i
       |    FROM t WHERE len(toks) >= 4)),
       |s0 AS (SELECT doc_id, pos,
       |    min(hv * 4194304 + (4194303 - pos)) OVER (PARTITION BY doc_id
       |      ORDER BY pos ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS selk
       |  FROM g),
       |fps AS (SELECT DISTINCT doc_id, selk >> 22 AS fp FROM s0 WHERE pos >= 3),
       |keep AS (SELECT fp FROM (SELECT fp, count(*) AS d FROM fps GROUP BY 1)
       |  WHERE d <= 1000),
       |kf AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
       |FROM kf a JOIN kf b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= 2
       |ORDER BY id_a, id_b""".stripMargin

  /** q153 helper: one HLL register chain over `rel` (columns (g, tok)),
    * salted `salt` — ends at `${p}m(g, reg, maxr)`. Same arithmetic as the
    * q142 replay, folded to one chain so q153 can instantiate it four
    * times (vocab/guard × existing/incoming). */
  private def hllRegChainSql(rel: String, salt: String, p: String): String =
    s"""${p}h AS (SELECT g, md5(tok || ':$salt') AS h FROM $rel),
       |${p}rw AS (SELECT g,
       |    CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 256 AS reg,
       |    length(regexp_extract(substr(h, 9, 8), '^0*')) AS z,
       |    substr(h, 9, 8) AS hw
       |  FROM ${p}h),
       |${p}m AS (SELECT g, reg, max(CASE WHEN z = 8 THEN 33 ELSE z * 4 +
       |      (CASE WHEN v >= 8 THEN 0 WHEN v >= 4 THEN 1 WHEN v >= 2 THEN 2
       |            ELSE 3 END) + 1 END) AS maxr
       |  FROM (SELECT g, reg, z, CASE WHEN z = 8 THEN 0
       |      ELSE CAST(('0x' || substr(hw, z + 1, 1)) AS BIGINT) END AS v
       |    FROM ${p}rw)
       |  GROUP BY 1, 2)""".stripMargin

  /** q153 helper: the HLL estimate over a (g, reg, maxr) relation — ends
    * at `${p}s(g, v)` (6-dp rounded, linear/large corrections). */
  private def hllEstSql(rel: String, p: String): String =
    s"""${p}g AS (SELECT g, count(*) AS filled,
       |    sum(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << maxr) AS DOUBLE)) AS hs
       |  FROM $rel GROUP BY 1),
       |${p}e AS (SELECT g, 256 - filled AS zeros,
       |    (CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
       |        + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
       |      * CAST(65536 AS DOUBLE)
       |      / (hs + CAST(256 - filled AS DOUBLE)) AS eraw
       |  FROM ${p}g),
       |${p}s AS (SELECT g, round(CASE
       |    WHEN eraw <= CAST(640 AS DOUBLE) AND zeros > 0
       |      THEN CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE) / CAST(zeros AS DOUBLE))
       |    WHEN eraw > CAST(4294967296 AS DOUBLE) / CAST(30 AS DOUBLE)
       |      THEN -CAST(4294967296 AS DOUBLE)
       |        * ln(CAST(1 AS DOUBLE) - eraw / CAST(4294967296 AS DOUBLE))
       |    ELSE eraw END, 6) AS v FROM ${p}e)""".stripMargin

  /** q153 helper: the guarded bottom-k sketch over `rel` (columns
    * (g, tok)) with per-g thresholds from `estRel` (`(g, v)`) — ends at
    * `${p}k(g, hv)`, the k = 256 smallest distinct salted hashes. */
  private def bkChainSql(rel: String, estRel: String, p: String): String =
    s"""${p}t AS (SELECT g, CAST(ceil(least(CAST(1 AS DOUBLE),
       |      CAST(1024 AS DOUBLE) / greatest(v * CAST(0.8 AS DOUBLE),
       |        CAST(1 AS DOUBLE)))
       |    * CAST(4294967296 AS DOUBLE)) AS BIGINT) AS thr FROM $estRel),
       |${p}v AS (SELECT DISTINCT $rel.g, md5(tok || ':graft:bk') AS hv
       |  FROM $rel JOIN ${p}t ON ${p}t.g = $rel.g
       |  WHERE CAST(('0x' || substr(md5(tok || ':graft:bk'), 1, 8)) AS BIGINT)
       |    < ${p}t.thr),
       |${p}k AS (SELECT g, hv FROM (SELECT g, hv,
       |    row_number() OVER (PARTITION BY g ORDER BY hv) AS rk FROM ${p}v)
       |  WHERE rk <= 256)""".stripMargin

  /** q153 helper: log-histogram p50/p90 midpoints over `rel` (columns
    * (g, v)) — ends at `${p}q(g, p50, p90)` (q149's bucket machinery). */
  private def lhQuantSql(rel: String, p: String): String =
    s"""${p}b AS (SELECT g, v, greatest(length(bin(v)) - 6, 0) AS sh FROM $rel),
       |${p}k AS (SELECT g, (v >> sh) << sh AS lo,
       |    (CAST(1 AS BIGINT) << sh) AS w FROM ${p}b),
       |${p}sk AS (SELECT g, lo, w, count(*) AS c FROM ${p}k GROUP BY 1, 2, 3),
       |${p}cm AS (SELECT g, lo, w, c,
       |    CAST(sum(c) OVER (PARTITION BY g ORDER BY lo) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n FROM ${p}sk),
       |${p}sel AS (SELECT g, q,
       |    CAST(lo + lo + w - 1 AS DOUBLE) / CAST(2 AS DOUBLE) AS mid
       |  FROM ${p}cm CROSS JOIN
       |    (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS q) qq
       |  WHERE cum >= greatest(1, CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT))
       |    AND cum - c < greatest(1, CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT))),
       |${p}q AS (SELECT g,
       |    min(CASE WHEN q = CAST(0.5 AS DOUBLE) THEN mid END) AS p50,
       |    min(CASE WHEN q = CAST(0.9 AS DOUBLE) THEN mid END) AS p90
       |  FROM ${p}sel GROUP BY 1)""".stripMargin

  /** q153: the onboarding replay — the four HLL chains (vocab + guard ×
    * existing/incoming), the union-register estimate per source, the
    * guarded bottom-k pair rank, and the length-quantile pivots, joined
    * into one report row per held source. */
  private val onboardingSql: String =
    s"""WITH ex AS (SELECT source AS g, unnest($docToksC) AS tok
       |  FROM documents WHERE source <> 'src19'),
       |nw AS (SELECT 'new' AS g, unnest($docToksC) AS tok
       |  FROM documents WHERE source = 'src19'),
       |${hllRegChainSql("ex", "graft:hll", "x")},
       |${hllEstSql("xm", "xe")},
       |${hllRegChainSql("nw", "graft:hll", "n")},
       |${hllEstSql("nm", "ne")},
       |um AS (SELECT g, reg, max(maxr) AS maxr FROM (
       |    SELECT g, reg, maxr FROM xm
       |    UNION ALL
       |    SELECT sg.g, nm.reg, nm.maxr
       |    FROM (SELECT DISTINCT g FROM xm) sg CROSS JOIN nm)
       |  GROUP BY 1, 2),
       |${hllEstSql("um", "ue")},
       |vocab AS (SELECT xes.g, xes.v AS est_vocab_src,
       |    (SELECT v FROM nes) AS est_vocab_new,
       |    round(xes.v + (SELECT v FROM nes) - ues.v, 6) AS est_inter
       |  FROM xes JOIN ues USING (g)),
       |${hllRegChainSql("ex", "graft:bk:guard", "gx")},
       |${hllEstSql("gxm", "gxe")},
       |${hllRegChainSql("nw", "graft:bk:guard", "gn")},
       |${hllEstSql("gnm", "gne")},
       |${bkChainSql("ex", "gxes", "bx")},
       |${bkChainSql("nw", "gnes", "bn")},
       |pu AS (SELECT g, hv, coalesce(ina, 0) AS ina, coalesce(inb, 0) AS inb
       |  FROM (SELECT g, hv, CAST(1 AS BIGINT) AS ina FROM bxk) a
       |  FULL JOIN (SELECT sg.g, bnk.hv, CAST(1 AS BIGINT) AS inb
       |    FROM (SELECT DISTINCT g FROM bxk) sg CROSS JOIN bnk) b
       |  USING (g, hv)),
       |jac AS (SELECT g, round(CAST(sum(ina * inb) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE), 6) AS est_jaccard
       |  FROM (SELECT *, row_number() OVER (PARTITION BY g ORDER BY hv) AS rk
       |    FROM pu) WHERE rk <= 256 GROUP BY 1),
       |lex AS (SELECT source AS g, len($docToksC) AS v
       |  FROM documents WHERE source <> 'src19'),
       |lnw AS (SELECT 'new' AS g, len($docToksC) AS v
       |  FROM documents WHERE source = 'src19'),
       |${lhQuantSql("lex", "qx")},
       |${lhQuantSql("lnw", "qn")}
       |SELECT vocab.g AS source, est_vocab_src, est_vocab_new, est_inter,
       |  jac.est_jaccard, qxq.p50 AS p50_src, qxq.p90 AS p90_src,
       |  (SELECT p50 FROM qnq) AS p50_new, (SELECT p90 FROM qnq) AS p90_new
       |FROM vocab JOIN jac USING (g) JOIN qxq USING (g)
       |ORDER BY source""".stripMargin

  /** q151: the Moore-Lewis replay — q90's header CTEs scored under TWO
    * models ([[pplModelCtes]] with prefixes a/b: in-domain = English docs
    * of src0-src3, general = the whole corpus), per-doc 6-dp means, the
    * 6-dp score difference, and the selection cut as one
    * (ml_score ASC, doc_id) rank window over the scorable docs —
    * equivalent to the engine's histogram-CDF cutoff + boundary tie-fill
    * (the q94 argument, ascending). */
  private val crossEntropySelectSql: String =
    s"""$pplHeaderCtes,
       |${pplModelCtes("lang = 'en' AND source IN ('src0','src1','src2','src3')", "a")},
       |${pplModelCtes("TRUE", "b")},
       |sc2 AS (SELECT d.doc_id, d.lang,
       |    CAST(coalesce(af.lm_grams, 0) AS BIGINT) AS ml_grams,
       |    CASE WHEN af.lm_grams > 0 THEN round(af.s / af.lm_grams, 6) END AS nll_in,
       |    CASE WHEN bf.lm_grams > 0 THEN round(bf.s / bf.lm_grams, 6) END AS nll_gen
       |  FROM documents d LEFT JOIN af ON af.doc_id = d.doc_id
       |    LEFT JOIN bf ON bf.doc_id = d.doc_id),
       |ml AS (SELECT *, round(nll_in - nll_gen, 6) AS ml_score FROM sc2),
       |ns AS (SELECT count(*) AS n FROM ml WHERE ml_score IS NOT NULL),
       |rnk AS (SELECT doc_id, row_number() OVER (ORDER BY ml_score, doc_id) AS r
       |  FROM ml WHERE ml_score IS NOT NULL)
       |SELECT ml.doc_id, ml.lang, ml.ml_grams, ml.nll_in, ml.nll_gen, ml.ml_score,
       |  coalesce(rnk.r <= CAST(ceil(CAST(0.25 AS DOUBLE) * CAST(ns.n AS DOUBLE))
       |    AS BIGINT), FALSE) AS selected
       |FROM ml LEFT JOIN rnk USING (doc_id) CROSS JOIN ns
       |ORDER BY doc_id""".stripMargin

  private val bruteCosineSql =
    s"""WITH $cosineCtes,
       |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
       |        round(list_sum(list_transform(range(1, 65),
       |          k -> a.v[k]*b.v[k])) / (a.nrm*b.nrm), 6) AS cos_sim
       |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |SELECT id1, id2, cos_sim FROM p WHERE cos_sim >= 0.4
       |ORDER BY id1, id2""".stripMargin

  /** Full hyperplane-LSH ANN pipeline in SQL, mirroring Similarity.annLshTopK
    * bit-for-bit: quantized integer projections onto LCG planes → 16-bit
    * signature → 4 bands of 4 bits → any-band candidate join → exact cosine
    * re-rank with deterministic tie-break. */
  private val annLshSql: String = {
    def comp(p: Int) = s"((($p*1000003 + d) * 2654435761) % 2000003 - 1000001)"
    val projs = (0 until 16).map { p =>
      s"list_sum(list_transform(range(0, 64), d -> qv[d+1] * ${comp(p)})) AS pj_$p"
    }.mkString(",\n|  ")
    val bandCols = (0 until 4).map { b =>
      val terms = (0 until 4)
        .map(r => s"(CASE WHEN pj_${b * 4 + r} >= 0 THEN ${1 << r} ELSE 0 END)")
        .mkString(" + ")
      s"($terms) AS band$b"
    }.mkString(",\n|  ")
    s"""WITH $cosineCtes,
       |qz AS (SELECT vec_id, v, nrm,
       |  list_transform(v, x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS qv FROM n),
       |pj AS (SELECT vec_id, v, nrm,
       |  $projs
       |  FROM qz),
       |sg AS (SELECT vec_id, v, nrm,
       |  $bandCols
       |  FROM pj),
       |qs AS (SELECT * FROM sg WHERE vec_id < 10),
       |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS id
       |  FROM sg c JOIN qs q ON c.vec_id <> q.vec_id
       |    AND (c.band0 = q.band0 OR c.band1 = q.band1
       |      OR c.band2 = q.band2 OR c.band3 = q.band3)),
       |p2 AS (SELECT cand.qid, cand.id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, 65),
       |      k -> q.v[k]*c.v[k])) / (q.nrm*c.nrm), 6) AS cos_sim
       |  FROM cand JOIN sg c ON cand.id = c.vec_id JOIN qs q ON cand.qid = q.vec_id),
       |r AS (SELECT qid, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM p2)
       |SELECT qid, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  /** Full IVF-ANN pipeline in SQL, mirroring Similarity.annIvfTopK: pivot
    * cells = the 16 smallest ids (ORDER BY id LIMIT 16, mirroring
    * firstIdPivots — id-domain-agnostic, unlike a `vec_id < 16` predicate),
    * nearest-pivot assignment and probe ranking on
    * 6-dp-rounded cosines with pivot-id tie-breaks, exact re-rank of the 4
    * probed cells' members. */
  private val annIvfSql: String =
    s"""WITH $cosineCtes,
       |pv AS (SELECT vec_id AS pid, v AS pv, nrm AS pnrm FROM n
       |       ORDER BY vec_id LIMIT 16),
       |asg AS (SELECT c.vec_id AS id, c.v, c.nrm, pid,
       |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
       |      round(list_sum(list_transform(range(1, 65),
       |        k -> c.v[k]*pv[k])) / (c.nrm*pnrm), 6) DESC, pid) AS rn
       |  FROM n c CROSS JOIN pv),
       |cells AS (SELECT id, v, nrm, pid AS cell FROM asg WHERE rn = 1),
       |qp AS (SELECT q.vec_id AS qid, q.v AS qv, q.nrm AS qnrm, pid,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |      round(list_sum(list_transform(range(1, 65),
       |        k -> q.v[k]*pv[k])) / (q.nrm*pnrm), 6) DESC, pid) AS rn
       |  FROM n q CROSS JOIN pv WHERE q.vec_id < 10),
       |probes AS (SELECT qid, qv, qnrm, pid AS cell FROM qp WHERE rn <= 4),
       |cand AS (SELECT p.qid, c.id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, 65),
       |      k -> p.qv[k]*c.v[k])) / (p.qnrm*c.nrm), 6) AS cos_sim
       |  FROM probes p JOIN cells c ON p.cell = c.cell AND c.id <> p.qid),
       |r AS (SELECT qid, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM cand)
       |SELECT qid, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  /** Two fixed-point spherical-Lloyd iterations + the IVF probe/re-rank in
    * SQL, mirroring `annIvfKMeansTopK(nCells=8, nProbe=2, iters=2)`
    * bit-for-bit. Determinism chain: seeds are the 8 distinct vectors with
    * smallest ids (relabeled 0..7); each member's unit-direction components
    * quantize to `floor((v_d/nrm)·10⁶)` BIGINTs whose per-(cell, dim) SUM
    * is exact-integer; the mean is the literal `(s / 1e6) / n` double
    * chain; the norm sums squared means in dimension order (list_sum ==
    * the Scala array fold); the new centroid round-trips through FLOAT
    * exactly as the Scala side stores Array[Float]. Assignments order by
    * `round(cos, 6) DESC, pid` on both sides. Zero-norm vectors are
    * excluded from centroid computation (np) but assigned at serve time
    * (n), matching kmeansLloyd's filter. */
  private val annIvfKmeansSql: String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), k -> $a[k]*$b[k]))"
    def iterCtes(i: Int): String =
      s"""asg$i AS (SELECT c.vec_id AS id, c.v, c.nrm, pid,
         |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
         |      round(${dot("c.v", "pv")} / (c.nrm*pnrm), 6) DESC, pid) AS rn
         |  FROM np c CROSS JOIN cent$i),
         |qs$i AS (SELECT pid, r.d AS d,
         |    SUM(CAST(floor((v[r.d+1] / nrm) * 1000000.0) AS BIGINT)) AS s,
         |    COUNT(*) AS n
         |  FROM (SELECT pid, v, nrm FROM asg$i WHERE rn = 1), range(64) r(d)
         |  GROUP BY pid, r.d),
         |ml$i AS (SELECT pid, list((CAST(s AS DOUBLE) / 1000000.0) / n ORDER BY d) AS ml
         |  FROM qs$i GROUP BY pid),
         |mn$i AS (SELECT pid, ml,
         |    sqrt(list_sum(list_transform(ml, x -> x*x))) AS mn FROM ml$i),
         |cent${i + 1}p AS (SELECT c.pid,
         |    CASE WHEN m.pid IS NULL OR m.mn = 0 THEN c.pv
         |         ELSE list_transform(m.ml, x -> CAST(CAST(x / m.mn AS FLOAT) AS DOUBLE))
         |    END AS pv
         |  FROM cent$i c LEFT JOIN mn$i m ON c.pid = m.pid),
         |cent${i + 1} AS (SELECT pid, pv,
         |    sqrt(list_sum(list_transform(pv, x -> x*x))) AS pnrm
         |  FROM cent${i + 1}p)""".stripMargin
    s"""WITH $cosineCtes,
       |np AS (SELECT vec_id, v, nrm FROM n WHERE nrm > 0),
       |seed AS (SELECT v, min(vec_id) AS mid FROM np GROUP BY v ORDER BY mid LIMIT 8),
       |cent0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY mid) - 1 AS BIGINT) AS pid,
       |    v AS pv, sqrt(list_sum(list_transform(v, x -> x*x))) AS pnrm FROM seed),
       |${iterCtes(0)},
       |${iterCtes(1)},
       |fasg AS (SELECT c.vec_id AS id, c.v, c.nrm, pid,
       |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
       |      round(${dot("c.v", "pv")} / (c.nrm*pnrm), 6) DESC, pid) AS rn
       |  FROM n c CROSS JOIN cent2),
       |cells AS (SELECT id, v, nrm, pid AS cell FROM fasg WHERE rn = 1),
       |qp AS (SELECT q.vec_id AS qid, q.v AS qv, q.nrm AS qnrm, pid,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |      round(${dot("q.v", "pv")} / (q.nrm*pnrm), 6) DESC, pid) AS rn
       |  FROM n q CROSS JOIN cent2 WHERE q.vec_id < 10),
       |probes AS (SELECT qid, qv, qnrm, pid AS cell FROM qp WHERE rn <= 2),
       |cand AS (SELECT p.qid, c.id AS neighbor_id,
       |    round(${dot("p.qv", "c.v")} / (p.qnrm*c.nrm), 6) AS cos_sim
       |  FROM probes p JOIN cells c ON p.cell = c.cell AND c.id <> p.qid),
       |r AS (SELECT qid, neighbor_id, cos_sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
       |  FROM cand)
       |SELECT qid, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  /** BPE pre-tokenizer pattern with SQL quote escaping; DuckDB's RE2 and
    * Java regex agree on this lookahead-free pattern. */
  private val bpeSqlPattern = graft.ext.TextStats.BpePattern.replace("'", "''")

  /** Shared CTE chain: >=0.8-Jaccard pair graph → recursive transitive
    * closure (`reach`); cluster = min reachable id. Used by the q44
    * cluster listing, the q50 deduped-corpus anti-join, and (over the
    * exact-representative sub-corpus) the q51 terminal, so the oracles
    * cannot silently diverge. */
  /** Exact-Jaccard closure CTEs over `src` (doc_id, text). `p` prefixes
    * every CTE name so the fragment can coexist in a WITH list whose other
    * fragments (e.g. wpGreedySql's `e`) use the same short names; the
    * default "" keeps every existing oracle byte-identical. */
  private def jaccardClosureCtesOver(src: String, p: String = ""): String =
    s"""${shingleCtesOver(src, 4, p)},
       |${p}sz AS (SELECT doc_id, count(*) AS n FROM ${p}d GROUP BY 1),
       |${p}co AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
       |       FROM ${p}d a JOIN ${p}d b ON a.g=b.g AND a.doc_id<b.doc_id GROUP BY 1,2),
       |${p}j AS (SELECT id1, id2 FROM (SELECT id1, id2,
       |        CAST(c AS DOUBLE)/(s1.n+s2.n-c) AS jaccard
       |      FROM ${p}co JOIN ${p}sz s1 ON id1=s1.doc_id JOIN ${p}sz s2 ON id2=s2.doc_id)
       |      WHERE jaccard >= 0.8),
       |${p}e AS (SELECT id1, id2 FROM ${p}j UNION ALL SELECT id2, id1 FROM ${p}j),
       |${p}nodes AS (SELECT DISTINCT id1 AS id FROM ${p}e),
       |${p}reach(id, x) AS (
       |  SELECT id, id FROM ${p}nodes
       |  UNION
       |  SELECT ${p}reach.id, ${p}e.id2 FROM ${p}reach JOIN ${p}e ON ${p}reach.x = ${p}e.id1)""".stripMargin

  private val jaccardClosureCtes: String = jaccardClosureCtesOver("documents")

  /** q138's oracle: the ENTIRE composed crawl pipeline replayed in one
    * chain — fixture synthesis (token lines + closing sentence +
    * content-keyed lorem tail, q134-style URLs, embedding keys with the
    * plantNearDups LCG), then canonical-URL keep-best → URL rules → C4
    * clean+gate → Gopher over the CLEANED text → exact fingerprint dedup →
    * the exact-Jaccard closure (q51's recall-1.0 stand-in for MinHash) →
    * the cosine cell closure (q79's), each stage scoped to the prior
    * stage's survivors; fate = first stage whose survivor set misses the
    * doc.
    *
    * Every multiply-referenced CTE is marked AS MATERIALIZED: DuckDB
    * inlines plain CTEs per reference, so in a 40-CTE chain where each
    * stage reads the previous survivor set twice (next stage + fate CASE)
    * and the recursive closures re-read their edge lists per round, the
    * re-execution COMPOUNDS — measured >10 min at sf0.01 without the
    * hints, 0.2 s with them. */
  private def crawlPipelineSql: String = {
    val mat = Seq("raw", "pr", "eb", "fx", "ck", "c0", "j", "e", "j2", "ed2", "s1",
      "s2", "s3", "s4", "s5", "s6", "s7", "rdocs", "clusters", "cl2",
      "em", "nv", "cells2")
    mat.foldLeft(crawlPipelineSqlPlain) { (acc, n) =>
      acc.replace(s"\n$n AS (", s"\n$n AS MATERIALIZED (")
    }
  }

  private def crawlPipelineSqlPlain: String =
    s"""WITH RECURSIVE
       |raw AS (SELECT doc_id, n_chars, coalesce(text, '') AS rt FROM documents),
       |pr AS (SELECT greatest(count(*)*2//5, 1) AS np,
       |    greatest(least(count(*)//2,
       |      (SELECT count(*) FROM embeddings)), 1) AS ek FROM documents),
       |tk AS (SELECT doc_id,
       |    string_split_regex(lower(trim(replace(rt, chr(11), ' '))), '\\s+') AS t
       |  FROM raw),
       |ln AS (SELECT doc_id, t,
       |    greatest(CAST(ceil(len(t)/8.0) AS INT), 1) AS n FROM tk),
       |li AS (SELECT doc_id, t, unnest(range(0, n)) AS i FROM ln),
       |bl AS (SELECT doc_id, i,
       |    array_to_string(t[i*8+1 : i*8+8], ' ') || '.' AS line FROM li),
       |bd AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS b
       |  FROM bl GROUP BY 1),
       |fx AS (SELECT r.doc_id, r.n_chars,
       |    b || chr(10) || 'that is all we have with the data.'
       |    || (CASE WHEN CAST(('0x' || substr(md5(r.rt), 1, 8)) AS BIGINT) % 13 = 0
       |        THEN chr(10) || 'lorem ipsum boilerplate tail.' ELSE '' END) AS text,
       |    'http' || (CASE WHEN r.doc_id % 2 = 0 THEN 's' ELSE '' END) || '://'
       |    || (CASE WHEN r.doc_id % 3 = 0 THEN 'www.' ELSE '' END)
       |    || 'example' || CAST((r.doc_id % (SELECT np FROM pr)) % 4 AS VARCHAR)
       |    || '.com/page/' || CAST(r.doc_id % (SELECT np FROM pr) AS VARCHAR)
       |    || (CASE WHEN r.doc_id % 5 = 0 THEN '/' ELSE '' END)
       |    || (CASE WHEN r.doc_id % 7 = 0 THEN '?utm_source=feed' ELSE '' END)
       |    || (CASE WHEN r.doc_id % 11 = 0 THEN '#frag' ELSE '' END) AS url
       |  FROM raw r JOIN bd USING (doc_id)),
       |ck AS (SELECT doc_id, n_chars,
       |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |    regexp_replace(regexp_replace(regexp_replace(
       |    lower(coalesce(url, '')),
       |    '#.*$$', ''),
       |    '&(?:utm_[a-z0-9]+|gclid|fbclid|ref)=[^&#]*', '', 'g'),
       |    '\\?(?:utm_[a-z0-9]+|gclid|fbclid|ref)=[^&#]*&', '?'),
       |    '\\?(?:utm_[a-z0-9]+|gclid|fbclid|ref)=[^&#]*$$', ''),
       |    '^https://', 'http://'),
       |    '^http://www\\.', 'http://'),
       |    '/$$', '') AS k
       |  FROM fx),
       |s1 AS (SELECT doc_id FROM ck
       |  QUALIFY row_number() OVER (PARTITION BY k
       |    ORDER BY n_chars DESC, doc_id) = 1),
       |h0 AS (SELECT f.doc_id, f.url,
       |    regexp_extract(lower(f.url),
       |      '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1) AS host
       |  FROM fx f JOIN s1 USING (doc_id)),
       |d0 AS (SELECT doc_id, url, host, string_split(host, '.') AS labs,
       |    len(string_split(host, '.')) AS nl FROM h0),
       |r1 AS (SELECT doc_id, host,
       |    CASE WHEN regexp_matches(host, '^[0-9.]+$$') THEN host
       |         WHEN nl <= 2 THEN host
       |         WHEN (labs[nl-1] || '.' || labs[nl]) IN ('co.uk','org.uk',
       |           'ac.uk','gov.uk','net.uk','com.au','net.au','org.au',
       |           'co.jp','ne.jp','or.jp','com.br','com.cn','com.mx',
       |           'com.ar','com.tr','com.tw','co.in','co.kr','co.za',
       |           'com.sg','com.hk')
       |           THEN labs[nl-2] || '.' || labs[nl-1] || '.' || labs[nl]
       |         ELSE labs[nl-1] || '.' || labs[nl] END AS domain,
       |    length(url) AS url_len,
       |    CASE WHEN length(url) > 0
       |      THEN CAST(len(regexp_extract_all(url, '[0-9]')) AS DOUBLE)/length(url)
       |      ELSE 0.0 END AS digit_frac
       |  FROM d0),
       |s2 AS (SELECT doc_id FROM r1
       |  WHERE length(host) > 0 AND domain <> 'example3.com'
       |    AND url_len <= 2048 AND digit_frac <= CAST(0.5 AS DOUBLE)),
       |l0 AS (SELECT f.doc_id, f.text AS tx,
       |    list_filter(string_split(f.text, chr(10)),
       |      l -> len(trim(l)) > 0) AS lns
       |  FROM fx f JOIN s2 USING (doc_id)),
       |k0 AS (SELECT doc_id, tx, lns,
       |    list_filter(lns, l -> regexp_matches(trim(l), '[.!?"]$$')
       |      AND len(list_filter(string_split_regex(trim(l), '\\s+'),
       |            w -> len(w) > 0)) >= 5
       |      AND NOT contains(lower(l), 'javascript')) AS keptl
       |  FROM l0),
       |c0 AS (SELECT doc_id, tx,
       |    coalesce(array_to_string(keptl, chr(10)), '') AS ct FROM k0),
       |s3 AS (SELECT doc_id FROM c0
       |  WHERE len(regexp_extract_all(ct, '[.!?]')) >= 3
       |    AND NOT contains(lower(tx), 'lorem ipsum')
       |    AND NOT contains(tx, '{')),
       |g0 AS (SELECT c0.doc_id, c0.ct AS tx,
       |    string_split_regex(lower(trim(c0.ct)), '\\s+') AS gt
       |  FROM c0 JOIN s3 USING (doc_id)),
       |w0 AS (SELECT doc_id,
       |    len(list_filter(gt, x -> len(x) > 0)) AS n_words,
       |    list_sum(list_transform(gt, x -> CAST(len(x) AS BIGINT))) AS char_sum,
       |    len(regexp_extract_all(tx, '#'))
       |      + len(regexp_extract_all(tx, '\\.\\.\\.')) AS n_symbols,
       |    list_filter(string_split_regex(tx, '\\n'),
       |      l -> len(trim(l)) > 0) AS lns,
       |    len(list_filter(gt, x -> regexp_matches(x, '\\p{L}'))) AS n_alpha,
       |    len(list_filter(['the','be','to','of','and','that','have','with'],
       |      sw -> list_contains(gt, sw))) AS stop_hits
       |  FROM g0),
       |s4 AS (SELECT doc_id FROM w0
       |  WHERE n_words BETWEEN 50 AND 100000
       |    AND n_words > 0
       |    AND CAST(char_sum AS DOUBLE)/n_words BETWEEN 3.0 AND 10.0
       |    AND CAST(n_symbols AS DOUBLE)/n_words <= 0.1
       |    AND len(lns) > 0 AND CAST(len(list_filter(lns,
       |        l -> regexp_matches(trim(l), '^[-*•‣▪]')))
       |        AS DOUBLE)/len(lns) <= 0.9
       |    AND CAST(len(list_filter(lns,
       |        l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$')))
       |        AS DOUBLE)/len(lns) <= 0.3
       |    AND CAST(n_alpha AS DOUBLE)/n_words >= 0.8
       |    AND stop_hits >= 2),
       |f0 AS (SELECT c0.doc_id,
       |    md5(regexp_replace(lower(trim(c0.ct)), '\\s+', ' ', 'g')) AS fp
       |  FROM c0 JOIN s4 USING (doc_id)),
       |s5 AS (SELECT min(doc_id) AS doc_id FROM f0 GROUP BY fp),
       |rdocs AS (SELECT c0.doc_id, c0.ct AS text FROM c0 JOIN s5 USING (doc_id)),
       |${jaccardClosureCtesOver("rdocs")},
       |clusters AS (SELECT id, min(x) AS cluster FROM reach GROUP BY id),
       |s6 AS (SELECT doc_id FROM rdocs
       |  WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster)),
       |eb AS (SELECT vec_id % (SELECT ek FROM pr) AS vk, embedding
       |  FROM embeddings
       |  QUALIFY row_number() OVER (PARTITION BY vec_id % (SELECT ek FROM pr)
       |    ORDER BY vec_id) = 1),
       |em AS (SELECT s6.doc_id AS id,
       |    CASE WHEN s6.doc_id < (SELECT ek FROM pr) THEN e.embedding
       |         ELSE list_transform(range(0, 64),
       |           dd -> CAST(CAST(e.embedding[dd+1] AS DOUBLE)
       |             + CAST(0.01 AS DOUBLE) * CAST((s6.doc_id*131 + dd*7919)
       |               % 1000003 * 2654435761 % 2000003 - 1000001 AS DOUBLE)
       |             / CAST(1000001.0 AS DOUBLE) AS REAL))
       |    END AS emb
       |  FROM s6 JOIN eb e ON e.vk = s6.doc_id % (SELECT ek FROM pr)),
       |ev AS (SELECT id, list_transform(emb, x -> CAST(x AS DOUBLE)) AS v
       |  FROM em),
       |nv AS (SELECT id, v,
       |    sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM ev),
       |piv2 AS (SELECT id AS pid, v AS pv, nrm AS pnrm FROM nv
       |  ORDER BY id LIMIT 16),
       |asg2 AS (SELECT c.id, c.v, c.nrm, pid,
       |    ROW_NUMBER() OVER (PARTITION BY c.id ORDER BY
       |      round(list_sum(list_transform(range(1, 65),
       |        kk -> c.v[kk]*pv[kk])) / (c.nrm*pnrm), 6) DESC, pid) AS rn
       |  FROM nv c CROSS JOIN piv2),
       |cells2 AS (SELECT id, v, nrm, pid AS cell FROM asg2 WHERE rn = 1),
       |j2 AS (SELECT a.id AS id1, b.id AS id2
       |      FROM cells2 a JOIN cells2 b ON a.cell = b.cell AND a.id < b.id
       |      WHERE round(list_sum(list_transform(range(1, 65),
       |        kk -> a.v[kk]*b.v[kk])) / (a.nrm*b.nrm), 6) >= 0.95),
       |ed2 AS (SELECT id1, id2 FROM j2 UNION ALL SELECT id2, id1 FROM j2),
       |nodes2 AS (SELECT DISTINCT id1 AS id FROM ed2),
       |reach2(id, x) AS (SELECT id, id FROM nodes2
       |  UNION
       |  SELECT reach2.id, ed2.id2 FROM reach2 JOIN ed2 ON reach2.x = ed2.id1),
       |cl2 AS (SELECT id, min(x) AS cluster FROM reach2 GROUP BY id),
       |s7 AS (SELECT doc_id FROM s6
       |  WHERE doc_id NOT IN (SELECT id FROM cl2 WHERE cluster < id))
       |SELECT r.doc_id,
       |  CASE WHEN r.doc_id NOT IN (SELECT doc_id FROM s1) THEN 'url_dedup'
       |       WHEN r.doc_id NOT IN (SELECT doc_id FROM s2) THEN 'url_rules'
       |       WHEN r.doc_id NOT IN (SELECT doc_id FROM s3) THEN 'c4'
       |       WHEN r.doc_id NOT IN (SELECT doc_id FROM s4) THEN 'gopher'
       |       WHEN r.doc_id NOT IN (SELECT doc_id FROM s5) THEN 'exact'
       |       WHEN r.doc_id NOT IN (SELECT doc_id FROM s6) THEN 'neardup'
       |       WHEN r.doc_id NOT IN (SELECT doc_id FROM s7) THEN 'semantic'
       |       ELSE 'kept' END AS fate
       |FROM raw r ORDER BY doc_id""".stripMargin

  private val dedupClustersSql: String =
    s"""WITH RECURSIVE $jaccardClosureCtes
       |SELECT id, min(x) AS cluster FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** BM25 replay (q156/q157 and q159's sparse half): postings as one
    * grouped unnest, df from the query-term-filtered postings under the
    * queries' maxDfFrac = 1.0 cap (the fixture's 31-word vocabulary is
    * closed — see the q156 comment), Lucene idf over exact integers, tf
    * normalization
    * with the corpus statistics (n, sum_len) — every double division
    * written in the Spark side's association order — each contribution
    * floored onto the 1e-6 integer grid, so the per-(qid, doc) score is an
    * exact BIGINT sum surfaced as sum/10⁶. `queryWhere`
    * selects the query documents; emits CTEs ending at `${p}r` =
    * (qid, doc_id, n_terms, score, rnk). */
  private def bm25Ctes(queryWhere: String, p: String): String =
    s"""${p}t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |${p}po AS (SELECT doc_id AS id, CAST(len(toks) AS BIGINT) AS len,
       |    term, count(*) AS tf
       |  FROM (SELECT doc_id, toks, unnest(toks) AS term FROM ${p}t)
       |  GROUP BY 1, 2, 3),
       |${p}nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(len(toks)) AS BIGINT) AS sl FROM ${p}t),
       |${p}qt AS (SELECT DISTINCT doc_id AS qid, unnest(toks) AS term
       |  FROM ${p}t WHERE $queryWhere),
       |${p}hit AS (SELECT * FROM ${p}po
       |  WHERE term IN (SELECT DISTINCT term FROM ${p}qt)),
       |${p}dfa AS (SELECT term, count(*) AS df FROM ${p}hit GROUP BY 1),
       |${p}dfc AS (SELECT term, df FROM ${p}dfa, ${p}nn
       |  WHERE df <= greatest(CAST(1 AS BIGINT),
       |    CAST(trunc(CAST(1.0 AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT))),
       |${p}sc AS (SELECT qt.qid, h.id, h.term,
       |    CAST(floor(ln(CAST(1 AS DOUBLE) +
       |       (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
       |       (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
       |    * (CAST(h.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE)) /
       |       (CAST(h.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
       |        ((CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
       |         CAST(0.75 AS DOUBLE) * CAST(h.len AS DOUBLE) /
       |         (CAST(sl AS DOUBLE) / CAST(n AS DOUBLE)))))
       |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS c6
       |  FROM ${p}hit h JOIN ${p}dfc USING (term) JOIN ${p}qt qt USING (term),
       |    ${p}nn),
       |${p}ag AS (SELECT qid, id AS doc_id, count(*) AS n_terms,
       |    CAST(sum(c6) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS score
       |  FROM ${p}sc GROUP BY 1, 2),
       |${p}r AS (SELECT qid, doc_id, n_terms, score,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY score DESC, doc_id) AS INT) AS rnk
       |  FROM ${p}ag)""".stripMargin

  private def bm25TopkSql: String =
    s"""WITH ${bm25Ctes("doc_id % 37 = 0", "")}
       |SELECT qid, doc_id, n_terms, score, rnk AS "rank" FROM r
       |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin

  // the store replay: build(2/3) + append(1/3) must equal from-scratch
  // over the union, so the oracle IS plain BM25 over all of documents
  private def bm25IndexedSql: String =
    s"""WITH ${bm25Ctes("doc_id % 41 = 0", "")}
       |SELECT qid, doc_id, n_terms, score, rnk AS "rank" FROM r
       |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin

  // CUME_DIST is tie-invariant (fraction of rows <= this value), so the
  // plain window replay equals the Spark side's histogram-CDF exactly:
  // same integer counts, same single double division
  private def qnormBySourceSql: String =
    s"""WITH t AS (SELECT doc_id, source, $docToks AS toks FROM documents),
       |s AS (SELECT doc_id, source,
       |    round(CAST(len(list_filter(toks, x -> list_contains(
       |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
       |      / len(toks), 6) AS s6 FROM t),
       |c AS (SELECT doc_id, source, s6,
       |    cume_dist() OVER (PARTITION BY source ORDER BY s6) AS q_norm
       |  FROM s)
       |SELECT doc_id, source, s6 AS stop_r6, q_norm,
       |  q_norm > (CAST(1 AS DOUBLE) - CAST(0.5 AS DOUBLE)) AS kept
       |FROM c ORDER BY doc_id""".stripMargin

  // full hybrid replay: BM25 CTEs (b-prefixed) + the q38 dense cosine
  // CTEs + the RRF sum over 1e-6-grid addends (exact integers)
  private def hybridRrfSql: String =
    s"""WITH ${bm25Ctes("doc_id % 53 = 0", "b")},
       |$cosineCtes,
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM n
       |  WHERE vec_id % 53 = 0),
       |dp AS (SELECT q.qid, n.vec_id AS doc_id,
       |    round(list_sum(list_transform(range(1, 65),
       |      k -> q.qv[k]*n.v[k])) / (q.qnrm*n.nrm), 6) AS cos_sim
       |  FROM n, q WHERE n.vec_id <> q.qid),
       |dr AS (SELECT qid, doc_id,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cos_sim DESC, doc_id) AS INT) AS rnk
       |  FROM dp),
       |fu AS (
       |  SELECT qid, doc_id, rnk FROM br WHERE rnk <= 20
       |  UNION ALL
       |  SELECT qid, doc_id, rnk FROM dr WHERE rnk <= 20),
       |fa AS (SELECT qid, doc_id, count(*) AS n_lists,
       |    CAST(sum(CAST(floor(CAST(1 AS DOUBLE) /
       |      (CAST(60 AS DOUBLE) + CAST(rnk AS DOUBLE))
       |      * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
       |      / CAST(1000000 AS DOUBLE) AS rrf_score
       |  FROM fu GROUP BY 1, 2),
       |fr AS (SELECT qid, doc_id, n_lists, rrf_score,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY rrf_score DESC, doc_id) AS INT) AS rnk
       |  FROM fa)
       |SELECT qid, doc_id, n_lists, rrf_score, rnk AS "rank" FROM fr
       |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin

  // q44's recursive closure feeding the q53 md5-bucket split keyed by the
  // cluster representative; singletons coalesce to their own id
  private def leakFreeSplitSql: String =
    s"""WITH RECURSIVE $jaccardClosureCtes,
       |cl AS (SELECT id, min(x) AS cluster FROM reach GROUP BY id),
       |w AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.id),
       |b AS (SELECT doc_id, cluster,
       |    CAST(CAST(('0x' || substr(md5(cluster || ':graft:split'), 1, 8))
       |      AS BIGINT) % 10000 AS INT) AS bucket FROM w)
       |SELECT doc_id, cluster, bucket,
       |  CASE WHEN bucket < 8000 THEN 'train'
       |       WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin

  /** The three power-iteration rounds unrolled: all-BIGINT micro-rank
    * algebra (`//` floors exactly like Spark's `div`), dangling mass and
    * the base term re-derived per round from the same node count. */
  private def hostRankSql: String = {
    def round(i: Int): String =
      s"""d$i AS (SELECT coalesce(sum(r6), 0) AS dang FROM r$i WHERE outdeg = 0),
         |c$i AS (SELECT e.dst AS host, sum(r.r6 // r.outdeg) AS in6
         |  FROM r$i r JOIN e ON r.host = e.src WHERE r.outdeg > 0 GROUP BY 1),
         |r${i + 1} AS (SELECT r.host, r.outdeg,
         |    (SELECT ((100 - 85) * 10000) // n FROM nn)
         |    + (85 * (coalesce(c.in6, 0)
         |        + (SELECT dang FROM d$i) // (SELECT n FROM nn))) // 100 AS r6
         |  FROM r$i r LEFT JOIN c$i c ON r.host = c.host)""".stripMargin
    s"""WITH e AS (SELECT DISTINCT
       |    'h' || CAST(doc_id % 40 AS VARCHAR) AS src,
       |    'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst
       |  FROM documents),
       |nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |od AS (SELECT src AS host, CAST(count(*) AS BIGINT) AS outdeg
       |  FROM e GROUP BY 1),
       |r0 AS (SELECT nodes.host, coalesce(od.outdeg, 0) AS outdeg,
       |    (SELECT CAST(1000000 AS BIGINT) // n FROM nn) AS r6
       |  FROM nodes LEFT JOIN od ON nodes.host = od.host),
       |${round(0)},
       |${round(1)},
       |${round(2)}
       |SELECT host, outdeg,
       |  CAST(r6 AS DOUBLE) / CAST(1000000 AS DOUBLE) AS rank
       |FROM r3 ORDER BY host""".stripMargin
  }

  // the page shell rebuilt with || concatenation, then the extractor chain
  // verbatim: script/style/comment subtrees, tag strip, entity decode in
  // the Spark side's order (&amp; last), whitespace collapse
  private def htmlExtractSql: String =
    s"""WITH h AS (SELECT doc_id,
       |    '<html><head><title>d' || CAST(doc_id AS VARCHAR) ||
       |    '</title><style>p{color:red}</style></head><body><h1>Doc ' ||
       |    CAST(doc_id AS VARCHAR) ||
       |    '</h1><!-- boilerplate --><p>' || text ||
       |    '</p><p>&quot;tail&quot; &lt;x&gt; &amp;amp;</p>' ||
       |    '<script>var z = "<p>not text</p>";</script></body></html>' AS html
       |  FROM documents),
       |x AS (SELECT doc_id,
       |    trim(regexp_replace(
       |      replace(replace(replace(replace(replace(replace(replace(
       |        regexp_replace(
       |          regexp_replace(
       |            regexp_replace(
       |              regexp_replace(html,
       |                '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       |            '(?s)<!--.*?-->', ' ', 'g'),
       |          '<[^>]*>', ' ', 'g'),
       |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |        '&#39;', ''''), '&apos;', ''''), '&amp;', '&'),
       |      '\\s+', ' ', 'g')) AS extracted
       |  FROM h)
       |SELECT doc_id, extracted, CAST(length(extracted) AS INT) AS n_chars_out
       |FROM x ORDER BY doc_id""".stripMargin

  // q44's closure + a (cluster, n) count + the 1/n division rounded 6 dp
  private def softDedupWeightsSql: String =
    s"""WITH RECURSIVE $jaccardClosureCtes,
       |cl AS (SELECT id, min(x) AS cluster FROM reach GROUP BY id),
       |w AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.id),
       |csz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_copies
       |  FROM w GROUP BY 1)
       |SELECT doc_id, cluster, n_copies,
       |  round(CAST(1 AS DOUBLE) / CAST(n_copies AS DOUBLE), 6) AS weight
       |FROM w JOIN csz USING (cluster) ORDER BY doc_id""".stripMargin

  // q164: the sorted single-partition write makes shard membership pure
  // arithmetic — shard i of the manifest IS rows [64i, 64i+63] of the
  // doc_id order, for both the parquet (footer-count) and JSONL
  // (line-count) manifest paths.
  private val writeShardsSql =
    """WITH d AS (SELECT doc_id,
      |    row_number() OVER (ORDER BY doc_id) - 1 AS rn FROM documents),
      |g AS (SELECT rn // 64 AS shard_idx, CAST(count(*) AS BIGINT) AS "rows",
      |    min(doc_id) AS min_id, max(doc_id) AS max_id
      |  FROM d GROUP BY 1),
      |f AS (SELECT 'parquet' AS format, * FROM g
      |  UNION ALL SELECT 'json' AS format, * FROM g)
      |SELECT format, shard_idx, "rows", "rows" AS rows_read, min_id, max_id,
      |  TRUE AS bytes_pos
      |FROM f ORDER BY format, shard_idx""".stripMargin

  // q165: blocks of equal-count types are interchangeable mass, so the
  // coverage at rank k is exact window algebra over the count-value
  // histogram — the same block arithmetic the Spark side runs via
  // prefixSum (integer sums: fold-order-free in both engines).
  private val vocabCoverageSql =
    """WITH toks AS (SELECT
      |    unnest(string_split_regex(lower(trim(replace(coalesce(text, ''), chr(11), ' '))), '\s+')) AS term
      |  FROM documents),
      |hist AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
      |blocks AS (SELECT c, CAST(count(*) AS BIGINT) AS n_types,
      |    c * CAST(count(*) AS BIGINT) AS toks_in FROM hist GROUP BY 1),
      |cum AS (SELECT c, n_types, toks_in,
      |    CAST(sum(n_types) OVER w AS BIGINT) AS cum_types,
      |    CAST(sum(toks_in) OVER w AS BIGINT) AS cum_toks
      |  FROM blocks
      |  WINDOW w AS (ORDER BY c DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (SELECT max(cum_types) AS types_total,
      |    max(cum_toks) AS tokens_total FROM cum),
      |kk AS (SELECT CAST(unnest([1, 5, 10, 31, 100]) AS BIGINT) AS k)
      |SELECT k, LEAST(k, types_total) AS types_used,
      |  (cum_toks - toks_in)
      |    + (LEAST(k, types_total) - (cum_types - n_types)) * c AS cum_tokens,
      |  tokens_total,
      |  round(CAST((cum_toks - toks_in)
      |      + (LEAST(k, types_total) - (cum_types - n_types)) * c AS DOUBLE)
      |    / CAST(tokens_total AS DOUBLE), 6) AS coverage
      |FROM kk, tot, cum
      |WHERE (cum_types - n_types) < LEAST(k, types_total)
      |  AND LEAST(k, types_total) <= cum_types
      |ORDER BY k""".stripMargin

  // q166: chr(233) = é (NFC), chr(769) = COMBINING ACUTE (the NFD tail);
  // DuckDB's utf8proc NFC and the JDK Normalizer agree on these (both
  // implement UAX #15), so the fp_nfc twins collapse in both engines.
  private val nfcDedupSql =
    """WITH d AS (SELECT doc_id, text FROM documents),
      |tw AS (SELECT doc_id * 2 AS doc_id, text || ' caf' || chr(233) AS text
      |    FROM d
      |  UNION ALL
      |  SELECT doc_id * 2 + 1, text || ' cafe' || chr(769) FROM d)
      |SELECT doc_id, md5(text) AS fp_raw,
      |  md5(nfc_normalize(text)) AS fp_nfc
      |FROM tw ORDER BY doc_id""".stripMargin

  // q167: DuckDB's strip_accents (utf8proc) vs the Spark side's
  // NFD+\p{Mn}-strip — two independent implementations of the same fold;
  // the planted literal is NFC-composed in both (the md5 would catch a
  // byte-level drift between the two query texts).
  private val accentFoldSql =
    """WITH f AS (SELECT doc_id, strip_accents(text ||
      |    ' crème brûlée déjà vu naïve façade niño über açaí') AS folded
      |  FROM documents)
      |SELECT doc_id, folded, md5(folded) AS fp
      |FROM f ORDER BY doc_id""".stripMargin

  // q168: the full SymSpell replay — delete-variant generation (distinct
  // per row, like the Spark side's array_distinct), the 1000-key
  // frequency cap, the variant equi-join, and the exact levenshtein
  // confirm. Both engines implement the same classic DP, so `dist`
  // matches bit-for-bit.
  private val typoPairsSql =
    """WITH base AS (SELECT doc_id,
      |    substr(text, 1, 16) || '-' || doc_id AS title FROM documents),
      |al AS (
      |  SELECT doc_id * 3 AS id, title FROM base
      |  UNION ALL SELECT doc_id * 3 + 1,
      |    substr(title, 1, 1) || substr(title, 3, 100) FROM base
      |  UNION ALL SELECT doc_id * 3 + 2,
      |    'z' || substr(title, 2, 100) FROM base),
      |vars AS (SELECT DISTINCT id, title, k FROM (
      |  SELECT id, title,
      |    unnest(list_prepend(title,
      |      list_transform(range(1, len(title) + 1),
      |        i -> substr(title, 1, CAST(i - 1 AS INT))
      |          || substr(title, CAST(i + 1 AS INT), 100)))) AS k
      |  FROM al)),
      |keep AS (SELECT k FROM vars GROUP BY 1 HAVING count(*) <= 1000),
      |v2 AS (SELECT id, title, k FROM vars JOIN keep USING (k)),
      |cand AS (SELECT DISTINCT a.id AS id1, b.id AS id2,
      |    a.title AS t1, b.title AS t2
      |  FROM v2 a JOIN v2 b USING (k) WHERE a.id < b.id)
      |SELECT id1, id2, CAST(levenshtein(t1, t2) AS INT) AS dist
      |FROM cand WHERE levenshtein(t1, t2) <= 1
      |ORDER BY id1, id2""".stripMargin

  // q169: survivors = arrivals with no catalog title within distance 1 —
  // the Bloom prefilter and variant join are recall-1.0 plumbing (SymSpell
  // invariant), so the exact-distance NOT EXISTS replays the semantics.
  private val incrementalTypoSql =
    """WITH base AS (SELECT doc_id,
      |    substr(text, 1, 16) || '-' || doc_id AS title FROM documents),
      |seen AS (SELECT title FROM base WHERE doc_id % 3 = 0),
      |arr AS (SELECT doc_id, title FROM base WHERE doc_id % 3 <> 0
      |  UNION ALL SELECT doc_id + 1000000,
      |    substr(title, 1, 1) || substr(title, 3, 100)
      |  FROM base WHERE doc_id % 3 = 0)
      |SELECT doc_id, title FROM arr a
      |WHERE NOT EXISTS (SELECT 1 FROM seen s
      |  WHERE levenshtein(a.title, s.title) <= 1)
      |ORDER BY doc_id""".stripMargin

  // q170: the byte-level pipeline replayed END TO END by DuckDB —
  // (1) the \s+(?!\S) lookahead (RE2 has no lookahead) is EMULATED by
  //     inserting an RS (chr 30) break before the last whitespace char of
  //     every run that precedes non-whitespace, then pre-tokenizing each
  //     RS-segment with the lookahead-free pattern: the break encodes
  //     exactly the split the lookahead would make, and no pre-token can
  //     span it (the segment after a break starts with the single space
  //     the ` ?X` alternatives attach);
  // (2) each pre-token's UTF-8 bytes are recovered via hex(encode(..)) and
  //     remapped through the published bytes→unicode stand-in alphabet
  //     (a 256-element list literal generated from the SAME table the
  //     Spark expression ships — the mapping is public constants, the
  //     MERGE ARITHMETIC is what the replay verifies independently);
  // (3) the q91 rank-order replace loop merges inside chr(31) wrapping;
  //     whitespace pre-tokens are KEPT (byte-level discipline).
  private val byteBpeSql: String = {
    val pat = graft.ext.TextStats.BpePattern.replace("'", "''")
    val btcSql = graft.funcs.BpeCodec.ByteToChar.map(c =>
      "'" + (if (c == '\'') "''" else c.toString) + "'")
      .mkString("[", ", ", "]")
    val vocabSql = q170Vocab.map(v => s"'${v.replace("'", "''")}'")
      .mkString("[", ", ", "]")
    s"""WITH base AS (SELECT doc_id,
       |    'The r' || chr(233) || 'sum' || chr(233) || ', it''s here   and '
       |      || regexp_replace(coalesce(text, ''),
       |           '$NonRe2WhitespaceRe2', ' ', 'g')
       |      || chr(10) || ' the end  ' AS t2
       |  FROM documents),
       |seg AS (SELECT doc_id,
       |    string_split(regexp_replace(t2, '(\\s)(\\S)', chr(30) || '\\1\\2',
       |      'g'), chr(30)) AS segs
       |  FROM base),
       |e1 AS (SELECT doc_id, segs, unnest(range(1, len(segs)+1)) AS si
       |  FROM seg),
       |e2 AS (SELECT doc_id, si,
       |    regexp_extract_all(segs[si], '$pat') AS pts FROM e1),
       |e3 AS (SELECT doc_id, si, pts, unnest(range(1, len(pts)+1)) AS pi
       |  FROM e2),
       |w AS (SELECT doc_id, si, pi,
       |    array_to_string(list_transform(
       |      regexp_extract_all(hex(encode(pts[pi])), '..'),
       |      p -> chr(31) || ($btcSql)[
       |          (strpos('0123456789ABCDEF', p[1]) - 1) * 16
       |            + strpos('0123456789ABCDEF', p[2])]
       |        || chr(31)), '') AS s0
       |  FROM e3),
       |mg AS (SELECT doc_id, si, pi,
       |    string_split(trim(${mergedExpr(q170Merges, "s0")}, chr(31)),
       |      chr(31)||chr(31)) AS tl
       |  FROM w),
       |f AS (SELECT doc_id, flatten(list(tl ORDER BY si, pi)) AS toks
       |  FROM mg GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(len(f.toks), 0) AS INT) AS bpe_count,
       |  coalesce(array_to_string(f.toks, chr(31)), '') AS bpe_str,
       |  coalesce(array_to_string(list_transform(f.toks,
       |    t -> CAST(coalesce(list_position($vocabSql, t) - 1, -1)
       |           AS VARCHAR)), ' '), '') AS bpe_ids_str
       |FROM documents d LEFT JOIN f USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // q171: the fuzzy join replayed as DuckDB's exact-levenshtein
  // theta-join — no variant machinery on the oracle side at all, the
  // strongest possible independence (recall 1.0 is the operator's claim;
  // the exact join is the definition it must match).
  private val typoJoinSql =
    """WITH base AS (SELECT doc_id,
      |    substr(text, 1, 16) || '-' || doc_id AS title FROM documents),
      |l AS (SELECT doc_id AS left_id, title AS lkey FROM base
      |  WHERE doc_id % 3 = 0),
      |r AS (SELECT doc_id AS right_id, title AS rkey FROM base
      |  WHERE doc_id % 3 <> 0
      |  UNION ALL SELECT doc_id + 1000000,
      |    substr(title, 1, 1) || substr(title, 3, 100)
      |  FROM base WHERE doc_id % 3 = 0)
      |SELECT l.left_id, r.right_id,
      |  CAST(levenshtein(l.lkey, r.rkey) AS INT) AS dist
      |FROM l, r WHERE levenshtein(l.lkey, r.rkey) <= 1
      |ORDER BY left_id, right_id""".stripMargin

  // q172: the greedy WordPiece loop replayed INDEPENDENTLY by DuckDB as a
  // recursive cursor state machine over the distinct-word table — per
  // step, the LONGEST vocabulary piece matching at the cursor
  // (list_filter for the matches, list_reduce for the argmax-by-length;
  // ties impossible: two same-length pieces matching the same position
  // are the same string), whole-word [UNK] when no piece matches or the
  // word exceeds 100 chars. Pre-tokenizer = lower + letter runs / digit
  // runs / single punctuation chars, BERT's split.
  /** Shared greedy-replay generator: q172 runs it with a fixed vocab and
    * the planted suffix, q173 with the TRAINED vocab plus `extraCtes`
    * (comma-terminated model-replay CTEs) and a selection `gateExpr` that
    * must hold for any row to surface. */
  private def wpGreedySql(vocabSql: String, tExpr: String,
                          extraCtes: String = "",
                          gateExpr: String = "TRUE",
                          tailSql: Option[String] = None,
                          fromRel: String = "documents"): String =
    s"""WITH RECURSIVE ${extraCtes}base AS (SELECT doc_id,
       |    $tExpr AS t
       |  FROM $fromRel),
       |pt AS (SELECT doc_id,
       |    regexp_extract_all(t, '\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]') AS pts
       |  FROM base),
       |e AS (SELECT doc_id, pts, unnest(range(1, len(pts)+1)) AS i FROM pt),
       |wpos AS (SELECT doc_id, i, pts[i] AS w FROM e),
       |words AS (SELECT DISTINCT w FROM wpos),
       |r AS (
       |  SELECT w, CAST(0 AS BIGINT) AS pos, CAST([] AS VARCHAR[]) AS toks,
       |    (len(w) > 100) AS bad
       |  FROM words
       |  UNION ALL
       |  SELECT w,
       |    pos + CASE WHEN pos = 0 THEN len(best) ELSE len(best) - 2 END,
       |    list_append(toks, best),
       |    best IS NULL
       |  FROM (
       |    SELECT w, pos, toks,
       |      CASE WHEN len(cands) = 0 THEN NULL
       |        ELSE list_reduce(cands,
       |          (a, b) -> CASE WHEN len(b) > len(a) THEN b ELSE a END)
       |        END AS best
       |    FROM (
       |      SELECT w, pos, toks,
       |        list_filter($vocabSql, v ->
       |          CASE WHEN pos = 0
       |            THEN NOT starts_with(v, '##')
       |              AND v = substr(w, 1, CAST(len(v) AS INT))
       |            ELSE starts_with(v, '##') AND len(v) > 2
       |              AND substr(v, 3) = substr(w, CAST(pos + 1 AS INT),
       |                CAST(len(v) - 2 AS INT)) END) AS cands
       |      FROM r WHERE NOT bad AND pos < len(w)) c0) c1
       |),
       |fin AS (SELECT w,
       |    CASE WHEN bad THEN ['[UNK]'] ELSE toks END AS toks
       |  FROM r WHERE bad OR pos >= len(w)),
       |f AS (SELECT doc_id, flatten(list(toks ORDER BY i)) AS toks
       |  FROM wpos JOIN fin USING (w) GROUP BY 1)
       |${tailSql.getOrElse(s"""SELECT d.doc_id,
       |  CAST(coalesce(len(f.toks), 0) AS INT) AS wp_count,
       |  coalesce(array_to_string(f.toks, chr(31)), '') AS wp_str,
       |  coalesce(array_to_string(list_transform(f.toks,
       |    t -> CAST(coalesce(list_position($vocabSql, t) - 1, -1)
       |           AS VARCHAR)), ' '), '') AS wp_ids_str
       |FROM documents d LEFT JOIN f USING (doc_id)
       |WHERE $gateExpr
       |ORDER BY doc_id""")}""".stripMargin

  private val wordPieceSql: String =
    wpGreedySql(
      q172Vocab.map(v => s"'${v.replace("'", "''")}'")
        .mkString("[", ", ", "]"),
      // single line: a multi-line tExpr would collide with stripMargin
      "lower(coalesce(text, '') || " +
        "' The theming ending 1234 don''t re-do \u00f8yen')")

  // q174: greedy replay (f) + the PACKING replayed — global token rank
  // over (doc_id, in-doc position), chunk = rn // 512, per-chunk ordered
  // reassembly. DuckDB's global window is the oracle's privilege; the
  // Spark side uses the two-phase prefix sum.
  private val packTokenIdsSql: String = {
    val vocabSql = q172Vocab.map(v => s"'${v.replace("'", "''")}'")
      .mkString("[", ", ", "]")
    val tail =
      """,
        |u AS (SELECT doc_id, unnest(toks) AS t,
        |    unnest(range(1, len(toks)+1)) AS ti FROM f),
        |g AS (SELECT doc_id, t,
        |    row_number() OVER (ORDER BY doc_id, ti) - 1 AS rn
        |  FROM u),
        |c AS (SELECT rn // 512 AS chunk, list(t ORDER BY rn) AS ids FROM g
        |  GROUP BY 1),
        |sp AS (SELECT rn // 512 AS chunk, doc_id, min(rn) % 512 AS off,
        |    count(*) AS len FROM g GROUP BY 1, 2),
        |sps AS (SELECT chunk, array_to_string(list(
        |    CAST(doc_id AS VARCHAR) || ':' || CAST(off AS VARCHAR) || ':' ||
        |    CAST(len AS VARCHAR) ORDER BY off), ' ') AS spans_str
        |  FROM sp GROUP BY 1),
        |gp AS (SELECT rn // 512 AS chunk, rn,
        |    rn - min(rn) OVER (PARTITION BY rn // 512, doc_id) AS pos
        |  FROM g),
        |ps AS (SELECT chunk, array_to_string(list(
        |    CAST(pos AS VARCHAR) ORDER BY rn), ' ') AS pos_str
        |  FROM gp GROUP BY 1)
        |SELECT CAST(c.chunk AS BIGINT) AS chunk,
        |  CAST(len(ids) AS INT) AS n_ids,
        |  array_to_string(ids, chr(31)) AS ids_str,
        |  sps.spans_str, ps.pos_str
        |FROM c JOIN sps USING (chunk) JOIN ps USING (chunk)
        |ORDER BY chunk""".stripMargin
    wpGreedySql(vocabSql, "lower(coalesce(text, ''))", tailSql = Some(tail))
  }

  // q175: the FIM transform replayed — md5 gate (first 13 hex digits as
  // a 52-bit integer, < round(0.5 * 2^52) = 2^51), two cut draws mod (len+1),
  // least/greatest, three code-point substrs, sentinel concat in both
  // the PSM and SPM orderings.
  private val fimSql: String = {
    def drw(tag: String) =
      s"CAST(('0x' || substr(md5(doc_id || ':graft:fim:$tag'), 1, 13)) AS BIGINT)"
    s"""WITH x AS (SELECT doc_id, text, length(text) AS L,
       |    ${drw("gate")} < 2251799813685248 AND text IS NOT NULL AS app,
       |    ${drw("p1")} % (length(text) + 1) AS p1,
       |    ${drw("p2")} % (length(text) + 1) AS p2
       |  FROM documents),
       |y AS (SELECT doc_id, text, L, app,
       |    least(p1, p2) AS lo, greatest(p1, p2) AS hi FROM x),
       |z AS (SELECT doc_id, app,
       |    substr(text, 1, CAST(lo AS INT)) AS pre,
       |    substr(text, CAST(lo + 1 AS INT), CAST(hi - lo AS INT)) AS mid,
       |    substr(text, CAST(hi + 1 AS INT), CAST(L - hi AS INT)) AS suf,
       |    text FROM y)
       |SELECT doc_id, app AS fim_applied,
       |  CASE WHEN app THEN '<fim_prefix>' || pre || '<fim_suffix>' || suf
       |    || '<fim_middle>' || mid ELSE text END AS psm_text,
       |  CASE WHEN app THEN '<fim_suffix>' || suf || '<fim_prefix>' || pre
       |    || '<fim_middle>' || mid ELSE text END AS spm_text
       |FROM z ORDER BY doc_id""".stripMargin
  }

  // q179: MP3 metadata replayed arithmetically — the synthetic clip's
  // header fields are all id-derived (frame count 1 + id%4, bitrate
  // index cycling by (id+i)%3, fixed 44.1 kHz joint stereo), so the
  // oracle recomputes what the frame walker reads: duration = frames ·
  // 1152 / rate in integer ms, avg bitrate as an exact-int division
  // (both engines round the same double), VBR = more than one distinct
  // frame bitrate.
  private val mp3MetaSql: String =
    s"""WITH d AS (SELECT doc_id, CAST(1 + doc_id % 4 AS INT) AS nf
       |  FROM documents),
       |f AS (SELECT doc_id, nf, unnest(range(0, nf)) AS i FROM d),
       |k AS (SELECT doc_id, nf, CASE CAST((doc_id + i) % 3 AS INT)
       |    WHEN 0 THEN 128 WHEN 1 THEN 192 ELSE 256 END AS kbps FROM f),
       |g AS (SELECT doc_id, any_value(nf) AS nf, sum(kbps) AS sk,
       |    count(DISTINCT kbps) AS nd FROM k GROUP BY doc_id)
       |SELECT doc_id, 44100 AS sample_rate, 2 AS channels, nf AS n_frames,
       |  CAST(nf * 1152 * 1000 // 44100 AS BIGINT) AS duration_ms,
       |  CAST(sk AS DOUBLE) / nf AS avg_kbps, nd > 1 AS vbr
       |FROM g ORDER BY doc_id""".stripMargin

  // q200: JPEG metadata replayed arithmetically — the synthetic image's
  // header fields are all id-derived (width 16 + 7id % 240, height
  // 16 + 13id % 240, 1 + id%3 components, SOF2 iff odd id) and the
  // marker layout is the fixed APP0/DQT/SOF/DHT/SOS structure, so the
  // oracle recomputes exactly what the marker walker reads.
  private val jpegMetaSql: String =
    """SELECT doc_id,
      |  CAST(16 + (doc_id * 7) % 240 AS INT) AS width,
      |  CAST(16 + (doc_id * 13) % 240 AS INT) AS height,
      |  CAST(8 AS INT) AS precision,
      |  CAST(1 + doc_id % 3 AS INT) AS n_components,
      |  doc_id % 2 = 1 AS progressive,
      |  CAST(5 AS INT) AS n_segments
      |FROM documents ORDER BY doc_id""".stripMargin

  // q177: the chat template replayed — per-turn piece length is fully
  // determined by role/content lengths (12 = len('<|im_start|>'), 10 =
  // len('<|im_end|>'), +1s are the newlines), so span offsets are window
  // prefix-sums over plen and the text is an ordered string_agg of the
  // same pieces. string_agg skips the CASE's NULLs (non-assistant turns);
  // coalesce covers the one-turn docs with no assistant span at all.
  private val chatSftSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |n AS (SELECT doc_id, toks, CAST((len(toks) + 7) // 8 AS INT) AS nt
       |  FROM t),
       |w AS (SELECT doc_id, toks, unnest(range(0, nt)) AS w FROM n),
       |p AS (SELECT doc_id, w,
       |    CASE WHEN w % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    array_to_string(list_slice(toks, w*8 + 1, (w+1)*8), ' ')
       |      AS content
       |  FROM w),
       |q AS (SELECT doc_id, w, role, content,
       |    12 + length(role) + 1 + length(content) + 10 + 1 AS plen FROM p),
       |o AS (SELECT doc_id, w, role, content,
       |    coalesce(sum(plen) OVER (PARTITION BY doc_id ORDER BY w
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS poff
       |  FROM q),
       |g AS (SELECT doc_id, CAST(count(*) AS INT) AS n_turns,
       |    string_agg('<|im_start|>' || role || chr(10) || content ||
       |      '<|im_end|>' || chr(10), '' ORDER BY w) AS chat_text,
       |    coalesce(string_agg(CASE WHEN role = 'assistant' THEN
       |        (poff + 12 + length(role) + 1) || ':' ||
       |        (length(content) + 10) END, ' ' ORDER BY w), '') AS spans_str
       |  FROM o GROUP BY doc_id)
       |SELECT doc_id, n_turns, chat_text, spans_str FROM g
       |ORDER BY doc_id""".stripMargin

  // q197: the water-fill closed form replayed step for step — per-source
  // char totals, the 1 + k%5 weight shares, supplies in exact integer
  // milli-epochs (×2500), the (price, source) sort with integer running
  // sums, the cross-multiplied saturation test (each side ONE double
  // multiply of exactly-represented longs), saturated totals as MAX over
  // the running sums (the saturated set is a prefix, so the last
  // saturated row's cumulative sums ARE the totals — and max is
  // summation-order-independent), then the level and allocation as the
  // same one-IEEE-op-at-a-time division chain the operator emits.
  private val epochWaterfillSql: String =
    """WITH c AS (
      |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_tokens,
      |         1 + (CAST(substr(source, 4) AS BIGINT) % 5) AS weight
      |  FROM documents WHERE source IS NOT NULL
      |  GROUP BY source HAVING SUM(n_chars) > 0),
      |b AS (
      |  SELECT (CAST(SUM(n_chars) AS BIGINT) * 18) // 10 * 1000 AS bm
      |  FROM documents WHERE source IS NOT NULL),
      |p AS (
      |  SELECT source, n_tokens, weight, n_tokens * 2500 AS supply_m,
      |         CAST(n_tokens * 2500 AS DOUBLE) / CAST(weight AS DOUBLE)
      |           AS price
      |  FROM c),
      |w AS (
      |  SELECT p.*, b.bm,
      |    COALESCE(SUM(supply_m) OVER (ORDER BY price, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_prev,
      |    COALESCE(SUM(weight) OVER (ORDER BY price, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS w_prev,
      |    SUM(weight) OVER () AS w_tot,
      |    SUM(supply_m) OVER (ORDER BY price, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_run,
      |    SUM(weight) OVER (ORDER BY price, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w_run
      |  FROM p, b),
      |f AS (
      |  SELECT *,
      |    CAST(supply_m AS DOUBLE) * CAST(w_tot - w_prev AS DOUBLE)
      |      <= CAST(weight AS DOUBLE) * CAST(bm - s_prev AS DOUBLE)
      |      AS saturated
      |  FROM w),
      |g AS (
      |  SELECT *,
      |    COALESCE(MAX(CASE WHEN saturated THEN s_run END) OVER (), 0)
      |      AS s_cap,
      |    COALESCE(MAX(CASE WHEN saturated THEN w_run END) OVER (), 0)
      |      AS w_cap
      |  FROM f),
      |h AS (
      |  SELECT *,
      |    (CASE WHEN saturated THEN CAST(supply_m AS DOUBLE)
      |          ELSE CAST(weight AS DOUBLE) *
      |            (CASE WHEN w_tot - w_cap > 0
      |                  THEN CAST(bm - s_cap AS DOUBLE) /
      |                       CAST(w_tot - w_cap AS DOUBLE) END)
      |     END) / 1000.0 AS alloc_tokens
      |  FROM g)
      |SELECT source, n_tokens, weight, saturated, alloc_tokens,
      |       alloc_tokens / CAST(n_tokens AS DOUBLE) AS epochs
      |FROM h ORDER BY source""".stripMargin

  // q185: best-of-n replay — prompt prefix-sums over the FIRST least(nt,2)
  // turns, 1 + doc_id % 3 candidates cut from the token stream (the
  // doc_id % 5 = 0 branch repeats candidate 0's slice — the all-tie case),
  // single-span arithmetic (off = prompt length + the 22-char assistant
  // header, len = content + endTok), the length-mod-19 proxy score, and
  // the argmax via row_number ORDER BY score DESC, cand_id — exactly the
  // operator's max(struct(score, -cand_id)) tie-break. list_slice past the
  // token list yields [] whose array_to_string is NULL (DuckDB), hence the
  // coalesce the Spark side's array_join('') parity requires.
  private val bestOfNSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |n AS (SELECT doc_id, toks, CAST((len(toks) + 7) // 8 AS INT) AS nt
       |  FROM t),
       |w AS (SELECT doc_id, toks, unnest(range(0, least(nt, 2))) AS w
       |  FROM n),
       |p AS (SELECT doc_id, w,
       |    CASE WHEN w % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    array_to_string(list_slice(toks, w*8 + 1, (w+1)*8), ' ')
       |      AS content
       |  FROM w),
       |g AS (SELECT doc_id,
       |    string_agg('<|im_start|>' || role || chr(10) || content ||
       |      '<|im_end|>' || chr(10), '' ORDER BY w) AS ptext,
       |    CAST(sum(12 + length(role) + 1 + length(content) + 10 + 1)
       |      AS BIGINT) AS plen
       |  FROM p GROUP BY doc_id),
       |c AS (SELECT doc_id, toks, CAST(1 + doc_id % 3 AS INT) AS n_cands,
       |    unnest(range(0, 1 + doc_id % 3)) AS j FROM n),
       |cc AS (SELECT doc_id, n_cands, CAST(j AS INT) AS cand_id,
       |    coalesce(array_to_string(list_slice(toks,
       |      (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE j END)*4 + 17,
       |      (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE j END)*4 + 24), ' '),
       |      '') AS cand
       |  FROM c),
       |x AS (SELECT cc.doc_id, cc.n_cands, cc.cand_id,
       |    g.ptext || '<|im_start|>assistant' || chr(10) || cc.cand ||
       |      '<|im_end|>' || chr(10) AS cand_text,
       |    (g.plen + 22) || ':' || (length(cc.cand) + 10) AS spans_str
       |  FROM cc JOIN g USING (doc_id)),
       |sc AS (SELECT x.*, CAST(length(cand_text) % 19 AS INT) AS score
       |  FROM x)
       |SELECT doc_id, n_cands, cand_id, score, cand_text, spans_str
       |FROM sc
       |QUALIFY row_number() OVER (PARTITION BY doc_id
       |  ORDER BY score DESC, cand_id) = 1
       |ORDER BY doc_id""".stripMargin

  // q196: contrastive triplet mining replayed — the q79 assignment
  // prefix (planted twins, first-16-id pivots, rounded-cosine argmax
  // cells), then every directed in-cell cosine, the positive and
  // hard-negative band argmaxes as (cos DESC, partner) rank windows
  // (= Spark's max(struct(cos, −id))), the K-row cell-ordinal table and
  // the partner-cell modular pick. Anchors without a positive are
  // absent on both sides.
  private val contrastiveTripletsSql: String =
    """WITH pb AS (SELECT vec_id AS oid, embedding AS emb FROM embeddings),
      |pl AS (SELECT oid + 1000000 AS vec_id,
      |  list_transform(range(0, 64), d -> CAST(CAST(emb[d+1] AS DOUBLE) +
      |    CAST(0.01 AS DOUBLE) * CAST((oid*131 + d*7919) % 1000003
      |      * 2654435761 % 2000003 - 1000001 AS DOUBLE)
      |    / CAST(1000001.0 AS DOUBLE) AS REAL)) AS embedding
      |  FROM pb),
      |corpus AS (SELECT vec_id, embedding FROM embeddings
      |           UNION ALL SELECT vec_id, embedding FROM pl),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM corpus),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
      |      FROM e),
      |nz AS (SELECT * FROM n WHERE nrm > 0),
      |piv AS (SELECT vec_id AS pid, v AS pv, nrm AS pnrm FROM nz
      |        ORDER BY vec_id LIMIT 16),
      |asg AS (SELECT c.vec_id AS id, c.v, c.nrm, pid,
      |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
      |      round(list_sum(list_transform(range(1, 65),
      |        k -> c.v[k]*pv[k])) / (c.nrm*pnrm), 6) DESC, pid) AS rn
      |  FROM nz c CROSS JOIN piv),
      |cells AS (SELECT id, v, nrm, pid AS cell FROM asg WHERE rn = 1),
      |j AS (SELECT a.id AS a, b.id AS b,
      |    round(list_sum(list_transform(range(1, 65),
      |      k -> a.v[k]*b.v[k])) / (a.nrm*b.nrm), 6) AS cos
      |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.id <> b.id),
      |pos AS (SELECT a, b AS pos_id, cos AS pos_cos FROM j WHERE cos >= 0.95
      |  QUALIFY row_number() OVER (PARTITION BY a ORDER BY cos DESC, b) = 1),
      |hard AS (SELECT a, b AS hard_id, cos AS hard_cos FROM j WHERE cos < 0.5
      |  QUALIFY row_number() OVER (PARTITION BY a ORDER BY cos DESC, b) = 1),
      |co AS (SELECT cell, min(id) AS rep_id FROM cells GROUP BY cell),
      |cord AS (SELECT cell, rep_id,
      |    row_number() OVER (ORDER BY cell) - 1 AS ord FROM co),
      |kk AS (SELECT count(*) AS kc FROM cord),
      |an AS (SELECT c.id AS anchor_id,
      |    CASE WHEN kk.kc > 1
      |         THEN (cord.ord + 1 + c.id % (kk.kc - 1)) % kk.kc END AS pord
      |  FROM cells c JOIN cord ON c.cell = cord.cell CROSS JOIN kk)
      |SELECT p.a AS anchor_id, p.pos_id, p.pos_cos,
      |  h.hard_id, h.hard_cos, c2.rep_id AS easy_id
      |FROM pos p
      |LEFT JOIN hard h ON p.a = h.a
      |JOIN an ON p.a = an.anchor_id
      |LEFT JOIN cord c2 ON an.pord = c2.ord
      |ORDER BY anchor_id""".stripMargin

  // q195: majority vote replayed — the vote synthesis, per-answer
  // counts, and the modal answer via a (count desc, answer) rank window
  // (= Spark's min(struct(−count, answer)) argmax). vote_frac is an
  // exact IEEE division of the two replayed integers.
  private val majorityVoteSql: String =
    s"""WITH v AS (SELECT doc_id, j,
       |    CASE WHEN (doc_id + j) % 17 = 0 THEN NULL
       |         ELSE 'ans' || CAST((doc_id * 7 + j * 13) % 5 % 3 AS VARCHAR) END AS ans
       |  FROM (SELECT doc_id, unnest(range(1, 5)) AS j FROM documents) z),
       |c AS (SELECT doc_id, ans, count(*) AS cnt FROM v
       |  WHERE ans IS NOT NULL GROUP BY doc_id, ans),
       |b AS (SELECT doc_id, ans, cnt FROM c
       |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, ans) = 1),
       |t AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN ans IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_votes,
       |    CAST(sum(CASE WHEN ans IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
       |  FROM v GROUP BY doc_id)
       |SELECT t.doc_id, t.n_votes, t.n_null, b.ans AS vote_answer,
       |  CAST(b.cnt AS BIGINT) AS vote_count,
       |  CAST(b.cnt AS DOUBLE) / CAST(t.n_votes AS DOUBLE) AS vote_frac
       |FROM t LEFT JOIN b USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // q207: the annealed curriculum replayed — the count, the floor(n·0.2)
  // cut, the (chars desc, id) quality rank, and the (phase, md5, id)
  // train order, all as window ranks over the same keys the two-phase
  // prefix sums realize distributedly.
  private val annealOrderSql: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
      |q AS (SELECT doc_id, n_chars,
      |    CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
      |      AS quality_rank
      |  FROM d),
      |f AS (SELECT q.doc_id, q.quality_rank,
      |    CASE WHEN q.quality_rank <=
      |      CAST(floor(CAST(t.n AS DOUBLE) * CAST(0.2 AS DOUBLE)) AS BIGINT)
      |      THEN 'anneal' ELSE 'main' END AS phase
      |  FROM q, t)
      |SELECT doc_id, phase, quality_rank,
      |  CAST(row_number() OVER (ORDER BY
      |    CASE WHEN phase = 'anneal' THEN 1 ELSE 0 END,
      |    md5(CAST(doc_id AS VARCHAR) || ':graft:anneal'), doc_id) - 1
      |    AS BIGINT) AS train_order
      |FROM f ORDER BY doc_id""".stripMargin

  // q208: the round-trip's EXTERNAL law — the oracle never sees the
  // tokenizer at all; it hashes the normalized original text, which the
  // Spark side's encode→detok reconstruction must reproduce byte for
  // byte (the q190 pattern applied to the tokenizer codec).
  private val detokRoundtripSql: String =
    s"""SELECT doc_id,
       |  CAST(length(regexp_replace(coalesce(text, ''),
       |    '$NonRe2WhitespaceRe2', ' ', 'g')) AS INT) AS n_chars_norm,
       |  md5(regexp_replace(coalesce(text, ''),
       |    '$NonRe2WhitespaceRe2', ' ', 'g')) AS detok_md5
       |FROM documents ORDER BY doc_id""".stripMargin

  // q204: pass@k replayed — the correctness grid, per-problem counts,
  // both falling-factorial products as exact integer list_products, and
  // the one-division estimator with the k > n NULL and the n-c < k
  // short-circuit.
  private val passAtKSql: String =
    """WITH v AS (SELECT doc_id, unnest(range(1, 9)) AS j FROM documents),
      |c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
      |    CAST(sum(CASE WHEN doc_id % 7 <> 0
      |      AND (doc_id + j) % (1 + doc_id % 4) = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_correct
      |  FROM v GROUP BY doc_id),
      |k AS (SELECT doc_id, n_samples, n_correct,
      |    unnest([1, 4, 8, 10]) AS k FROM c),
      |f AS (SELECT doc_id, n_samples, n_correct, CAST(k AS INT) AS k,
      |    CASE WHEN n_samples - n_correct >= k
      |         THEN CAST(list_product(list_transform(range(0, k),
      |           i -> n_samples - n_correct - i)) AS BIGINT)
      |         ELSE 0 END AS num,
      |    CASE WHEN k <= n_samples
      |         THEN CAST(list_product(list_transform(range(0, k),
      |           i -> n_samples - i)) AS BIGINT)
      |         ELSE 0 END AS den
      |  FROM k)
      |SELECT doc_id, n_samples, n_correct, k,
      |  CASE WHEN k > n_samples THEN NULL
      |       ELSE CAST(1.0 AS DOUBLE) -
      |            CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS pass_at_k
      |FROM f ORDER BY doc_id, k""".stripMargin

  // q205: the arena replayed end to end — battle synthesis, undirected
  // pair counts, then the 8 quantized MM iterations UNROLLED as chained
  // CTEs. Every per-pair term is the operator's exact double expression
  // floored back to integer nano-units, and every cross-row SUM is over
  // those integers — order-free under any aggregation tree, so the
  // fixed point is bit-identical to the driver-side loop.
  private val btArenaSql: String = {
    def sumTerms(prev: String): String =
      s"""SELECT n.a AS model,
         |      CAST(SUM(CAST(floor(CAST(n.n AS DOUBLE) * 1e9 /
         |        ((CAST(pa.p AS DOUBLE) + CAST(pb.p AS DOUBLE)) / 1e9)
         |        + 0.5) AS BIGINT)) AS BIGINT) AS s
         |    FROM nmat n
         |    JOIN $prev pa ON n.a = pa.model
         |    JOIN $prev pb ON n.b = pb.model
         |    GROUP BY n.a""".stripMargin
    def iterCte(prev: String, cur: String): String =
      s"""$cur AS MATERIALIZED (
         |  SELECT i.model,
         |    CASE WHEN COALESCE(s.s, 0) = 0 THEN i.p
         |         ELSE GREATEST(1000, CAST(floor(LEAST(
         |           CAST(w.wins AS DOUBLE) * 1e18 / CAST(s.s AS DOUBLE),
         |           1e15) + 0.5) AS BIGINT)) END AS p
         |  FROM $prev i
         |  LEFT JOIN (${sumTerms(prev)}) s ON i.model = s.model
         |  JOIN wstat w ON i.model = w.model)""".stripMargin
    val iters = (1 to 8).map(t =>
      iterCte(if (t == 1) "p0" else s"it${t - 1}", s"it$t")).mkString(",\n")
    s"""WITH base AS (
       |  SELECT doc_id, source AS ma,
       |    CAST(substr(source, 4) AS BIGINT) AS ia,
       |    (CAST(substr(source, 4) AS BIGINT) + 1 + doc_id % 19) % 20 AS ib
       |  FROM documents WHERE source IS NOT NULL),
       |gm AS (
       |  SELECT ma, 'src' || CAST(ib AS VARCHAR) AS mb,
       |    CASE WHEN (doc_id * 31) % (ia + ib + 2) <= ia THEN ma
       |         ELSE 'src' || CAST(ib AS VARCHAR) END AS w
       |  FROM base),
       |dirn AS (SELECT least(ma, mb) AS lo, greatest(ma, mb) AS hi,
       |    CASE WHEN w = least(ma, mb) THEN 1 ELSE 0 END AS wlo
       |  FROM gm WHERE ma <> mb AND (w = ma OR w = mb)),
       |pc AS MATERIALIZED (SELECT lo, hi, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(wlo) AS BIGINT) AS wlo FROM dirn GROUP BY lo, hi),
       |nmat AS MATERIALIZED (SELECT lo AS a, hi AS b, n FROM pc
       |  UNION ALL SELECT hi AS a, lo AS b, n FROM pc),
       |wstat AS MATERIALIZED (SELECT a AS model, CAST(SUM(wv) AS BIGINT) AS wins,
       |    CAST(SUM(n) AS BIGINT) AS games FROM (
       |    SELECT lo AS a, wlo AS wv, n FROM pc
       |    UNION ALL SELECT hi AS a, n - wlo AS wv, n FROM pc) z
       |  GROUP BY a),
       |p0 AS MATERIALIZED (SELECT model, CAST(1000000000 AS BIGINT) AS p FROM wstat),
       |$iters
       |SELECT w.model, w.games AS n_games, w.wins AS n_wins,
       |  i.p AS bt_nano,
       |  CAST(w.wins AS DOUBLE) / CAST(w.games AS DOUBLE) AS win_rate
       |FROM wstat w JOIN it8 i USING (model) ORDER BY w.model""".stripMargin
  }

  // q206: distinct-n replayed — the bigram build, per-row distinct
  // count, and the single division.
  private val distinctNgramsSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |g AS (SELECT doc_id,
       |    CASE WHEN len(toks) >= 2
       |         THEN list_transform(range(1, len(toks)),
       |           i -> array_to_string(list_slice(toks, i, i + 1), chr(31)))
       |         ELSE [] END AS ga
       |  FROM t)
       |SELECT doc_id, CAST(len(ga) AS BIGINT) AS grams_n,
       |  CAST(len(list_distinct(ga)) AS BIGINT) AS uniq_n,
       |  CASE WHEN len(ga) > 0
       |       THEN CAST(len(list_distinct(ga)) AS DOUBLE) /
       |            CAST(len(ga) AS DOUBLE) END AS distinct_n
       |FROM g ORDER BY doc_id""".stripMargin

  // q201: FLAC metadata replayed arithmetically — every STREAMINFO bit
  // field (rate by id%4, channels, the 36-bit total-samples, integer-ms
  // duration) and the embedded MD5's lower-hex encoding recomputed from
  // doc_id; n_blocks is the fixed STREAMINFO + PADDING pair.
  private val flacMetaSql: String =
    """SELECT doc_id,
      |  CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 44100 WHEN 1 THEN 48000
      |       WHEN 2 THEN 32000 ELSE 22050 END AS INT) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS INT) AS channels,
      |  CAST(16 AS INT) AS bits_per_sample,
      |  CAST(1000 + (doc_id * 37) % 5000 AS BIGINT) AS total_samples,
      |  CAST((1000 + (doc_id * 37) % 5000) * 1000 //
      |    (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 44100 WHEN 1 THEN 48000
      |     WHEN 2 THEN 32000 ELSE 22050 END) AS BIGINT) AS duration_ms,
      |  CAST(2 AS INT) AS n_blocks,
      |  array_to_string(list_transform(range(0, 16),
      |    j -> lower(lpad(to_hex((doc_id * 31 + j) % 256), 2, '0'))), '')
      |    AS md5_hex
      |FROM documents ORDER BY doc_id""".stripMargin

  // q202: acceptance replayed — the draft corruption (every k-th token
  // 'x'), the first-mismatch scan over the zipped streams, and the exact
  // integer/one-division outputs. IS-the-same comparison semantics match
  // the operator's === (no NULL tokens exist post-split).
  private val specAcceptSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS tg FROM documents),
       |k AS (SELECT doc_id, tg, 3 + doc_id % 5 AS kk FROM t),
       |w AS (SELECT doc_id, tg, list_transform(range(1, len(tg) + 1),
       |    i -> CASE WHEN i % kk = 0 THEN 'x' ELSE tg[i] END) AS dr FROM k),
       |m AS (SELECT doc_id, tg, dr,
       |    list_min(list_filter(list_transform(
       |      range(1, least(len(tg), len(dr)) + 1),
       |      i -> CASE WHEN dr[i] <> tg[i] THEN i END),
       |      x -> x IS NOT NULL)) AS mi
       |  FROM w),
       |f AS (SELECT doc_id, dr, tg,
       |    CAST(coalesce(mi - 1, least(len(dr), len(tg))) AS INT) AS na
       |  FROM m)
       |SELECT doc_id, CAST(len(dr) AS INT) AS n_draft,
       |  CAST(len(tg) AS INT) AS n_target, na AS n_accept,
       |  CASE WHEN len(dr) > 0
       |       THEN CAST(na AS DOUBLE) / CAST(len(dr) AS DOUBLE) END
       |    AS accept_rate,
       |  CAST(least(na + 1, len(tg)) AS INT) AS toks_per_step
       |FROM f ORDER BY doc_id""".stripMargin

  // q203: the needle splice replayed — per-depth integer insertion
  // offset, the three-way list concat, and the chr(31)-joined hash.
  private val needlePrepSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |d AS (SELECT doc_id, toks,
       |    unnest([0, 25, 50, 75, 100]) AS depth_pct FROM t),
       |p AS (SELECT doc_id, depth_pct, toks,
       |    CAST(len(toks) AS BIGINT) * depth_pct // 100 AS pos FROM d)
       |SELECT doc_id, CAST(depth_pct AS INT) AS depth_pct,
       |  CAST(pos AS INT) AS needle_pos,
       |  CAST(len(toks) + 5 AS INT) AS n_toks,
       |  md5(array_to_string(list_concat(list_concat(
       |    list_slice(toks, 1, pos),
       |    ['the', 'magic', 'number', 'is', '42']),
       |    list_slice(toks, pos + 1, len(toks))), chr(31))) AS ctx_md5
       |FROM p ORDER BY doc_id, depth_pct""".stripMargin

  // q198: GAE replayed with a recursive CTE descending from each
  // trajectory's terminal step — the SAME multiply-add chain as the
  // operator's reverse fold (delta + (γ·λ)·A_next, every constant CAST
  // to DOUBLE first: DuckDB parses bare decimals as exact DECIMAL and a
  // decimal 0.99·0.95 would round differently from the two-double IEEE
  // product Spark constant-folds). The recursive WITH list holds only
  // the small per-step CTEs (the q49 materialization lesson).
  private val gaeAdvantageSql: String =
    """WITH RECURSIVE s AS (
      |  SELECT doc_id, unnest(range(1, 2 + doc_id % 7)) AS step
      |  FROM documents),
      |v AS (
      |  SELECT doc_id, step,
      |    CAST((doc_id * 3 + step * 5) % 13 - 6 AS DOUBLE)
      |      / CAST(4.0 AS DOUBLE) AS reward,
      |    CAST((doc_id + step * 7) % 11 - 5 AS DOUBLE)
      |      / CAST(3.0 AS DOUBLE) AS value,
      |    1 + doc_id % 7 AS ms
      |  FROM s),
      |d AS (
      |  SELECT doc_id, step, reward, value, ms,
      |    reward + CAST(0.99 AS DOUBLE) *
      |      COALESCE(LEAD(value) OVER (PARTITION BY doc_id ORDER BY step),
      |               CAST(0.0 AS DOUBLE)) - value AS delta
      |  FROM v),
      |a AS (
      |  SELECT doc_id, step, reward, value, delta,
      |    delta + (CAST(0.99 AS DOUBLE) * CAST(0.95 AS DOUBLE))
      |      * CAST(0.0 AS DOUBLE) AS advantage
      |  FROM d WHERE step = ms
      |  UNION ALL
      |  SELECT d.doc_id, d.step, d.reward, d.value, d.delta,
      |    d.delta + (CAST(0.99 AS DOUBLE) * CAST(0.95 AS DOUBLE))
      |      * a.advantage
      |  FROM d JOIN a ON d.doc_id = a.doc_id AND d.step = a.step - 1)
      |SELECT doc_id, step, reward, value, delta, advantage,
      |  advantage + value AS ret
      |FROM a ORDER BY doc_id, step""".stripMargin

  // q199: ROUGE-2 replayed — q194's candidate corruption verbatim, then
  // per-(doc, bigram) counts on both sides, the clipped min through an
  // INNER join (only grams both sides have contribute), arithmetic gram
  // totals, and the exact division/F1 expression (every constant CAST to
  // DOUBLE; NULL when a side has no bigrams, 0 when P + R = 0).
  private val rougeEvalSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS ref FROM documents),
       |w AS (SELECT doc_id, ref,
       |    list_filter(list_transform(range(1, len(ref) + 1),
       |      i -> CASE WHEN i % 11 = 0 THEN NULL WHEN i % 5 = 0 THEN 'x' ELSE ref[i] END),
       |      x -> x IS NOT NULL) AS cand
       |  FROM t),
       |cg AS (SELECT doc_id, array_to_string(list_slice(cand, i, i + 1), chr(31)) AS g,
       |    count(*) AS cc
       |  FROM (SELECT doc_id, cand, unnest(range(1, len(cand))) AS i FROM w) z
       |  GROUP BY doc_id, g),
       |rg AS (SELECT doc_id, array_to_string(list_slice(ref, i, i + 1), chr(31)) AS g,
       |    count(*) AS rc
       |  FROM (SELECT doc_id, ref, unnest(range(1, len(ref))) AS i FROM w) z
       |  GROUP BY doc_id, g),
       |m AS (SELECT cg.doc_id, CAST(sum(least(cg.cc, rg.rc)) AS BIGINT) AS overlap
       |  FROM cg JOIN rg ON cg.doc_id = rg.doc_id AND cg.g = rg.g
       |  GROUP BY cg.doc_id),
       |f AS (SELECT w.doc_id,
       |    CAST(coalesce(m.overlap, 0) AS BIGINT) AS overlap,
       |    CAST(greatest(len(cand) - 1, 0) AS BIGINT) AS c_grams,
       |    CAST(greatest(len(ref) - 1, 0) AS BIGINT) AS r_grams
       |  FROM w LEFT JOIN m USING (doc_id)),
       |g AS (SELECT doc_id, overlap, c_grams, r_grams,
       |    CASE WHEN c_grams > 0
       |         THEN CAST(overlap AS DOUBLE) / CAST(c_grams AS DOUBLE) END AS rouge_p,
       |    CASE WHEN r_grams > 0
       |         THEN CAST(overlap AS DOUBLE) / CAST(r_grams AS DOUBLE) END AS rouge_r
       |  FROM f)
       |SELECT doc_id, overlap, c_grams, r_grams, rouge_p, rouge_r,
       |  CASE WHEN rouge_p IS NOT NULL AND rouge_r IS NOT NULL THEN
       |    CASE WHEN rouge_p + rouge_r > CAST(0.0 AS DOUBLE)
       |         THEN CAST(2.0 AS DOUBLE) * rouge_p * rouge_r / (rouge_p + rouge_r)
       |         ELSE CAST(0.0 AS DOUBLE) END END AS rouge_f
       |FROM g ORDER BY doc_id""".stripMargin

  // q194: BLEU replayed gram by gram — the deterministic candidate
  // corruption, per-(doc, n, gram) counts on both sides, the clipped
  // min, and the published formula as one fixed expression over the
  // same integers (CASTs everywhere: DuckDB parses bare decimals as
  // exact DECIMAL; ln/exp 6-dp rounded, the q90 libm discipline).
  private val bleuEvalSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS ref FROM documents),
       |w AS (SELECT doc_id, ref,
       |    list_filter(list_transform(range(1, len(ref) + 1),
       |      i -> CASE WHEN i % 11 = 0 THEN NULL WHEN i % 5 = 0 THEN 'x' ELSE ref[i] END),
       |      x -> x IS NOT NULL) AS cand
       |  FROM t),
       |l AS (SELECT doc_id, CAST(len(cand) AS INT) AS c_len,
       |    CAST(len(ref) AS INT) AS r_len, cand, ref FROM w),
       |ca AS (SELECT doc_id, cand, unnest([1, 2, 3, 4]) AS n FROM l),
       |cb AS (SELECT doc_id, n, unnest(range(1, len(cand) - n + 2)) AS i, cand FROM ca),
       |cg AS (SELECT doc_id, n, array_to_string(list_slice(cand, i, i + n - 1), chr(31)) AS g,
       |    count(*) AS cc FROM cb GROUP BY doc_id, n, g),
       |ra AS (SELECT doc_id, ref, unnest([1, 2, 3, 4]) AS n FROM l),
       |rb AS (SELECT doc_id, n, unnest(range(1, len(ref) - n + 2)) AS i, ref FROM ra),
       |rg AS (SELECT doc_id, n, array_to_string(list_slice(ref, i, i + n - 1), chr(31)) AS g,
       |    count(*) AS rc FROM rb GROUP BY doc_id, n, g),
       |m AS (SELECT cg.doc_id, cg.n, sum(least(cg.cc, coalesce(rg.rc, 0))) AS mm
       |  FROM cg LEFT JOIN rg ON cg.doc_id = rg.doc_id AND cg.n = rg.n AND cg.g = rg.g
       |  GROUP BY cg.doc_id, cg.n),
       |p AS (SELECT doc_id,
       |    CAST(coalesce(sum(CASE WHEN n = 1 THEN mm END), 0) AS BIGINT) AS m1,
       |    CAST(coalesce(sum(CASE WHEN n = 2 THEN mm END), 0) AS BIGINT) AS m2,
       |    CAST(coalesce(sum(CASE WHEN n = 3 THEN mm END), 0) AS BIGINT) AS m3,
       |    CAST(coalesce(sum(CASE WHEN n = 4 THEN mm END), 0) AS BIGINT) AS m4
       |  FROM m GROUP BY doc_id),
       |f AS (SELECT l.doc_id, l.c_len, l.r_len,
       |    coalesce(p.m1, 0) AS m1, coalesce(p.m2, 0) AS m2,
       |    coalesce(p.m3, 0) AS m3, coalesce(p.m4, 0) AS m4,
       |    CAST(greatest(l.c_len, 0) AS BIGINT) AS t1,
       |    CAST(greatest(l.c_len - 1, 0) AS BIGINT) AS t2,
       |    CAST(greatest(l.c_len - 2, 0) AS BIGINT) AS t3,
       |    CAST(greatest(l.c_len - 3, 0) AS BIGINT) AS t4,
       |    CASE WHEN l.c_len >= l.r_len THEN CAST(1 AS DOUBLE)
       |         ELSE exp(CAST(1 AS DOUBLE) - CAST(l.r_len AS DOUBLE) / CAST(l.c_len AS DOUBLE)) END AS bp_raw
       |  FROM l LEFT JOIN p USING (doc_id))
       |SELECT doc_id, c_len, r_len, m1, m2, m3, m4, t1, t4,
       |  CASE WHEN c_len >= 4 AND r_len >= 1 THEN round(bp_raw, 6) END AS bp,
       |  CASE WHEN NOT (c_len >= 4 AND r_len >= 1) THEN NULL
       |       WHEN m1 = 0 THEN CAST(0 AS DOUBLE)
       |       ELSE round(bp_raw * exp(CAST(0.25 AS DOUBLE) * (
       |         ln(CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE)) +
       |         ln(CAST(m2 + 1 AS DOUBLE) / CAST(t2 + 1 AS DOUBLE)) +
       |         ln(CAST(m3 + 1 AS DOUBLE) / CAST(t3 + 1 AS DOUBLE)) +
       |         ln(CAST(m4 + 1 AS DOUBLE) / CAST(t4 + 1 AS DOUBLE)))), 6) END AS bleu
       |FROM f ORDER BY doc_id""".stripMargin

  // q193: the vLLM-style chained block-hash prefix analysis replayed
  // independently — preamble synthesis, per-block md5 over chr(31)-joined
  // tokens, the chained prefix keys (list_reduce seeded with '' = the
  // Spark fold from chain_0 = ''), the ≥2-prompt sharing count, the
  // deepest-shared depth and its cache line. One block hash, chain link,
  // or depth off anywhere fails the hash.
  private val prefixCacheSql: String =
    s"""WITH t AS (SELECT doc_id, list_concat(list_concat(
       |    list_transform(range(0, 16), i -> 'p:' || coalesce(source, '') || ':' || CAST(i AS VARCHAR)),
       |    list_transform(range(0, 16), i -> 'q:' || coalesce(source, '') || ':' || coalesce(lang, '') || ':' || CAST(i AS VARCHAR))),
       |    $docToksC) AS toks FROM documents),
       |b AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_toks,
       |    CAST(len(toks) // 16 AS INT) AS n_blocks,
       |    list_transform(range(1, len(toks) // 16 + 1),
       |      k -> md5(array_to_string(list_slice(toks, (k-1)*16+1, k*16), chr(31)))) AS bh
       |  FROM t),
       |c AS (SELECT doc_id, n_toks, n_blocks,
       |    list_transform(range(1, n_blocks + 1),
       |      k -> list_reduce(list_prepend('', list_slice(bh, 1, k)),
       |        (a, x) -> md5(a || x))) AS chains
       |  FROM b),
       |e AS (SELECT doc_id, CAST(k AS INT) AS k, chains[k] AS chain
       |  FROM (SELECT doc_id, unnest(range(1, n_blocks + 1)) AS k, chains FROM c) z),
       |g AS (SELECT chain, count(*) AS cnt FROM e GROUP BY chain),
       |sh AS (SELECT e.doc_id, max(CASE WHEN g.cnt >= 2 THEN e.k END) AS mk
       |  FROM e JOIN g USING (chain) GROUP BY e.doc_id)
       |SELECT c.doc_id, c.n_toks, c.n_blocks,
       |  CAST(coalesce(sh.mk, 0) AS INT) AS shared_blocks,
       |  CAST(coalesce(sh.mk, 0) * 16 AS INT) AS reuse_toks,
       |  CASE WHEN sh.mk IS NOT NULL THEN c.chains[sh.mk] END AS prefix_group
       |FROM c LEFT JOIN sh USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // q192: uncorrupt round-trip — the oracle only re-derives and hashes
  // the ORIGINAL token stream; the Spark side hashes its
  // corrupt-then-uncorrupt reconstruction (the q190 external-law shape).
  private val uncorruptRoundtripSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents)
       |SELECT doc_id, CAST(len(toks) AS INT) AS n_toks,
       |  md5(array_to_string(toks, chr(31))) AS toks_md5
       |FROM t ORDER BY doc_id""".stripMargin

  // q191: sliding windows replayed — K = ceil((n-32)/24) via integer
  // arithmetic, start = k*24, the slice clamps at the list end on both
  // engines (list_slice inclusive-stop == Spark slice length clamp).
  private val slidingWindowsSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |n AS (SELECT doc_id, toks, len(toks) AS n FROM t
       |  WHERE len(toks) >= 1),
       |k AS (SELECT doc_id, toks, n,
       |    CASE WHEN n <= 32 THEN 0 ELSE (n - 32 + 24 - 1) // 24 END AS kk
       |  FROM n),
       |w AS (SELECT doc_id, toks, n, unnest(range(0, kk + 1)) AS win_id
       |  FROM k)
       |SELECT doc_id, CAST(win_id AS INT) AS win_id,
       |  CAST(win_id * 24 AS BIGINT) AS win_start,
       |  CAST(least(32, n - win_id*24) AS INT) AS n_win_toks,
       |  array_to_string(toks[win_id*24 + 1 : win_id*24 + 32], chr(31))
       |    AS win_str
       |FROM w ORDER BY doc_id, win_id""".stripMargin

  // q190: round-trip replay — the oracle hashes the ORIGINAL WordPiece
  // stream (the same greedy walk as q174's oracle); the Spark side hashes
  // its pack-then-unpack reconstruction. Empty streams are absent on both
  // sides (they pack to nothing).
  private val unpackRoundtripSql: String = {
    val vocabSql = q172Vocab.map(v => s"'${v.replace("'", "''")}'")
      .mkString("[", ", ", "]")
    val tail =
      """SELECT doc_id, CAST(len(toks) AS INT) AS n_ids,
        |  md5(array_to_string(toks, chr(31))) AS ids_md5
        |FROM f WHERE len(toks) > 0
        |ORDER BY doc_id""".stripMargin
    wpGreedySql(vocabSql, "lower(coalesce(text, ''))", tailSql = Some(tail))
  }

  // q189: DDP schedule replay — the epochShuffle md5 key (id:epoch:salt),
  // per-epoch row_number over (key, id), step/rank as div/mod worldSize,
  // drop-last via count // 8.
  private val ddpScheduleSql: String =
    s"""WITH d AS (SELECT doc_id FROM documents),
       |e AS (SELECT doc_id, unnest(range(0, 2)) AS epoch FROM d),
       |k AS (SELECT doc_id, epoch,
       |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR) ||
       |      ':graft:shuffle') AS key
       |  FROM e),
       |r AS (SELECT doc_id, epoch,
       |    row_number() OVER (PARTITION BY epoch ORDER BY key, doc_id) - 1
       |      AS rk
       |  FROM k)
       |SELECT doc_id, CAST(epoch AS INT) AS epoch,
       |  CAST(rk // 8 AS BIGINT) AS step, CAST(rk % 8 AS INT) AS device_rank
       |FROM r WHERE rk // 8 < (SELECT count(*) // 8 FROM d)
       |ORDER BY epoch, step, device_rank""".stripMargin

  // q187: GRPO advantage replay — the q185 candidate/score chain, then
  // the exact integer moments per group (count, sum, sum of squares) and
  // the SAME fixed float expression the operator computes: mean = s1/n,
  // std = sqrt(max(s2/n - mean^2, 0)), advantage = (score - mean)/std
  // with the zero-variance -> 0 convention. Every operand is identical on
  // both engines (integer-exact sums, then IEEE ops in the same order),
  // so the doubles hash-compare at full precision.
  private val grpoAdvantageSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |n AS (SELECT doc_id, toks, CAST((len(toks) + 7) // 8 AS INT) AS nt
       |  FROM t),
       |w AS (SELECT doc_id, toks, unnest(range(0, least(nt, 2))) AS w
       |  FROM n),
       |p AS (SELECT doc_id, w,
       |    CASE WHEN w % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    array_to_string(list_slice(toks, w*8 + 1, (w+1)*8), ' ')
       |      AS content
       |  FROM w),
       |g AS (SELECT doc_id,
       |    string_agg('<|im_start|>' || role || chr(10) || content ||
       |      '<|im_end|>' || chr(10), '' ORDER BY w) AS ptext
       |  FROM p GROUP BY doc_id),
       |c AS (SELECT doc_id, toks,
       |    unnest(range(0, 1 + doc_id % 3)) AS j FROM n),
       |cc AS (SELECT doc_id, CAST(j AS INT) AS cand_id,
       |    coalesce(array_to_string(list_slice(toks,
       |      (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE j END)*4 + 17,
       |      (CASE WHEN doc_id % 5 = 0 THEN 0 ELSE j END)*4 + 24), ' '),
       |      '') AS cand
       |  FROM c),
       |sc AS (SELECT cc.doc_id, cc.cand_id,
       |    CAST(length(g.ptext || '<|im_start|>assistant' || chr(10) ||
       |      cc.cand || '<|im_end|>' || chr(10)) % 19 AS INT) AS score
       |  FROM cc JOIN g USING (doc_id)),
       |st AS (SELECT doc_id, count(*) AS n, sum(score) AS s1,
       |    sum(score * score) AS s2 FROM sc GROUP BY doc_id),
       |st2 AS (SELECT doc_id, CAST(n AS BIGINT) AS group_n,
       |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS gm,
       |    sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) -
       |      (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) *
       |      (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)),
       |      CAST(0 AS DOUBLE))) AS gs
       |  FROM st)
       |SELECT sc.doc_id, sc.cand_id, sc.score, st2.group_n,
       |  st2.gm AS group_mean, st2.gs AS group_std,
       |  CASE WHEN st2.gs = CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
       |       ELSE (CAST(sc.score AS DOUBLE) - st2.gm) / st2.gs
       |  END AS advantage
       |FROM sc JOIN st2 USING (doc_id)
       |ORDER BY doc_id, cand_id""".stripMargin

  // q188: masked packing replay — the q180 token/mask chain, then the
  // pack rank: per-doc token counts -> global doc offsets (window
  // prefix-sum over doc_id order), g = offset + ord - 1, chunk = g DIV
  // 256, chunk streams re-aggregated in global order and every
  // (doc, off, len) span re-derived from min(g)/count per (chunk, doc).
  private val sftPackSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |n AS (SELECT doc_id, toks, CAST((len(toks) + 7) // 8 AS INT) AS nt
       |  FROM t),
       |w AS (SELECT doc_id, toks, unnest(range(0, nt)) AS w FROM n),
       |p AS (SELECT doc_id, w,
       |    CASE WHEN w % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    array_to_string(list_slice(toks, w*8 + 1, (w+1)*8), ' ')
       |      AS content
       |  FROM w),
       |q AS (SELECT doc_id, w, role, content,
       |    12 + length(role) + 1 + length(content) + 10 + 1 AS plen FROM p),
       |o AS (SELECT doc_id, w, role, content,
       |    coalesce(sum(plen) OVER (PARTITION BY doc_id ORDER BY w
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS poff
       |  FROM q),
       |g AS (SELECT doc_id,
       |    string_agg('<|im_start|>' || role || chr(10) || content ||
       |      '<|im_end|>' || chr(10), '' ORDER BY w) AS chat_text
       |  FROM o GROUP BY doc_id),
       |sp AS (SELECT doc_id, poff + 12 + length(role) + 1 AS soff,
       |    length(content) + 10 AS slen FROM o WHERE role = 'assistant'),
       |ts AS (SELECT doc_id,
       |    string_split_regex(chat_text, '[\n ]') AS tl FROM g),
       |tn AS (SELECT doc_id, tl, unnest(range(1, len(tl) + 1)) AS ord
       |  FROM ts),
       |tok AS (SELECT doc_id, ord, tl[ord] AS tok FROM tn),
       |off AS (SELECT doc_id, tok, ord,
       |    coalesce(sum(length(tok) + 1) OVER (PARTITION BY doc_id
       |      ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND 1
       |      PRECEDING), 0) AS toff
       |  FROM tok),
       |m AS (SELECT f.doc_id, f.ord, f.tok,
       |    CASE WHEN EXISTS (SELECT 1 FROM sp
       |        WHERE sp.doc_id = f.doc_id
       |          AND f.toff < sp.soff + sp.slen
       |          AND f.toff + length(f.tok) > sp.soff)
       |      THEN 1 ELSE 0 END AS mk
       |  FROM off f),
       |cnt AS (SELECT doc_id, count(*) AS c FROM m GROUP BY doc_id),
       |doff AS (SELECT doc_id, coalesce(sum(c) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS gd
       |  FROM cnt),
       |ck AS (SELECT m.doc_id, m.tok, m.mk, doff.gd + m.ord - 1 AS g,
       |    CAST((doff.gd + m.ord - 1) // 256 AS BIGINT) AS chunk
       |  FROM m JOIN doff USING (doc_id)),
       |agg AS (SELECT chunk, CAST(count(*) AS INT) AS n_toks,
       |    array_to_string(list(tok ORDER BY g), chr(31)) AS toks_str,
       |    array_to_string(list(CAST(mk AS VARCHAR) ORDER BY g), '')
       |      AS mask_str
       |  FROM ck GROUP BY chunk),
       |spn AS (SELECT chunk, doc_id, min(g) AS mg, count(*) AS sl
       |  FROM ck GROUP BY chunk, doc_id),
       |sstr AS (SELECT chunk, string_agg(doc_id || ':' ||
       |    CAST(mg - chunk*256 AS VARCHAR) || ':' || sl, ' ' ORDER BY mg)
       |    AS spans_str FROM spn GROUP BY chunk)
       |SELECT agg.chunk, agg.toks_str, agg.mask_str, agg.n_toks,
       |  sstr.spans_str
       |FROM agg JOIN sstr USING (chunk) ORDER BY agg.chunk""".stripMargin

  // q186: truncation replay — the q177 chain rebuilt (full turn set), the
  // kept window [s, tl) at maxLen 200 / side left, and per-span interval
  // algebra: a = max(off, s), b = min(off + len, tl), keep iff b > a,
  // re-based to a - s. Docs with no assistant turns (nt = 1) or with every
  // span cut away coalesce to '' exactly like the Spark side's filter +
  // array_join. substring's literal 200 clamps at end-of-string, the same
  // value the operator's e - s computes.
  private val chatTruncateSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |n AS (SELECT doc_id, toks, CAST((len(toks) + 7) // 8 AS INT) AS nt
       |  FROM t),
       |w AS (SELECT doc_id, toks, unnest(range(0, nt)) AS w FROM n),
       |p AS (SELECT doc_id, w,
       |    CASE WHEN w % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    array_to_string(list_slice(toks, w*8 + 1, (w+1)*8), ' ')
       |      AS content
       |  FROM w),
       |q AS (SELECT doc_id, w, role, content,
       |    12 + length(role) + 1 + length(content) + 10 + 1 AS plen FROM p),
       |o AS (SELECT doc_id, w, role, content, plen,
       |    coalesce(sum(plen) OVER (PARTITION BY doc_id ORDER BY w
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS poff
       |  FROM q),
       |tot AS (SELECT doc_id, CAST(sum(plen) AS BIGINT) AS tl,
       |    string_agg('<|im_start|>' || role || chr(10) || content ||
       |      '<|im_end|>' || chr(10), '' ORDER BY w) AS chat_text
       |  FROM o GROUP BY doc_id),
       |sp AS (SELECT o.doc_id, o.w,
       |    greatest(tot.tl - 200, 0) AS s,
       |    greatest(o.poff + 12 + length(o.role) + 1,
       |      greatest(tot.tl - 200, 0)) AS a,
       |    least(o.poff + 12 + length(o.role) + 1 + length(o.content) + 10,
       |      tot.tl) AS b
       |  FROM o JOIN tot USING (doc_id) WHERE o.role = 'assistant'),
       |agg AS (SELECT doc_id,
       |    string_agg(CASE WHEN b > a THEN (a - s) || ':' || (b - a) END,
       |      ' ' ORDER BY w) AS spans_str
       |  FROM sp GROUP BY doc_id)
       |SELECT tot.doc_id, tot.tl AS orig_len,
       |  CAST(greatest(tot.tl - 200, 0) AS BIGINT) AS kept_from,
       |  substring(tot.chat_text, CAST(greatest(tot.tl - 200, 0) + 1
       |    AS INT), 200) AS trunc_text,
       |  coalesce(agg.spans_str, '') AS spans_str
       |FROM tot LEFT JOIN agg USING (doc_id)
       |ORDER BY tot.doc_id""".stripMargin

  // q184: the ENTIRE pretraining pipeline replayed in one chain — fixture
  // synthesis (token-line bodies, planted template dup groups, page URLs),
  // URL keep-best + blocklist, C4 line/page rules, the seven Gopher gates
  // (over the C4-CLEANED text, matching refinedWebFate's stage order),
  // fingerprint + exact-Jaccard-closure KEEP-BEST dedup over the ORIGINAL
  // fixture text (the stored text is what flows downstream; q138 pins the
  // min-id variant), the sqrt-weight temperature cut by lang, the greedy
  // WordPiece walk (wpGreedySql parameterized to read the mixture
  // survivors), the global (doc_id, position) pack rank at capacity 512,
  // and shard membership chunk // 8 with replayed manifest counts. The
  // URLs are constructed canonical (no scheme/www/param/slash variants),
  // so the canonicalization replay reduces to identity — q134/q138 pin
  // the full rule chain. Multiply-read CTEs are MATERIALIZED (the q138
  // lesson: DuckDB inlines plain CTEs per reference and recursive
  // closures compound the re-execution).
  private def pretrainE2eSql: String = {
    val vocabSql = q172Vocab.map(v => s"'${v.replace("'", "''")}'")
      .mkString("[", ", ", "]")
    def lit1(s: String) = "'" + s.replace("'", "''") + "'"
    def tmplSql(t: String) =
      t.split("\n").map(lit1).mkString(" || chr(10) || ")
    val tmplCase = "CASE CAST(doc_id % 4 AS INT) " +
      q184Templates.zipWithIndex.map { case (t, k) =>
        if (k < 3) s"WHEN $k THEN ${tmplSql(t)}"
        else s"ELSE ${tmplSql(t)} END"
      }.mkString(" ")
    val ctes =
      s"""pr AS MATERIALIZED (SELECT greatest(count(*)*2//5, 1) AS np,
         |    greatest(least(count(*)//2,
         |      (SELECT count(*) FROM embeddings)), 1) AS ek FROM documents),
         |tk0 AS (SELECT doc_id, $docToksC AS t FROM documents),
         |ln0 AS (SELECT doc_id, t,
         |    greatest(CAST(ceil(len(t)/8.0) AS INT), 1) AS n FROM tk0),
         |li0 AS (SELECT doc_id, t, unnest(range(0, n)) AS i FROM ln0),
         |bl0 AS (SELECT doc_id, i,
         |    array_to_string(t[i*8+1 : i*8+8], ' ') || '.' AS line FROM li0),
         |bd0 AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS b
         |  FROM bl0 GROUP BY 1),
         |tm0 AS (SELECT doc_id, $tmplCase AS tmpl FROM documents),
         |fx AS MATERIALIZED (SELECT d.doc_id, d.n_chars, d.lang,
         |    CASE WHEN d.doc_id % 9 = 0 THEN tm0.tmpl
         |         WHEN d.doc_id % 9 = 1 THEN tm0.tmpl || chr(10) ||
         |           ${lit1(q184Variant)}
         |         ELSE bd0.b || chr(10) ||
         |           'that is all we have with the data.' ||
         |           (CASE WHEN d.doc_id % 13 = 0 THEN chr(10) ||
         |             'lorem ipsum boilerplate tail.' ELSE '' END)
         |    END AS body,
         |    'http://example' ||
         |      CAST((d.doc_id % (SELECT np FROM pr)) % 4 AS VARCHAR) ||
         |      '.com/page/' ||
         |      CAST(d.doc_id % (SELECT np FROM pr) AS VARCHAR) AS url
         |  FROM documents d JOIN bd0 USING (doc_id) JOIN tm0 USING (doc_id)),
         |s1 AS (SELECT doc_id FROM fx
         |  QUALIFY row_number() OVER (PARTITION BY url
         |    ORDER BY n_chars DESC, doc_id) = 1),
         |s2 AS (SELECT s1.doc_id FROM s1 JOIN fx USING (doc_id)
         |  WHERE NOT contains(url, 'example3.com')),
         |l0 AS (SELECT f.doc_id, f.body AS tx,
         |    list_filter(string_split(f.body, chr(10)),
         |      l -> len(trim(l)) > 0) AS lns
         |  FROM fx f JOIN s2 USING (doc_id)),
         |k0 AS (SELECT doc_id, tx, lns,
         |    list_filter(lns, l -> regexp_matches(trim(l), '[.!?"]$$')
         |      AND len(list_filter(string_split_regex(trim(l), '\\s+'),
         |            w -> len(w) > 0)) >= 5
         |      AND NOT contains(lower(l), 'javascript')) AS keptl
         |  FROM l0),
         |c0 AS MATERIALIZED (SELECT doc_id, tx,
         |    coalesce(array_to_string(keptl, chr(10)), '') AS ct FROM k0),
         |s3 AS (SELECT doc_id FROM c0
         |  WHERE len(regexp_extract_all(ct, '[.!?]')) >= 3
         |    AND NOT contains(lower(tx), 'lorem ipsum')
         |    AND NOT contains(tx, '{')),
         |g0 AS (SELECT c0.doc_id, c0.ct AS tx,
         |    string_split_regex(lower(trim(c0.ct)), '\\s+') AS gt
         |  FROM c0 JOIN s3 USING (doc_id)),
         |w0 AS (SELECT doc_id,
         |    len(list_filter(gt, x -> len(x) > 0)) AS n_words,
         |    list_sum(list_transform(gt, x -> CAST(len(x) AS BIGINT))) AS char_sum,
         |    len(regexp_extract_all(tx, '#'))
         |      + len(regexp_extract_all(tx, '\\.\\.\\.')) AS n_symbols,
         |    list_filter(string_split_regex(tx, '\\n'),
         |      l -> len(trim(l)) > 0) AS lns,
         |    len(list_filter(gt, x -> regexp_matches(x, '\\p{L}'))) AS n_alpha,
         |    len(list_filter(['the','be','to','of','and','that','have','with'],
         |      sw -> list_contains(gt, sw))) AS stop_hits
         |  FROM g0),
         |s4 AS (SELECT doc_id FROM w0
         |  WHERE n_words BETWEEN 50 AND 100000
         |    AND n_words > 0
         |    AND CAST(char_sum AS DOUBLE)/n_words BETWEEN 3.0 AND 10.0
         |    AND CAST(n_symbols AS DOUBLE)/n_words <= 0.1
         |    AND len(lns) > 0 AND CAST(len(list_filter(lns,
         |        l -> regexp_matches(trim(l), '^[-*•‣▪]')))
         |        AS DOUBLE)/len(lns) <= 0.9
         |    AND CAST(len(list_filter(lns,
         |        l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$')))
         |        AS DOUBLE)/len(lns) <= 0.3
         |    AND CAST(n_alpha AS DOUBLE)/n_words >= 0.8
         |    AND stop_hits >= 2),
         |fq AS MATERIALIZED (SELECT f.doc_id, f.n_chars, f.lang, f.body
         |  FROM fx f JOIN s4 USING (doc_id)),
         |f2 AS MATERIALIZED (SELECT doc_id, n_chars,
         |    md5(regexp_replace(lower(trim(body)), '\\s+', ' ', 'g')) AS fp
         |  FROM fq),
         |reps AS (SELECT doc_id FROM f2
         |  QUALIFY row_number() OVER (PARTITION BY fp
         |    ORDER BY n_chars DESC, doc_id) = 1),
         |rdocs AS MATERIALIZED (SELECT fq.doc_id, fq.body AS text
         |  FROM fq JOIN reps USING (doc_id)),
         |${jaccardClosureCtesOver("rdocs", "dk")},
         |dkclusters AS (SELECT id, min(x) AS cluster FROM dkreach GROUP BY id),
         |dkcs AS MATERIALIZED (SELECT c.id, c.cluster, f2.n_chars
         |  FROM dkclusters c JOIN f2 ON c.id = f2.doc_id),
         |dkwin AS (SELECT id AS wid FROM dkcs
         |  QUALIFY row_number() OVER (PARTITION BY cluster
         |    ORDER BY n_chars DESC, id) = 1),
         |ddq AS MATERIALIZED (SELECT doc_id FROM rdocs
         |  WHERE doc_id NOT IN (SELECT id FROM dkcs
         |    WHERE id NOT IN (SELECT wid FROM dkwin))),
         |mc AS (SELECT f.lang, CAST(count(*) AS DOUBLE) AS n
         |  FROM ddq JOIN fx f USING (doc_id)
         |  WHERE f.lang IS NOT NULL GROUP BY 1),
         |mw AS (SELECT lang, n, sqrt(n) AS wt FROM mc),
         |mt AS (SELECT min(n / wt) AS t FROM mw),
         |mcut AS (SELECT lang,
         |    CAST(floor(least(CAST(1.0 AS DOUBLE),
         |      (SELECT t FROM mt) * wt / n) * 10000.0 + 0.5) AS BIGINT) AS cut
         |  FROM mw),
         |mixdocs AS MATERIALIZED (SELECT f.doc_id, f.body
         |  FROM ddq JOIN fx f USING (doc_id) JOIN mcut ON f.lang = mcut.lang
         |  WHERE CAST(('0x' || substr(md5(f.doc_id || ':graft:temp'), 1, 8))
         |    AS BIGINT) % 10000 < mcut.cut),
         |""".stripMargin
    val tail =
      """,
        |u AS (SELECT doc_id, unnest(toks) AS t,
        |    unnest(range(1, len(toks)+1)) AS ti FROM f),
        |g2 AS (SELECT doc_id, t,
        |    row_number() OVER (ORDER BY doc_id, ti) - 1 AS rn FROM u),
        |c2 AS (SELECT rn // 512 AS chunk, list(t ORDER BY rn) AS ids FROM g2
        |  GROUP BY 1),
        |sp2 AS (SELECT rn // 512 AS chunk, doc_id, min(rn) % 512 AS off,
        |    count(*) AS len FROM g2 GROUP BY 1, 2),
        |sps2 AS (SELECT chunk, array_to_string(list(
        |    CAST(doc_id AS VARCHAR) || ':' || CAST(off AS VARCHAR) || ':' ||
        |    CAST(len AS VARCHAR) ORDER BY off), ' ') AS spans_str
        |  FROM sp2 GROUP BY 1),
        |sh AS (SELECT chunk // 8 AS shard_idx,
        |    CAST(count(*) AS BIGINT) AS shard_rows FROM c2 GROUP BY 1)
        |SELECT CAST(c2.chunk AS BIGINT) AS chunk,
        |  CAST(len(ids) AS INT) AS n_ids,
        |  md5(array_to_string(ids, chr(31))) AS ids_hash,
        |  sps2.spans_str,
        |  CAST(c2.chunk // 8 AS BIGINT) AS shard_idx, sh.shard_rows,
        |  sh.shard_rows AS rows_read, TRUE AS bytes_pos
        |FROM c2 JOIN sps2 USING (chunk)
        |  JOIN sh ON sh.shard_idx = c2.chunk // 8
        |ORDER BY chunk""".stripMargin
    wpGreedySql(vocabSql, "lower(coalesce(body, ''))", extraCtes = ctes,
      tailSql = Some(tail), fromRel = "mixdocs")
  }

  // q183: the semantic-order walk replayed — IVF assignment (cross join
  // against the 16 pivots, 6-dp cosine, (pcos DESC, pid) winner), then
  // the greedy chain as a recursive CTE: one recursion level = one hop in
  // every cell (lockstep), state carries the visited list and the current
  // vector, and the per-hop argmax is a struct max over (cos6, -id) — the
  // winner's vector rides the same struct so the next hop needs no join
  // back. Recursion depth = the largest cell, never the corpus.
  private val semanticOrderSql: String =
    s"""WITH RECURSIVE
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
       |  FROM e),
       |nz AS (SELECT * FROM n WHERE nrm > 0),
       |pv AS (SELECT vec_id AS pid, v AS pvv, nrm AS pnrm FROM nz
       |  ORDER BY vec_id LIMIT 16),
       |asg0 AS (SELECT nz.vec_id, nz.v, nz.nrm, pv.pid,
       |    round(list_sum(list_transform(range(1, 65),
       |      i -> nz.v[i] * pv.pvv[i])) / (nz.nrm * pv.pnrm), 6) AS pcos
       |  FROM nz CROSS JOIN pv),
       |asg AS (SELECT vec_id, v, nrm, pid AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY pcos DESC, pid) AS rn FROM asg0)
       |  WHERE rn = 1),
       |init AS (SELECT cell, min(vec_id) AS cur FROM asg GROUP BY cell),
       |st AS (
       |  SELECT i.cell, 0 AS pos, i.cur, [i.cur] AS visited,
       |    a.v AS curv, a.nrm AS curnrm
       |  FROM init i JOIN asg a ON a.vec_id = i.cur
       |  UNION ALL
       |  SELECT st.cell, st.pos + 1,
       |    -(max(struct_pack(s := round(list_sum(list_transform(range(1, 65),
       |        i -> st.curv[i] * a.v[i])) / (st.curnrm * a.nrm), 6),
       |      ni := -a.vec_id)).ni),
       |    list_append(st.visited,
       |      -(max(struct_pack(s := round(list_sum(list_transform(range(1, 65),
       |          i -> st.curv[i] * a.v[i])) / (st.curnrm * a.nrm), 6),
       |        ni := -a.vec_id)).ni)),
       |    max(struct_pack(s := round(list_sum(list_transform(range(1, 65),
       |        i -> st.curv[i] * a.v[i])) / (st.curnrm * a.nrm), 6),
       |      ni := -a.vec_id, v := a.v, nrm := a.nrm)).v,
       |    max(struct_pack(s := round(list_sum(list_transform(range(1, 65),
       |        i -> st.curv[i] * a.v[i])) / (st.curnrm * a.nrm), 6),
       |      ni := -a.vec_id, v := a.v, nrm := a.nrm)).nrm
       |  FROM st JOIN asg a ON a.cell = st.cell
       |    AND NOT list_contains(st.visited, a.vec_id)
       |  GROUP BY st.cell, st.pos, st.visited, st.curv, st.curnrm
       |)
       |SELECT cur AS vec_id, cell, pos AS ic_order FROM st
       |ORDER BY vec_id""".stripMargin

  // q182: the FFD packing replayed step for step — global (len desc, id)
  // rank → 64-doc groups → a recursive-CTE state machine that carries
  // each group's per-batch fills LIST and appends one seat per step
  // (first-fit = list_position of the first batch with room, 1-based in
  // DuckDB; a no-fit opens batch len(fills)). Groups advance in lockstep
  // (one recursion level = one seat in every live group), so the
  // recursion depth is the group size, never the corpus.
  private val ffdBinpackSql: String =
    s"""WITH RECURSIVE
       |t AS (SELECT doc_id, CAST(len($docToksC) AS BIGINT) AS len
       |  FROM documents),
       |ranked AS (SELECT doc_id, len,
       |    row_number() OVER (ORDER BY len DESC, doc_id) - 1 AS rk FROM t),
       |it AS (SELECT CAST(rk // 64 AS INT) AS g, CAST(rk % 64 AS INT) AS s,
       |    doc_id, len FROM ranked),
       |st AS (
       |  SELECT g, 0 AS i, CAST([] AS BIGINT[]) AS fills,
       |         CAST([] AS STRUCT(id BIGINT, b INT)[]) AS asg
       |  FROM (SELECT DISTINCT g FROM it)
       |  UNION ALL
       |  SELECT st.g, st.i + 1,
       |    CASE WHEN list_position(list_transform(st.fills,
       |          f -> f + it.len <= 256), true) > 0
       |      THEN list_transform(st.fills, (f, j) ->
       |        CASE WHEN j = list_position(list_transform(st.fills,
       |            f2 -> f2 + it.len <= 256), true)
       |          THEN f + it.len ELSE f END)
       |      ELSE list_append(st.fills, it.len) END,
       |    list_append(st.asg, {'id': it.doc_id,
       |      'b': CAST(CASE WHEN list_position(list_transform(st.fills,
       |            f -> f + it.len <= 256), true) > 0
       |        THEN list_position(list_transform(st.fills,
       |            f -> f + it.len <= 256), true) - 1
       |        ELSE len(st.fills) END AS INT)})
       |  FROM st JOIN it ON it.g = st.g AND it.s = st.i
       |),
       |fin AS (SELECT g, asg FROM st
       |  QUALIFY row_number() OVER (PARTITION BY g ORDER BY i DESC) = 1),
       |ex AS (SELECT g, unnest(asg) AS a FROM fin)
       |SELECT t.doc_id, CAST(t.len AS INT) AS n_tok, ex.g AS pack_group,
       |  a.b AS batch_in_group
       |FROM ex JOIN t ON t.doc_id = a.id ORDER BY doc_id""".stripMargin

  // q181: both preference serializations replayed — prompt pieces are the
  // first (nt+1)//2 turns, branch pieces the rest; the rejected branch
  // appends ' [no]' (5 chars) per turn, so its span offsets diverge from
  // the chosen branch by 5 per PRECEDING branch turn and its span lengths
  // by 5 — the two branch prefix-sums run independently (poc/por), and
  // the shared prompt prefix is pinned by construction (prompt_text
  // aggregated once, concatenated into both outputs).
  private val preferencePairsSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |n AS (SELECT doc_id, toks, CAST((len(toks) + 7) // 8 AS INT) AS nt
       |  FROM t),
       |w AS (SELECT doc_id, nt, toks, unnest(range(0, nt)) AS w FROM n),
       |p AS (SELECT doc_id, w, CAST((nt + 1) // 2 AS INT) AS np,
       |    CASE WHEN w % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    array_to_string(list_slice(toks, w*8 + 1, (w+1)*8), ' ')
       |      AS content
       |  FROM w),
       |q AS (SELECT doc_id, w, np, role, content,
       |    12 + length(role) + 1 + length(content) + 10 + 1 AS plen FROM p),
       |pr AS (SELECT doc_id,
       |    string_agg('<|im_start|>' || role || chr(10) || content ||
       |      '<|im_end|>' || chr(10), '' ORDER BY w) AS prompt_text,
       |    CAST(sum(plen) AS BIGINT) AS prefix_len
       |  FROM q WHERE w < np GROUP BY doc_id),
       |br AS (SELECT q.doc_id, q.w, q.role, q.content, prefix_len,
       |    coalesce(sum(q.plen) OVER (PARTITION BY q.doc_id ORDER BY q.w
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS poc,
       |    coalesce(sum(q.plen + 5) OVER (PARTITION BY q.doc_id ORDER BY q.w
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS por
       |  FROM q JOIN pr USING (doc_id) WHERE q.w >= q.np),
       |bg AS (SELECT doc_id,
       |    string_agg('<|im_start|>' || role || chr(10) || content ||
       |      '<|im_end|>' || chr(10), '' ORDER BY w) AS ctail,
       |    string_agg('<|im_start|>' || role || chr(10) || content ||
       |      ' [no]' || '<|im_end|>' || chr(10), '' ORDER BY w) AS rtail,
       |    coalesce(string_agg(CASE WHEN role = 'assistant' THEN
       |        (prefix_len + poc + 12 + length(role) + 1) || ':' ||
       |        (length(content) + 10) END, ' ' ORDER BY w), '') AS cs,
       |    coalesce(string_agg(CASE WHEN role = 'assistant' THEN
       |        (prefix_len + por + 12 + length(role) + 1) || ':' ||
       |        (length(content) + 15) END, ' ' ORDER BY w), '') AS rs
       |  FROM br GROUP BY doc_id)
       |SELECT pr.doc_id, pr.prefix_len,
       |  pr.prompt_text || coalesce(bg.ctail, '') AS chosen_text,
       |  pr.prompt_text || coalesce(bg.rtail, '') AS rejected_text,
       |  coalesce(bg.cs, '') AS chosen_spans_str,
       |  coalesce(bg.rs, '') AS rejected_spans_str
       |FROM pr LEFT JOIN bg USING (doc_id) ORDER BY doc_id""".stripMargin

  // q178: length bucketing replayed — bucket/seats are pure integer
  // arithmetic and the per-bucket rank is one row_number over doc_id, so
  // batch and seat assignments are exact integer div/mod of the same rank
  // the Spark side derives from its two-phase (partition, bucket) counts.
  private val lengthBucketsSql: String =
    s"""WITH t AS (SELECT doc_id, CAST(len($docToksC) AS INT) AS n_tok
       |  FROM documents),
       |b AS (SELECT doc_id, n_tok,
       |    CAST(greatest((n_tok + 15) // 16, 1) AS INT) AS bucket FROM t),
       |p AS (SELECT doc_id, n_tok, bucket,
       |    CAST(bucket AS BIGINT) * 16 AS padded_len,
       |    greatest(256 // (CAST(bucket AS BIGINT) * 16), 1) AS perb FROM b),
       |r AS (SELECT doc_id, n_tok, bucket, padded_len, perb,
       |    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1 AS rk
       |  FROM p)
       |SELECT doc_id, n_tok, bucket, padded_len,
       |  CAST(rk // perb AS BIGINT) AS batch_in_bucket,
       |  CAST(rk % perb AS INT) AS seq_in_batch
       |FROM r ORDER BY doc_id""".stripMargin

  // q180: the token mask replayed — rebuild q177's text and spans, then
  // re-derive every token offset independently: single-char separators
  // make token k's start sum(len+1 over j<k) (one window prefix-sum over
  // the unnested-with-ordinality token stream), and the mask bit is the
  // interval-overlap EXISTS against the per-doc span set. '[\n ]' is a
  // literal newline-or-space class in BOTH engines (RE2 interprets \n in
  // a single-quoted literal; Java the same in the Scala string).
  private val sftTokenMaskSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |n AS (SELECT doc_id, toks, CAST((len(toks) + 7) // 8 AS INT) AS nt
       |  FROM t),
       |w AS (SELECT doc_id, toks, unnest(range(0, nt)) AS w FROM n),
       |p AS (SELECT doc_id, w,
       |    CASE WHEN w % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       |    array_to_string(list_slice(toks, w*8 + 1, (w+1)*8), ' ')
       |      AS content
       |  FROM w),
       |q AS (SELECT doc_id, w, role, content,
       |    12 + length(role) + 1 + length(content) + 10 + 1 AS plen FROM p),
       |o AS (SELECT doc_id, w, role, content,
       |    coalesce(sum(plen) OVER (PARTITION BY doc_id ORDER BY w
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS poff
       |  FROM q),
       |g AS (SELECT doc_id,
       |    string_agg('<|im_start|>' || role || chr(10) || content ||
       |      '<|im_end|>' || chr(10), '' ORDER BY w) AS chat_text
       |  FROM o GROUP BY doc_id),
       |sp AS (SELECT doc_id, poff + 12 + length(role) + 1 AS soff,
       |    length(content) + 10 AS slen FROM o WHERE role = 'assistant'),
       |ts AS (SELECT doc_id,
       |    string_split_regex(chat_text, '[\n ]') AS tl FROM g),
       |tn AS (SELECT doc_id, tl, unnest(range(1, len(tl) + 1)) AS ord
       |  FROM ts),
       |tok AS (SELECT doc_id, ord, tl[ord] AS tok FROM tn),
       |off AS (SELECT doc_id, tok, ord,
       |    coalesce(sum(length(tok) + 1) OVER (PARTITION BY doc_id
       |      ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND 1
       |      PRECEDING), 0) AS toff
       |  FROM tok),
       |m AS (SELECT f.doc_id, f.ord, f.tok,
       |    CASE WHEN EXISTS (SELECT 1 FROM sp
       |        WHERE sp.doc_id = f.doc_id
       |          AND f.toff < sp.soff + sp.slen
       |          AND f.toff + length(f.tok) > sp.soff)
       |      THEN 1 ELSE 0 END AS mk
       |  FROM off f)
       |SELECT doc_id,
       |  array_to_string(list(tok ORDER BY ord), chr(31)) AS toks_str,
       |  array_to_string(list(CAST(mk AS VARCHAR) ORDER BY ord), '')
       |    AS mask_str
       |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // q176: span corruption replayed — per full 20-token window the 52-bit
  // hex draw mod 18 places the 3-token span; corrupted = pre-slice +
  // sentinel + post-slice per window (ordered) + unmasked tail; targets =
  // sentinel + span per window + the closing sentinel. list_slice is
  // INCLUSIVE-stop (not length), hence the +s / +s+4 bounds.
  private val spanCorruptSql: String =
    s"""WITH t AS (SELECT doc_id, $docToksC AS toks FROM documents),
       |b AS (SELECT doc_id, toks, len(toks) // 20 AS nw FROM t),
       |w AS (SELECT doc_id, toks, nw, unnest(range(0, nw)) AS w FROM b
       |  WHERE nw >= 1),
       |sp AS (SELECT doc_id, toks, w,
       |    CAST(CAST(('0x' || substr(md5(doc_id || ':' || w ||
       |        ':graft:span'), 1, 13)) AS BIGINT) % 18 AS INT) AS s
       |  FROM w),
       |cor AS (SELECT doc_id,
       |    flatten(list(
       |      list_slice(toks, w*20 + 1, w*20 + s)
       |      || ['<extra_id_' || w || '>']
       |      || list_slice(toks, w*20 + s + 4, (w+1)*20) ORDER BY w))
       |      AS cfrag,
       |    flatten(list(
       |      ['<extra_id_' || w || '>']
       |      || list_slice(toks, w*20 + s + 1, w*20 + s + 3) ORDER BY w))
       |      AS tfrag
       |  FROM sp GROUP BY doc_id)
       |SELECT b.doc_id, CAST(b.nw * 3 AS INT) AS n_masked,
       |  coalesce(array_to_string(coalesce(cor.cfrag, CAST([] AS VARCHAR[]))
       |    || list_slice(b.toks, b.nw*20 + 1, len(b.toks)), chr(31)), '')
       |    AS corrupted_str,
       |  coalesce(array_to_string(CASE WHEN b.nw >= 1
       |    THEN cor.tfrag || ['<extra_id_' || b.nw || '>']
       |    ELSE CAST([] AS VARCHAR[]) END, chr(31)), '') AS targets_str
       |FROM b LEFT JOIN cor USING (doc_id) ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q184_pretrain_e2e" -> pretrainE2eSql,
    "q183_semantic_order" -> semanticOrderSql,
    "q182_ffd_binpack" -> ffdBinpackSql,
    "q181_preference_pairs" -> preferencePairsSql,
    "q197_epoch_waterfill" -> epochWaterfillSql,
    "q198_gae_advantage" -> gaeAdvantageSql,
    "q199_rouge_eval" -> rougeEvalSql,
    "q200_jpeg_meta" -> jpegMetaSql,
    "q201_flac_meta" -> flacMetaSql,
    "q202_spec_accept" -> specAcceptSql,
    "q203_needle_prep" -> needlePrepSql,
    "q204_pass_at_k" -> passAtKSql,
    "q205_bt_arena" -> btArenaSql,
    "q206_distinct_ngrams" -> distinctNgramsSql,
    "q207_anneal_order" -> annealOrderSql,
    "q208_detok_roundtrip" -> detokRoundtripSql,
    "q185_best_of_n" -> bestOfNSql,
    "q186_chat_truncate" -> chatTruncateSql,
    "q187_grpo_advantage" -> grpoAdvantageSql,
    "q188_sft_pack" -> sftPackSql,
    "q189_ddp_schedule" -> ddpScheduleSql,
    "q190_unpack_roundtrip" -> unpackRoundtripSql,
    "q191_sliding_windows" -> slidingWindowsSql,
    "q196_contrastive_triplets" -> contrastiveTripletsSql,
    "q195_majority_vote" -> majorityVoteSql,
    "q194_bleu_eval" -> bleuEvalSql,
    "q193_prefix_cache" -> prefixCacheSql,
    "q192_uncorrupt_roundtrip" -> uncorruptRoundtripSql,
    "q180_sft_token_mask" -> sftTokenMaskSql,
    "q179_mp3_meta" -> mp3MetaSql,
    "q178_length_buckets" -> lengthBucketsSql,
    "q177_chat_sft" -> chatSftSql,
    "q176_span_corrupt" -> spanCorruptSql,
    "q175_fim" -> fimSql,
    "q174_pack_token_ids" -> packTokenIdsSql,
    "q172_wordpiece" -> wordPieceSql,
    "q171_typo_join" -> typoJoinSql,
    "q170_byte_bpe" -> byteBpeSql,
    "q169_incremental_typo" -> incrementalTypoSql,
    "q168_typo_pairs" -> typoPairsSql,
    "q167_accent_fold" -> accentFoldSql,
    "q166_nfc_dedup" -> nfcDedupSql,
    "q165_vocab_coverage" -> vocabCoverageSql,
    "q164_write_shards" -> writeShardsSql,
    "q163_softdedup_weights" -> softDedupWeightsSql,
    "q162_html_extract" -> htmlExtractSql,
    "q160_leakfree_split" -> leakFreeSplitSql,
    "q161_host_rank" -> hostRankSql,
    "q156_bm25_topk" -> bm25TopkSql,
    "q157_bm25_indexed" -> bm25IndexedSql,
    "q158_qnorm_by_source" -> qnormBySourceSql,
    "q159_hybrid_rrf" -> hybridRrfSql,
    "q42_ann_ivf" -> annIvfSql,
    "q112_binary_ann" -> binaryAnnSql,
    "q139_jl_ann" -> jlAnnSql,
    "q141_embedding_drift" -> embeddingDriftSql,
    "q142_hll_vocab" -> hllVocabSql,
    "q147_hll_source_overlap" -> hllOverlapSql,
    "q143_cms_heavy_hitters" -> cmsHeavyHittersSql,
    "q149_length_quantiles" -> lengthQuantilesSql,
    "q152_length_trim" -> lengthTrimSql,
    "q150_bottomk_resemblance" -> bottomkResemblanceSql,
    "q153_onboarding_report" -> onboardingSql,
    "q154_winnow_matches" -> winnowMatchesSql,
    "q155_weighted_sample" -> weightedSampleSql,
    "q151_crossentropy_select" -> crossEntropySelectSql,
    // sequential-fold norm (array order both engines) rounded 6 dp, then
    // the q95 histogram-CDF cut replayed per value block; drop fractions
    // CAST to DOUBLE (the DuckDB bare-decimal gotcha)
    "q114_norm_filter" ->
      s"""WITH $cosineCtes,
         |sc AS (SELECT vec_id, list_transform(v,
         |    x -> x * (1 + CAST(vec_id % 20 AS DOUBLE) / 10.0)) AS v
         |  FROM e),
         |nm AS (SELECT vec_id,
         |    round(sqrt(list_sum(list_transform(v, x -> x*x))), 6) AS vec_norm
         |  FROM sc),
         |h AS (SELECT vec_norm, count(*) AS c FROM nm GROUP BY 1),
         |cw AS (SELECT vec_norm, c, sum(c) OVER (ORDER BY vec_norm) AS cum
         |  FROM h),
         |tt AS (SELECT sum(c) AS tot FROM h)
         |SELECT nm.vec_id, nm.vec_norm
         |FROM nm JOIN cw USING (vec_norm) CROSS JOIN tt
         |WHERE NOT (cum <= floor(tot * CAST(0.1 AS DOUBLE)))
         |  AND NOT (cum - c >= tot - floor(tot * CAST(0.1 AS DOUBLE)))
         |ORDER BY vec_id""".stripMargin,
    // exact integer histogram; bucket floor over a float division in both
    // engines, sums cast off DuckDB's HUGEINT
    "q115_length_histogram" ->
      s"""WITH t AS (SELECT source, len($docToks) AS tc FROM documents)
         |SELECT source, CAST(floor(tc / 20.0) AS BIGINT) AS len_bucket,
         |  CAST(count(*) AS BIGINT) AS docs,
         |  CAST(sum(tc) AS BIGINT) AS tokens,
         |  CAST(floor(tc / 20.0) AS BIGINT) * 20 AS bucket_lo
         |FROM t GROUP BY 1, 2
         |ORDER BY source, len_bucket""".stripMargin,
    // full n-gram replay: per-doc gram counts, gram totals + doc frequency,
    // rank under the same (occurrences desc, gram) total order; sums cast
    // off DuckDB's HUGEINT. Spark's limit(50) is deterministic because the
    // order is total (gram is unique per group).
    "q116_top_ngrams" ->
      s"""WITH t AS (SELECT doc_id, $docToksC AS t FROM documents),
         |g AS (SELECT doc_id, concat_ws(' ', t[CAST(i AS INT)],
         |        t[CAST(i+1 AS INT)], t[CAST(i+2 AS INT)]) AS gram
         |      FROM (SELECT doc_id, t, unnest(range(1, len(t)-1)) AS i
         |            FROM t WHERE len(t) >= 3)),
         |pd AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
         |gl AS (SELECT gram, CAST(sum(c) AS BIGINT) AS occurrences,
         |         CAST(count(*) AS BIGINT) AS doc_freq
         |       FROM pd GROUP BY 1 HAVING count(*) >= 2),
         |r AS (SELECT gram, occurrences, doc_freq,
         |        CAST(ROW_NUMBER() OVER (ORDER BY occurrences DESC, gram)
         |          AS INT) AS rank
         |      FROM gl)
         |SELECT gram, occurrences, doc_freq, rank FROM r WHERE rank <= 50
         |ORDER BY rank""".stripMargin,
    // both sides' fingerprints replayed analytically (afpCtesOver),
    // pairwise Hamming via bit_count(xor) over the unsigned halves, kept
    // = no seen signature within 1
    "q129_incremental_audio_dedup" ->
      s"""WITH arr AS (
         |  SELECT doc_id + 5000 AS k, doc_id AS base
         |  FROM documents WHERE doc_id < 100
         |  UNION ALL
         |  SELECT doc_id + 5000 AS k, doc_id + 1000000 AS base
         |  FROM documents WHERE doc_id BETWEEN 100 AND 149),
         |sn AS (SELECT doc_id AS k, doc_id AS base FROM documents),
         |${afpCtesOver("arr", "x")},
         |${afpCtesOver("sn", "y")},
         |hit AS (SELECT DISTINCT a.k FROM xs a, ys s
         |        WHERE bit_count(xor(a.hi, s.hi))
         |            + bit_count(xor(a.lo, s.lo)) <= 1)
         |SELECT k AS doc_id FROM arr
         |WHERE k NOT IN (SELECT k FROM hit)
         |ORDER BY doc_id""".stripMargin,
    // the identical RE2-safe chain with the 'g' flag (DuckDB replaces only
    // the first match by default); entity decode order mirrored (&amp; last)
    "q128_html_extract" ->
      """WITH p AS (SELECT doc_id,
        |    '<html><head><title>t</title><style>body{color:red}</style>'
        |    || '<script>var x = ''<p>'';</script></head><body><h1>Doc '
        |    || CAST(doc_id AS VARCHAR) || '</h1>' || chr(10) || '<p>' || text
        |    || '</p><!-- nav --><div>footer &amp; &lt;links&gt;</div></body></html>'
        |    AS page
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      coalesce(page, ''),
        |      '(?is)<script[^>]*>.*?</script\s*>', ' ', 'g'),
        |      '(?is)<style[^>]*>.*?</style\s*>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '(?s)<[^>]*>', ' ', 'g') AS t1
        |  FROM p),
        |e AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(t1,
        |      '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
        |      '&quot;', '"', 'g'), '&#39;', CHR(39), 'g'), '&amp;', '&', 'g')
        |      AS t2
        |  FROM c)
        |SELECT doc_id, trim(regexp_replace(t2, '\s+', ' ', 'g')) AS clean_text
        |FROM e ORDER BY doc_id""".stripMargin,
    // the shingle CTEs driven with source as the key (source-level distinct
    // gram sets), gram self-join, exact integers; overlap divides the same
    // exact integers in both engines
    "q127_source_overlap" ->
      s"""WITH ${shingleCtesOver(
             "(SELECT source AS doc_id, coalesce(text, '') AS text " +
               "FROM documents)", 8, "o")},
         |sz AS (SELECT doc_id AS source, count(*) AS n FROM od GROUP BY 1),
         |co AS (SELECT a.doc_id AS source1, b.doc_id AS source2,
         |         count(*) AS shared
         |       FROM od a JOIN od b ON a.g = b.g AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT source1, source2, CAST(shared AS BIGINT) AS shared_grams,
         |  CAST(s1.n AS BIGINT) AS n1, CAST(s2.n AS BIGINT) AS n2,
         |  CAST(shared AS DOUBLE) / CAST(least(s1.n, s2.n) AS DOUBLE)
         |    AS overlap
         |FROM co JOIN sz s1 ON source1 = s1.source
         |        JOIN sz s2 ON source2 = s2.source
         |ORDER BY source1, source2""".stripMargin,
    // q68's synthetic GIF formula (gray = (id+11f+3x+5y)%256, dims/frames
    // from the id) at the 72 sampled grid points per frame, per-frame
    // adjacent-gray bits, strict per-bit majority across frames, integer
    // shift packing
    "q126_video_dhash" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(16 + doc_id % 5 AS BIGINT) AS w,
        |    CAST(12 + (doc_id * 3) % 5 AS BIGINT) AS h,
        |    CAST(2 + doc_id % 3 AS BIGINT) AS nf
        |  FROM documents),
        |g AS (SELECT doc_id, nf, f.range AS f, gy.range AS gy, gx.range AS gx,
        |    (gx.range * w) // 9 AS sx, (gy.range * h) // 8 AS sy
        |  FROM dims, range(0, 4) f, range(0, 8) gy, range(0, 9) gx
        |  WHERE f.range < nf),
        |gr AS (SELECT doc_id, nf, f, gy, gx,
        |    (doc_id + 11*f + 3*sx + 5*sy) % 256 AS gray
        |  FROM g),
        |b AS (SELECT a.doc_id, a.nf, a.f, a.gy * 8 + (a.gx - 1) AS pos,
        |    CASE WHEN a.gray > p.gray THEN 1 ELSE 0 END AS bit
        |  FROM gr a JOIN gr p ON a.doc_id = p.doc_id AND a.f = p.f
        |    AND a.gy = p.gy AND p.gx = a.gx - 1
        |  WHERE a.gx >= 1),
        |mj AS (SELECT doc_id, nf, pos,
        |    CASE WHEN 2 * SUM(bit) > nf THEN 1 ELSE 0 END AS mbit
        |  FROM b GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(nf AS INT) AS n_frames,
        |  CAST(SUM(CASE WHEN pos >= 32
        |    THEN mbit * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END) AS BIGINT)
        |    AS sig_hi,
        |  CAST(SUM(CASE WHEN pos < 32
        |    THEN mbit * (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS BIGINT)
        |    AS sig_lo
        |FROM mj GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    // q35's exact-Jaccard pair replay (recall-1 contract) + q53's split
    // arithmetic, filtered to boundary-crossing pairs
    "q125_split_leak" ->
      s"""WITH $shingleBase,
         |sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
         |co AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
         |       FROM d a JOIN d b ON a.g=b.g AND a.doc_id<b.doc_id GROUP BY 1,2),
         |j AS (SELECT id1, id2, CAST(c AS DOUBLE)/(s1.n+s2.n-c) AS jaccard
         |      FROM co JOIN sz s1 ON id1=s1.doc_id JOIN sz s2 ON id2=s2.doc_id),
         |sp AS (SELECT doc_id,
         |    CASE WHEN b < 8000 THEN 'train' WHEN b < 9000 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |      CAST(('0x' || substr(md5(doc_id || ':graft:split'), 1, 8))
         |        AS BIGINT) % 10000 AS b
         |    FROM documents))
         |SELECT id1, id2, jaccard, s1.split AS split1, s2.split AS split2
         |FROM j JOIN sp s1 ON id1 = s1.doc_id JOIN sp s2 ON id2 = s2.doc_id
         |WHERE jaccard >= 0.8 AND s1.split <> s2.split
         |ORDER BY id1, id2""".stripMargin,
    // the q52-family shingle CTEs at k=8: gram doc-frequency + per-doc
    // rollup, exact integers, ratio of the same integers
    "q124_novelty_score" ->
      s"""WITH ${shingleCtesOver("documents", 8, "v")},
         |fr AS (SELECT g, count(*) AS df FROM vd GROUP BY 1),
         |j AS (SELECT vd.doc_id, fr.df FROM vd JOIN fr USING (g))
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(count(*) FILTER (WHERE df = 1) AS BIGINT) AS novel_grams,
         |  CAST(count(*) FILTER (WHERE df = 1) AS DOUBLE) / count(*)
         |    AS novelty
         |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // per-(source, token) counts rolled up to source; sums cast off
    // HUGEINT, ratios divide the same exact integers
    "q122_vocab_report" ->
      s"""WITH t AS (SELECT source, unnest($docToksC) AS tok FROM documents),
         |c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2),
         |g AS (SELECT source,
         |    CAST(sum(c) AS BIGINT) AS tokens_sum,
         |    CAST(count(*) AS BIGINT) AS types,
         |    CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax,
         |    CAST(max(c) AS BIGINT) AS top_token_count
         |  FROM c GROUP BY 1)
         |SELECT source, tokens_sum, types, hapax, top_token_count,
         |  CAST(types AS DOUBLE) / CAST(tokens_sum AS DOUBLE) AS ttr,
         |  CAST(hapax AS DOUBLE) / CAST(types AS DOUBLE) AS hapax_frac
         |FROM g ORDER BY source""".stripMargin,
    // full analytic replay of the acoustic fingerprint: the q62 sample
    // formula, assignment framing i*65//n, exact-integer frame energies,
    // adjacent comparisons packed with integer shifts
    "q121_audio_fingerprint" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(1000 + doc_id % 500 AS BIGINT) AS n FROM documents),
        |s AS (SELECT doc_id, n, i.range AS i,
        |    abs(((doc_id*7 + i.range*31) % 65536) - 32768) AS a
        |  FROM d, range(0, 1500) i WHERE i.range < n),
        |e AS (SELECT doc_id, (i * 65) // n AS f, SUM(a) AS en
        |  FROM s GROUP BY 1, 2),
        |b AS (SELECT a.doc_id, a.f - 1 AS pos,
        |    CASE WHEN a.en > p.en THEN 1 ELSE 0 END AS bit
        |  FROM e a JOIN e p ON a.doc_id = p.doc_id AND p.f = a.f - 1
        |  WHERE a.f >= 1)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN pos >= 32
        |    THEN bit * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END) AS BIGINT)
        |    AS sig_hi,
        |  CAST(SUM(CASE WHEN pos < 32
        |    THEN bit * (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS BIGINT)
        |    AS sig_lo
        |FROM b GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // full analytic replay of the dHash: q61's synthetic pixel formulas at
    // the 72 nearest-sampled grid points, row-adjacent gray comparisons,
    // bits packed into unsigned 32-bit halves with integer shifts
    "q120_image_dhash" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(16 + doc_id % 8 AS BIGINT) AS w,
        |    CAST(16 + (doc_id * 3) % 8 AS BIGINT) AS h
        |  FROM documents),
        |g AS (SELECT doc_id, gy.range AS gy, gx.range AS gx,
        |    (gx.range * w) // 9 AS sx, (gy.range * h) // 8 AS sy
        |  FROM dims, range(0, 8) gy, range(0, 9) gx),
        |gr AS (SELECT doc_id, gy, gx,
        |    ((doc_id + 3*sx + 5*sy) % 256)
        |    + ((2*doc_id + 7*sx + sy) % 256)
        |    + ((doc_id + sx*sy) % 256) AS gray
        |  FROM g),
        |b AS (SELECT a.doc_id, a.gy * 8 + (a.gx - 1) AS pos,
        |    CASE WHEN a.gray > p.gray THEN 1 ELSE 0 END AS bit
        |  FROM gr a JOIN gr p
        |    ON a.doc_id = p.doc_id AND a.gy = p.gy AND p.gx = a.gx - 1
        |  WHERE a.gx >= 1)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN pos >= 32
        |    THEN bit * (CAST(1 AS BIGINT) << (pos - 32)) ELSE 0 END) AS BIGINT)
        |    AS sig_hi,
        |  CAST(SUM(CASE WHEN pos < 32
        |    THEN bit * (CAST(1 AS BIGINT) << pos) ELSE 0 END) AS BIGINT)
        |    AS sig_lo
        |FROM b GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // exact Jaccard over every arrival×seen pair at the threshold (the LSH
    // path's recall-1 contract, q35/q41's oracle trick, applied to the
    // incremental shape): arrivals synthesized as in the query, kept =
    // no seen pair at J >= 0.8
    "q119_incremental_minhash" ->
      s"""WITH tk AS (SELECT doc_id, text, $docToks AS t FROM documents),
         |arr AS (
         |  SELECT doc_id + 2000 AS doc_id, text || ' ' || t[1] AS text
         |  FROM tk WHERE doc_id < 100
         |  UNION ALL
         |  SELECT doc_id + 2000 AS doc_id,
         |    array_to_string(list_reverse(t), ' ') AS text
         |  FROM tk WHERE doc_id BETWEEN 100 AND 149),
         |${shingleCtesOver("arr", 4, "a")},
         |${shingleCtesOver("documents", 4, "s")},
         |na AS (SELECT doc_id, count(*) AS n FROM ad GROUP BY 1),
         |ns AS (SELECT doc_id, count(*) AS n FROM sd GROUP BY 1),
         |co AS (SELECT a.doc_id AS aid, b.doc_id AS bid, count(*) AS c
         |       FROM ad a JOIN sd b ON a.g = b.g GROUP BY 1, 2),
         |hit AS (SELECT DISTINCT aid FROM co
         |        JOIN na ON aid = na.doc_id JOIN ns ON bid = ns.doc_id
         |        WHERE CAST(c AS DOUBLE)/(na.n + ns.n - c) >= 0.8)
         |SELECT doc_id FROM arr
         |WHERE doc_id NOT IN (SELECT aid FROM hit)
         |ORDER BY doc_id""".stripMargin,
    // ground-truth all-pairs exact Jaccard between the corpus and the
    // synthesized bench items (recall-1 contract: the engine's banded
    // candidates must find every pair the truth table contains)
    "q145_fuzzy_contamination" ->
      s"""WITH tk AS (SELECT doc_id, text, $docToks AS t FROM documents),
         |bench AS (
         |  SELECT doc_id + 5000 AS doc_id,
         |    CASE WHEN doc_id % 20 = 0 THEN text || ' ' || t[1]
         |         ELSE array_to_string(list_reverse(t), ' ') END AS text
         |  FROM tk WHERE doc_id % 10 = 0),
         |${shingleCtesOver("bench", 4, "b")},
         |${shingleCtesOver("documents", 4, "s")},
         |nb AS (SELECT doc_id, count(*) AS n FROM bd GROUP BY 1),
         |ns AS (SELECT doc_id, count(*) AS n FROM sd GROUP BY 1),
         |co AS (SELECT s.doc_id AS did, b.doc_id AS bid, count(*) AS c
         |       FROM sd s JOIN bd b ON s.g = b.g GROUP BY 1, 2)
         |SELECT co.did AS doc_id, co.bid AS bench_id,
         |  CAST(c AS DOUBLE)/(ns.n + nb.n - c) AS jaccard
         |FROM co JOIN ns ON co.did = ns.doc_id JOIN nb ON co.bid = nb.doc_id
         |WHERE CAST(c AS DOUBLE)/(ns.n + nb.n - c) >= 0.8
         |ORDER BY doc_id, bench_id""".stripMargin,
    // identical md5-bucket arithmetic (q85's replay shape): floor copies
    // per source + one extra below the fractional cut, unnested 0..n-1
    "q118_repeat_mixture" ->
      """WITH c AS (SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(doc_id || ':graft:repeat'), 1, 8))
        |      AS BIGINT) % 10000 AS b
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |    CASE WHEN source = 'src0' THEN 2 + (CASE WHEN b < 5000 THEN 1 ELSE 0 END)
        |         WHEN source = 'src1' THEN 0
        |         WHEN source = 'src2' THEN (CASE WHEN b < 2500 THEN 1 ELSE 0 END)
        |         ELSE 1 END AS copies
        |  FROM c)
        |SELECT doc_id, source, CAST(i AS BIGINT) AS copy_idx
        |FROM (SELECT doc_id, source, unnest(range(0, copies)) AS i FROM n)
        |ORDER BY doc_id, copy_idx""".stripMargin,
    // q86's URL-synthesis + domain CTEs feeding q101's report shape keyed
    // by domain; the flag compares ratios of identical exact integers, so
    // the IEEE comparison cannot diverge between engines
    "q117_domain_report" ->
      """WITH u AS (SELECT doc_id, coalesce(text, '') AS tx,
        |    'http' || (CASE WHEN doc_id%2=0 THEN 's' ELSE '' END) || '://'
        |    || (CASE WHEN doc_id%3=0 THEN 'www.' ELSE '' END)
        |    || source || '.'
        |    || (CASE CAST(doc_id%7 AS INT) WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com'
        |        WHEN 2 THEN 'org' WHEN 3 THEN 'net' WHEN 4 THEN 'io'
        |        WHEN 5 THEN 'com.au' ELSE 'de' END)
        |    || '/d/' || CAST((doc_id*37)%1000 AS VARCHAR) AS url
        |  FROM documents),
        |h AS (SELECT doc_id, tx, url,
        |    regexp_extract(lower(url),
        |      '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1) AS host
        |  FROM u),
        |lx AS (SELECT doc_id, tx, host, string_split(host, '.') AS labs,
        |    len(string_split(host, '.')) AS n FROM h),
        |dm AS (SELECT doc_id, tx,
        |    CASE WHEN regexp_matches(host, '^[0-9.]+$') THEN host
        |         WHEN n <= 2 THEN host
        |         WHEN (labs[n-1] || '.' || labs[n]) IN ('co.uk','org.uk',
        |           'ac.uk','gov.uk','net.uk','com.au','net.au','org.au',
        |           'co.jp','ne.jp','or.jp','com.br','com.cn','com.mx',
        |           'com.ar','com.tr','com.tw','co.in','co.kr','co.za',
        |           'com.sg','com.hk')
        |           THEN labs[n-2] || '.' || labs[n-1] || '.' || labs[n]
        |         ELSE labs[n-1] || '.' || labs[n] END AS domain
        |  FROM lx),
        |p AS (SELECT domain, tx,
        |    string_split_regex(lower(trim(replace(tx, chr(11), ' '))), '\s+') AS toks,
        |    md5(regexp_replace(lower(trim(tx)), '\s+', ' ', 'g')) AS fp
        |  FROM dm),
        |q AS (SELECT domain, tx, toks, fp,
        |    (CASE WHEN len(toks) BETWEEN 30 AND 500 THEN 5 ELSE 0 END)
        |  + (CASE WHEN CAST(len(list_filter(toks, x -> list_contains(
        |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
        |      / len(toks) >= 0.05 THEN 3 ELSE 0 END)
        |  + (CASE WHEN CAST(len(regexp_extract_all(tx, '[.,!?;:]')) AS DOUBLE)
        |      / length(tx) <= 0.1 THEN 2 ELSE 0 END) AS pts
        |  FROM p),
        |g AS (SELECT domain,
        |    CAST(count(*) AS BIGINT) AS docs,
        |    CAST(sum(len(toks)) AS BIGINT) AS tokens_sum,
        |    CAST(sum(length(tx)) AS BIGINT) AS chars_sum,
        |    CAST(count(DISTINCT fp) AS BIGINT) AS distinct_docs,
        |    CAST(count(*) FILTER (WHERE len(toks) < 30) AS BIGINT) AS short_docs,
        |    CAST(sum(pts) AS BIGINT) AS quality_sum
        |  FROM q GROUP BY 1),
        |r AS (SELECT domain, docs, tokens_sum, chars_sum, distinct_docs,
        |    short_docs, quality_sum,
        |    CAST(1 AS DOUBLE)
        |      - CAST(distinct_docs AS DOUBLE) / CAST(docs AS DOUBLE) AS dup_rate,
        |    CAST(quality_sum AS DOUBLE) / CAST(docs AS DOUBLE) AS avg_quality,
        |    CAST(tokens_sum AS DOUBLE) / CAST(docs AS DOUBLE) AS avg_tokens
        |  FROM g)
        |SELECT domain, docs, tokens_sum, chars_sum, distinct_docs, short_docs,
        |  quality_sum, dup_rate, avg_quality, avg_tokens,
        |  CAST(CASE WHEN dup_rate > CAST(0.05 AS DOUBLE)
        |         OR avg_quality < CAST(5.0 AS DOUBLE) THEN 1 ELSE 0 END AS INT)
        |    AS flagged
        |FROM r ORDER BY domain""".stripMargin,
    // union + carry-forward replay of the as-of algebra: right rows sort
    // before left rows at equal ts (inclusive match), right-row ties
    // resolve by (matched ts, value) — the same total order Spark uses.
    "q107_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t
        |           FROM events WHERE event_type='click'),
        |r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value
        |      FROM events WHERE event_type='purchase'),
        |u AS (
        |  SELECT user_id, t, 0 AS side, CAST(NULL AS BIGINT) AS event_id,
        |         t AS mt, value FROM r
        |  UNION ALL
        |  SELECT user_id, t, 1 AS side, event_id,
        |         CAST(NULL AS TIMESTAMP) AS mt, CAST(NULL AS DOUBLE) AS value
        |  FROM l),
        |c AS (SELECT user_id, t, side, event_id,
        |        last_value(mt IGNORE NULLS) OVER w AS m_ts,
        |        last_value(value IGNORE NULLS) OVER w AS m_value
        |      FROM u
        |      WINDOW w AS (PARTITION BY user_id ORDER BY t, side, mt, value
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  strftime(t, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(m_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  m_value AS purchase_value
        |FROM c WHERE side = 1 ORDER BY event_id""".stripMargin,
    // plain inequality join — DuckDB's IEJoin handles what would be a
    // nested loop in Spark; the engine-side bucketing is replayed only by
    // its RESULT equivalence.
    "q108_range_join" ->
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value
        |           FROM events WHERE event_type='click'),
        |i AS (SELECT event_id AS err_id, user_id,
        |        CAST(ts AS TIMESTAMP) AS ws,
        |        CAST(ts AS TIMESTAMP) + INTERVAL 7200 SECOND AS we
        |      FROM events WHERE event_type='error')
        |SELECT i.err_id, CAST(COUNT(*) AS BIGINT) AS n_clicks,
        |  CAST(SUM(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM i JOIN p ON i.user_id = p.user_id AND p.t >= i.ws AND p.t <= i.we
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the whole prune replayed: 16-smallest-id pivots, nearest-pivot cells
    // with the q79 tie-break, per-cell proto-desc rank, drop floor(0.25*cnt)
    "q83_proto_prune" ->
      s"""WITH $cosineCtes,
         |piv AS (SELECT vec_id AS pid, v AS pv, nrm AS pnrm FROM n
         |        ORDER BY vec_id LIMIT 16),
         |asg AS (SELECT c.vec_id AS id, pid,
         |    round(list_sum(list_transform(range(1, 65),
         |      k -> c.v[k]*pv[k])) / (c.nrm*pnrm), 6) AS pcos,
         |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
         |      round(list_sum(list_transform(range(1, 65),
         |        k -> c.v[k]*pv[k])) / (c.nrm*pnrm), 6) DESC, pid) AS rn
         |  FROM n c CROSS JOIN piv),
         |cells AS (SELECT id, pid AS cell, pcos AS proto FROM asg WHERE rn = 1),
         |r AS (SELECT id, cell, proto,
         |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY proto DESC, id) AS rk,
         |    COUNT(*) OVER (PARTITION BY cell) AS cnt FROM cells)
         |SELECT id AS vec_id, cell, proto FROM r
         |WHERE rk > CAST(floor(0.25 * cnt) AS BIGINT)
         |ORDER BY vec_id""".stripMargin,
    // served-from-index results are bit-identical to the in-memory IVF
    // operator (deterministic pivots + bit-stable assignment), so the
    // same SQL is the oracle for both
    "q63_ann_ivf_indexed" -> annIvfSql,
    "q66_ann_serve_only" -> annIvfSql,
    // build-on-prefix + append == build-on-everything (pivot set unchanged,
    // assignment bit-stable), so the full-corpus SQL is the oracle verbatim
    "q71_ann_ivf_append" -> annIvfSql,
    "q67_ann_ivf_kmeans" -> annIvfKmeansSql,
    // both signature pipelines recomputed in SQL (k=1, md5 words): keep the
    // arrivals whose four 16-bit sign blocks match NO seen document's —
    // signature equality is exactly 4-block equality. Both sources coalesce
    // NULL text to '' because Dedup.simhash does (null text = empty doc);
    // without the mirror, a null-text fixture doc would sign differently
    // here (md5(NULL) nulls every balance) than on the Spark side
    "q64_incremental_neardup" ->
      s"""WITH sndoc AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
         |arr AS (
         |  SELECT doc_id + 2000 AS doc_id,
         |    coalesce(text || ' ' || ($docToks)[1], '') AS text
         |  FROM documents WHERE doc_id < 100
         |  UNION ALL
         |  SELECT doc_id + 2000, coalesce(text || ' zqfreshnear', '')
         |  FROM documents WHERE doc_id BETWEEN 100 AND 149),
         |${simhashBlockCtes("sndoc", 1, "sn")},
         |${simhashBlockCtes("arr", 1, "nb")}
         |SELECT n.doc_id FROM nbblk n
         |WHERE NOT EXISTS (SELECT 1 FROM snblk s
         |  WHERE n.b0 = s.b0 AND n.b1 = s.b1 AND n.b2 = s.b2 AND n.b3 = s.b3)
         |ORDER BY doc_id""".stripMargin,
    // q65: same two recomputed pipelines, Hamming ≤ 3 scope — keep arrivals
    // with NO seen signature within distance 3. The 4-block pigeonhole
    // clause mirrors the Spark-side block join (redundant given the
    // popcount bound — distance ≤ 3 implies an equal block — but it keeps
    // the oracle structurally the same candidate join + confirm). Both
    // sides coalesce NULL text to '' as in q64; the fresh-arrival tokens
    // interpolate (doc_id + 3000) EXPLICITLY so the expression cannot bind
    // to the select alias of the same name.
    "q65_incremental_neardup_h3" ->
      s"""WITH sndoc AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
         |arr AS (
         |  SELECT doc_id + 3000 AS doc_id,
         |    coalesce(text || ' zqeditnear', '') AS text
         |  FROM documents WHERE doc_id < 100
         |  UNION ALL
         |  SELECT doc_id + 3000,
         |    'zqa' || (doc_id + 3000) || ' zqb' || (doc_id + 3000)
         |      || ' zqc' || (doc_id + 3000) || ' zqd' || (doc_id + 3000)
         |      || ' zqe' || (doc_id + 3000)
         |  FROM documents WHERE doc_id BETWEEN 100 AND 149),
         |${simhashBlockCtes("sndoc", 1, "sn")},
         |${simhashBlockCtes("arr", 1, "nb")}
         |SELECT n.doc_id FROM nbblk n
         |WHERE NOT EXISTS (SELECT 1 FROM snblk s
         |  WHERE (n.b0 = s.b0 OR n.b1 = s.b1 OR n.b2 = s.b2 OR n.b3 = s.b3)
         |    AND bit_count(xor(n.b0, s.b0)) + bit_count(xor(n.b1, s.b1))
         |      + bit_count(xor(n.b2, s.b2)) + bit_count(xor(n.b3, s.b3)) <= 3)
         |ORDER BY doc_id""".stripMargin,
    "q44_dedup_clusters" -> dedupClustersSql,
    "q50_dedup_corpus" ->
      s"""WITH RECURSIVE $jaccardClosureCtes,
         |clusters AS (SELECT id, min(x) AS cluster FROM reach GROUP BY id)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster)
         |ORDER BY doc_id""".stripMargin,
    // exact-representative collapse feeding the SAME closure chain q50 uses,
    // over the rdocs sub-corpus — the structural mirror of dedupCorpus
    "q51_dedup_corpus_terminal" ->
      s"""WITH RECURSIVE
         |f AS (SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |reps AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY fp),
         |rdocs AS (SELECT d.doc_id, d.text FROM documents d JOIN reps USING (doc_id)),
         |${jaccardClosureCtesOver("rdocs")},
         |clusters AS (SELECT id, min(x) AS cluster FROM reach GROUP BY id)
         |SELECT doc_id FROM rdocs
         |WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster)
         |ORDER BY doc_id""".stripMargin,
    // q51's closure replay with keep-best winners: exact reps ranked by
    // (n_chars DESC, id), cluster winners likewise — the engine's
    // min(struct(-score, id)) argmax as two rank windows
    "q113_dedup_keep_best_corpus" ->
      s"""WITH RECURSIVE
         |f AS (SELECT doc_id, n_chars,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |reps AS (SELECT doc_id FROM f
         |  QUALIFY row_number() OVER (PARTITION BY fp
         |    ORDER BY n_chars DESC, doc_id) = 1),
         |rdocs AS (SELECT d.doc_id, d.text FROM documents d JOIN reps USING (doc_id)),
         |${jaccardClosureCtesOver("rdocs")},
         |clusters AS (SELECT id, min(x) AS cluster FROM reach GROUP BY id),
         |cs AS (SELECT c.id, c.cluster, f2.n_chars
         |  FROM clusters c JOIN f f2 ON c.id = f2.doc_id),
         |win AS (SELECT id AS wid FROM cs
         |  QUALIFY row_number() OVER (PARTITION BY cluster
         |    ORDER BY n_chars DESC, id) = 1)
         |SELECT doc_id FROM rdocs
         |WHERE doc_id NOT IN (SELECT id FROM cs WHERE id NOT IN (SELECT wid FROM win))
         |ORDER BY doc_id""".stripMargin,
    "q45_collection_funcs" ->
      s"""SELECT doc_id,
         |  list_sort(list_distinct($docToks))[1] AS first_tok,
         |  CAST(list_contains($docToks, 'the') AS INT) AS has_the,
         |  CAST(length(text) AS INT) AS len_via_map,
         |  CAST(json_extract_string('{"n":' || length(text) || '}', '$$.n') AS INT)
         |    AS n_from_json
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q43_bpe_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(list_filter(regexp_extract_all(text, '$bpeSqlPattern'),
         |    t -> NOT regexp_matches(t, '^\\s+$$'))) AS INT) AS bpe_tokens,
         |  CAST(len($docToks) AS INT) AS ws_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    // rolling_hash mirrors graft.funcs.RollingHash exactly: left fold of
    // (h*131 + codepoint) mod 2^31-1 over the normalized characters
    "q30_fingerprint" ->
      """WITH n AS (SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
        |  FROM documents)
        |SELECT doc_id, md5(s) AS fp,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, len(s)+1),
        |        i -> CAST(ascii(substr(s, CAST(i AS INT), 1)) AS BIGINT))),
        |    (h, c) -> (h * 131 + c) % 2147483647) AS rolling_hash
        |FROM n ORDER BY doc_id""".stripMargin,
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
    "q36_simhash" -> simhashSql,
    "q37_embed_cosine" -> bruteCosineSql,
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
    "q39_ann_lsh" -> annLshSql,
    "q40_multimodal_decode" ->
      """SELECT doc_id AS id,
        |  CAST(strlen(text) % 640 + 16 AS INT) AS width,
        |  CAST((strlen(text) * 7) % 480 + 16 AS INT) AS height,
        |  CAST(strlen(text) % 30 + 1 AS INT) AS n_frames,
        |  CAST(strlen(text) AS INT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // brute force over the same planted-near-dup corpus is the oracle for
    // the LSH pairs path: recall 1.0 at the declared threshold/parameters.
    "q41_cosine_lsh" -> lshPairsOracleSql,
    // media → embedStub → cosineLshPairs, with the byte-bigram feature hash
    // recomputed in SQL: h = ascii(c_i)*31 + ascii(c_{i+1}) (documents are
    // pure ASCII, so code points equal Java's signed UTF-8 bytes), bucket
    // h % 64, sign (h >> 7) & 1 = (h // 128) % 2, unit-normalized with one
    // FLOAT round-trip to match Array[Float], then brute-force cosine at
    // the threshold where LSH recall is exactly 1.
    "q46_media_embed_dedup" ->
      """WITH h AS (
        |  SELECT doc_id, (ascii(substr(text, CAST(i AS INT), 1))*31
        |                  + ascii(substr(text, CAST(i+1 AS INT), 1))) AS hv
        |  FROM (SELECT doc_id, text, unnest(range(1, len(text))) AS i FROM documents)),
        |acc AS (
        |  SELECT doc_id, hv % 64 AS bucket,
        |    CAST(SUM(CASE WHEN (hv // 128) % 2 = 1 THEN 1 ELSE -1 END) AS DOUBLE) AS val
        |  FROM h GROUP BY 1, 2),
        |n0 AS (SELECT doc_id, sqrt(SUM(val*val)) AS nn FROM acc GROUP BY 1),
        |fc AS (SELECT a.doc_id, a.bucket,
        |         CAST(CAST(a.val / n.nn AS FLOAT) AS DOUBLE) AS f
        |       FROM acc a JOIN n0 n USING (doc_id)),
        |nrm AS (SELECT doc_id, sqrt(SUM(f*f)) AS n FROM fc GROUP BY 1),
        |dots AS (
        |  SELECT x.doc_id AS id1, y.doc_id AS id2, SUM(x.f*y.f) AS d
        |  FROM fc x JOIN fc y ON x.bucket = y.bucket AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, ROUND(d / (n1.n * n2.n), 6) AS cos_sim
        |FROM dots
        |JOIN nrm n1 ON id1 = n1.doc_id
        |JOIN nrm n2 ON id2 = n2.doc_id
        |WHERE ROUND(d / (n1.n * n2.n), 6) >= 0.99
        |ORDER BY id1, id2""".stripMargin,
    // distinct-8-gram overlap vs the every-20th-doc benchmark set (8 = the
    // operator's default window); counts are integers, overlap divides them
    "q52_contamination" ->
      s"""WITH ${shingleBaseOver("documents", 8)},
         |bench AS (SELECT DISTINCT g FROM d WHERE doc_id % 20 = 0),
         |corpus AS (SELECT * FROM d WHERE doc_id % 20 <> 0),
         |sizes AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1),
         |hits AS (SELECT doc_id, count(*) AS n_hit
         |         FROM corpus JOIN bench USING (g) GROUP BY 1)
         |SELECT s.doc_id, s.n_grams,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(coalesce(h.n_hit, 0) AS DOUBLE)/s.n_grams AS overlap
         |FROM sizes s LEFT JOIN hits h USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // identical md5-bucket arithmetic: first 8 md5 hex chars of
    // "<id>:graft:split" (the split op's own default salt) as a 32-bit int,
    // mod 10000; split thresholds 8000/9000
    "q53_hash_split" ->
      """SELECT doc_id, bucket,
        |  CASE WHEN bucket < 8000 THEN 'train'
        |       WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |    CAST(CAST(('0x' || substr(md5(doc_id || ':graft:split'), 1, 8)) AS BIGINT)
        |      % 10000 AS INT) AS bucket
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q54_repetition" ->
      s"""WITH t AS (SELECT doc_id, $docToks AS toks FROM documents),
         |g AS (SELECT doc_id, toks,
         |    list_transform(range(1, len(toks)),
         |      i -> concat_ws(' ', toks[i], toks[i+1])) AS bg,
         |    list_transform(range(1, len(toks)-1),
         |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS tg
         |  FROM t)
         |SELECT doc_id,
         |  CASE WHEN len(toks) > 0 THEN
         |    CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)/len(toks)
         |    END AS dup_word_frac,
         |  CASE WHEN len(bg) > 0 THEN
         |    CAST(list_max(list_transform(list_distinct(bg),
         |      x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)/len(bg)
         |    END AS top_bigram_frac,
         |  CASE WHEN len(tg) > 0 THEN
         |    CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)/len(tg)
         |    END AS dup_trigram_frac
         |FROM g ORDER BY doc_id""".stripMargin,
    // q54's fraction CTE + threshold gates; NULL metric passes its rule
    // (coalesce true), mirroring repetitionFilter's short-doc contract
    "q89_repetition_filter" ->
      s"""WITH t AS (SELECT doc_id, $docToks AS toks FROM documents),
         |g AS (SELECT doc_id, toks,
         |    list_transform(range(1, len(toks)),
         |      i -> concat_ws(' ', toks[i], toks[i+1])) AS bg,
         |    list_transform(range(1, len(toks)-1),
         |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS tg
         |  FROM t),
         |m AS (SELECT doc_id,
         |    CASE WHEN len(toks) > 0 THEN
         |      CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)/len(toks)
         |      END AS dw,
         |    CASE WHEN len(bg) > 0 THEN
         |      CAST(list_max(list_transform(list_distinct(bg),
         |        x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)/len(bg)
         |      END AS tb,
         |    CASE WHEN len(tg) > 0 THEN
         |      CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)/len(tg)
         |      END AS dt
         |  FROM g)
         |SELECT d.doc_id, d.source FROM documents d JOIN m USING (doc_id)
         |WHERE coalesce(dw <= 0.55, true) AND coalesce(tb <= 0.05, true)
         |  AND coalesce(dt <= 0.03, true)
         |ORDER BY doc_id""".stripMargin,
    // q70's synthesis CTEs + the CCNet paragraph-dedup replay: same
    // normalization chain (lower/trim → strip non-letter/non-ws → collapse
    // ws → md5), first (doc_id, idx) wins via row_number, reassembly in
    // original order. LEFT join keeps all-dup docs with empty text.
    "q92_dedup_paragraphs" ->
      """WITH fix AS (SELECT doc_id, 'begin header ' || source AS hdr,
        |    string_split_regex(lower(trim(replace(text, chr(11), ' '))), '\s+') AS t FROM documents),
        |nl AS (SELECT doc_id, hdr, t,
        |    greatest(CAST(ceil(len(t)/10.0) AS INT), 1) AS n FROM fix),
        |li AS (SELECT doc_id, hdr, t, unnest(range(0, n)) AS i FROM nl),
        |bl AS (SELECT doc_id, hdr, i,
        |    array_to_string(t[i*10+1 : i*10+10], ' ') AS line FROM li),
        |body AS (SELECT doc_id, hdr,
        |    string_agg(line, chr(10) ORDER BY i) AS b FROM bl GROUP BY 1, 2),
        |doc AS (SELECT doc_id, hdr || chr(10) || b || chr(10) ||
        |    'copyright footer all rights reserved' AS text FROM body),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM doc),
        |ln AS (SELECT doc_id, l, unnest(range(1, len(l)+1)) AS i FROM ls),
        |p AS (SELECT doc_id, i, l[i] AS para FROM ln
        |  WHERE length(trim(l[i])) > 0),
        |k AS (SELECT doc_id, i, para,
        |    md5(regexp_replace(regexp_replace(lower(trim(para)),
        |      '[^\p{L}\s]+', '', 'g'), '\s+', ' ', 'g')) AS key FROM p),
        |r AS (SELECT doc_id, i, para,
        |    row_number() OVER (PARTITION BY key ORDER BY doc_id, i) AS rn
        |  FROM k),
        |f AS (SELECT doc_id,
        |    string_agg(para, chr(10) ORDER BY i) AS text_dedup,
        |    count(*) AS para_kept
        |  FROM r WHERE rn = 1 GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS para_total FROM p GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(f.text_dedup, '') AS text_dedup,
        |  coalesce(tot.para_total, 0) AS para_total,
        |  coalesce(f.para_kept, 0) AS para_kept
        |FROM documents d
        |  LEFT JOIN tot USING (doc_id) LEFT JOIN f USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // the FULL BPE merge loop replayed in SQL (see q91MergedExpr): GPT-2
    // pre-tokenization with the same RE2-safe pattern, whitespace runs
    // dropped, chars wrapped in chr(31), one replace pass per merge in rank
    // order, tokens re-split on the double separator and flattened in
    // pre-token order. ids = 0-based position in the vocab list, -1 unknown.
    "q91_bpe_apply" -> {
      val pat = graft.ext.TextStats.BpePattern.replace("'", "''")
      val vocabSql = q91Vocab.map(v => s"'$v'").mkString("[", ", ", "]")
      s"""WITH base AS (SELECT doc_id,
         |    regexp_extract_all(coalesce(text, ''), '$pat') AS pts
         |  FROM documents),
         |e AS (SELECT doc_id, pts, unnest(range(1, len(pts)+1)) AS i FROM base),
         |w AS (SELECT doc_id, i, pts[i] AS pt FROM e
         |  WHERE NOT regexp_matches(pts[i], '^\\s+$$')),
         |wr AS (SELECT doc_id, i,
         |    regexp_replace(pt, '(?s)(.)', chr(31)||'\\1'||chr(31), 'g') AS s0
         |  FROM w),
         |mg AS (SELECT doc_id, i,
         |    string_split(trim(${q91MergedExpr("s0")}, chr(31)),
         |      chr(31)||chr(31)) AS tl
         |  FROM wr),
         |f AS (SELECT doc_id, flatten(list(tl ORDER BY i)) AS toks
         |  FROM mg GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(len(f.toks), 0) AS INT) AS bpe_count,
         |  coalesce(array_to_string(f.toks, chr(31)), '') AS bpe_str,
         |  coalesce(array_to_string(list_transform(f.toks,
         |    t -> CAST(coalesce(list_position($vocabSql, t) - 1, -1)
         |           AS VARCHAR)), ' '), '') AS bpe_ids_str
         |FROM documents d LEFT JOIN f USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    // the FULL CCNet-style pipeline replayed: train bigram+unigram counts
    // on the English slice (exact integers, capped by the same
    // deterministic top-K), V = capped unigram vocab + 1, per-gram
    // P = (c+1)/(c_ctx+V), and the per-document mean NLL summed in
    // DOCUMENT ORDER (list(nll ORDER BY pos) -> list_sum, matching the
    // Spark side's pos-sorted sequential fold) then rounded to 6 dp —
    // the cosine-oracle float discipline applied to ln
    "q90_perplexity" ->
      s"""$pplCtes
         |SELECT d.doc_id, d.lang,
         |  coalesce(f.lm_grams, 0) AS lm_grams,
         |  coalesce(f.lm_oov, 0) AS lm_oov,
         |  round(f.s / f.lm_grams, 6) AS nll_mean
         |FROM documents d LEFT JOIN f USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // the FULL DSIR recipe replayed: same md5 bucket arithmetic as q53,
    // integer bucket counts for both models, per-bucket log-ratios over
    // exact integer ratios, and the per-document sum folded in DOCUMENT
    // ORDER (list(lr ORDER BY pos) -> list_sum) then rounded to 6 dp
    "q93_dsir_weights" ->
      s"""$dsirCtes
         |SELECT d.doc_id, d.lang, f.ds_grams, f.ds_logw
         |FROM documents d LEFT JOIN f USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // the Spark side's histogram-cutoff + boundary tie-fill IS rank by
    // (ds_logw DESC, doc_id) <= ceil(keepFrac*n) — replayed as one window
    "q94_dsir_select" ->
      s"""$dsirCtes
         |SELECT doc_id, ds_logw FROM f
         |QUALIFY row_number() OVER (ORDER BY ds_logw DESC, doc_id)
         |  <= ceil(0.25 * (SELECT count(*) FROM documents))
         |ORDER BY doc_id""".stripMargin,
    // q90's scores -> histogram of rounded NLLs -> cumulative counts ->
    // tercile labels per VALUE (head: cum <= floor(n/3); tail: block start
    // >= n - floor(n/3); straddlers middle) -> join back. The 1/3 literals
    // are CAST to DOUBLE (DuckDB parses bare 1.0/3.0 as exact DECIMAL,
    // which would not match the Spark driver's IEEE math.floor(n/3.0)).
    "q95_perplexity_buckets" ->
      s"""$pplCtes,
         |d2 AS (SELECT d.doc_id, round(f.s / f.lm_grams, 6) AS nll_mean
         |  FROM documents d LEFT JOIN f USING (doc_id)),
         |h AS (SELECT nll_mean, count(*) AS c FROM d2
         |  WHERE nll_mean IS NOT NULL GROUP BY 1),
         |cw AS (SELECT nll_mean, c, sum(c) OVER (ORDER BY nll_mean) AS cume
         |  FROM h),
         |nn AS (SELECT sum(c) AS n FROM h),
         |lab AS (SELECT nll_mean,
         |    CASE WHEN cume <= floor(n * (CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE)))
         |           THEN 'head'
         |         WHEN cume - c >= n - floor(n * (CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE)))
         |           THEN 'tail'
         |         ELSE 'middle' END AS ppl_bucket
         |  FROM cw, nn)
         |SELECT d2.doc_id, d2.nll_mean, lab.ppl_bucket
         |FROM d2 LEFT JOIN lab USING (nll_mean)
         |ORDER BY doc_id""".stripMargin,
    // the FULL Stupid Backoff replay: capped bigram/unigram models off the
    // English slice, hit branch c(bg)/c(ctx), backoff branch with the
    // +1/(N+V) floor, per-doc DOCUMENT-ORDER fold, 6 dp
    "q109_stupid_backoff" ->
      s"""WITH t AS (SELECT doc_id, lang, $docToks AS toks FROM documents),
         |r AS (SELECT toks FROM t WHERE lang = 'en'),
         |rg AS (SELECT unnest(CASE WHEN len(toks) >= 2
         |    THEN list_transform(range(1, len(toks)),
         |      i -> concat_ws(' ', toks[i], toks[i+1]))
         |    ELSE [] END) AS gram FROM r),
         |gc AS (SELECT gram, count(*) AS c FROM rg GROUP BY 1
         |  QUALIFY row_number() OVER (ORDER BY c DESC, gram) <= 1048576),
         |ru AS (SELECT unnest(toks) AS u FROM r),
         |uc AS (SELECT u, count(*) AS c FROM ru GROUP BY 1
         |  QUALIFY row_number() OVER (ORDER BY c DESC, u) <= 1048576),
         |vv AS (SELECT count(*) + 1 AS v FROM uc),
         |nn AS (SELECT sum(c) AS ntot FROM uc),
         |dg AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
         |  FROM t WHERE len(toks) >= 2),
         |sc AS (SELECT doc_id, i AS pos,
         |    concat_ws(' ', toks[i], toks[i+1]) AS gram,
         |    toks[i] AS ctx, toks[i+1] AS w
         |  FROM dg),
         |j AS (SELECT sc.doc_id, sc.pos, gc.c AS cbg, u1.c AS ccx, u2.c AS cw
         |  FROM sc LEFT JOIN gc ON sc.gram = gc.gram
         |    LEFT JOIN uc u1 ON sc.ctx = u1.u
         |    LEFT JOIN uc u2 ON sc.w = u2.u),
         |nl AS (SELECT doc_id, pos,
         |    (cbg IS NOT NULL AND ccx IS NOT NULL) AS hit,
         |    CASE WHEN cbg IS NOT NULL AND ccx IS NOT NULL
         |      THEN ln(CAST(cbg AS DOUBLE) / CAST(ccx AS DOUBLE))
         |      ELSE ln(CAST(0.4 AS DOUBLE) *
         |        (CAST(coalesce(cw, 0) + 1 AS DOUBLE) /
         |         CAST((SELECT ntot FROM nn) + (SELECT v FROM vv) AS DOUBLE)))
         |    END AS ls
         |  FROM j),
         |f AS (SELECT doc_id, count(*) AS sb_grams,
         |    count(*) FILTER (WHERE hit) AS sb_hits,
         |    list_sum(list(ls ORDER BY pos)) AS s
         |  FROM nl GROUP BY 1)
         |SELECT d.doc_id, d.lang,
         |  coalesce(f.sb_grams, 0) AS sb_grams,
         |  coalesce(f.sb_hits, 0) AS sb_hits,
         |  round(f.s / f.sb_grams, 6) AS sb_logscore
         |FROM documents d LEFT JOIN f USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // sentence split, per-segment q33 stopword argmax, per-doc modal
    // aggregation — all replayed; the modal share divides the same exact
    // integers on both engines
    "q110_segment_langid" ->
      """WITH s AS (SELECT doc_id,
        |    list_filter(list_transform(
        |      string_split_regex(replace(coalesce(text, ''), chr(11), ' '), '[.!?]+\s*'), x -> trim(x)),
        |      x -> len(x) > 0) AS segs
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(segs) AS seg FROM s),
        |h AS (SELECT doc_id, string_split_regex(lower(trim(seg)), '\s+') AS toks
        |  FROM e),
        |c AS (SELECT doc_id,
        |    len(list_filter(toks, x -> list_contains(
        |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS en,
        |    len(list_filter(toks, x -> list_contains(
        |      ['der','die','das','und','ist','ein','nicht','mit'], x))) AS de,
        |    len(list_filter(toks, x -> list_contains(
        |      ['le','la','les','et','est','un','une','pour'], x))) AS fr,
        |    len(list_filter(toks, x -> list_contains(
        |      ['el','los','las','y','es','un','una','por'], x))) AS es
        |  FROM h),
        |l AS (SELECT doc_id,
        |    CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |         WHEN de >= fr AND de >= es THEN 'de'
        |         WHEN fr >= es THEN 'fr' ELSE 'es' END AS lang
        |  FROM c),
        |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
        |    CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS seg_en,
        |    CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS seg_de,
        |    CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS seg_fr,
        |    CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS seg_es
        |  FROM l GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(g.n_segments, 0) AS n_segments,
        |  coalesce(g.seg_en, 0) AS seg_en,
        |  coalesce(g.seg_de, 0) AS seg_de,
        |  coalesce(g.seg_fr, 0) AS seg_fr,
        |  coalesce(g.seg_es, 0) AS seg_es,
        |  CASE WHEN g.n_segments IS NULL THEN NULL
        |       WHEN g.seg_en >= g.seg_de AND g.seg_en >= g.seg_fr
        |            AND g.seg_en >= g.seg_es THEN 'en'
        |       WHEN g.seg_de >= g.seg_fr AND g.seg_de >= g.seg_es THEN 'de'
        |       WHEN g.seg_fr >= g.seg_es THEN 'fr' ELSE 'es' END AS lang_major,
        |  CASE WHEN g.n_segments > 0 THEN
        |    CAST(greatest(g.seg_en, g.seg_de, g.seg_fr, g.seg_es) AS DOUBLE)
        |      / CAST(g.n_segments AS DOUBLE) END AS lang_major_frac
        |FROM documents d LEFT JOIN g USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // the normalization chain replayed operator-for-operator (translate is
    // 1:1 codepoint in both engines; DuckDB regexp_replace needs the 'g'
    // flag to match Spark's replace-all default)
    "q96_ccnet_normalize" ->
      """SELECT doc_id, text_norm, md5(text_norm) AS norm_fp FROM (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(regexp_replace(
        |      translate(lower(trim(text)),
        |        'àáâãäåèéêëìíîïòóôõöøùúûüçñýÿ', 'aaaaaaeeeeiiiioooooouuuucnyy'),
        |      '[0-9]', '0', 'g'),
        |      '[^\p{L}\p{N}\s]', '', 'g'),
        |      '\s+', ' ', 'g')) AS text_norm
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // the same fingerprint + full-outer-join status algebra in SQL
    "q105_corpus_diff" ->
      """WITH o AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_old
        |  FROM documents WHERE doc_id % 10 <> 0),
        |n AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(
        |      CASE WHEN doc_id % 7 = 0 THEN text || ' edited v2' ELSE text END
        |    )), '\s+', ' ', 'g')) AS fp_new
        |  FROM documents WHERE doc_id % 9 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.fp_old IS NULL THEN 'added'
        |       WHEN n.fp_new IS NULL THEN 'removed'
        |       WHEN o.fp_old <> n.fp_new THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  o.fp_old, n.fp_new
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    // q52's shingle replay split per benchmark name: distinct doc shingles
    // (short-doc fallback included), distinct (bench, gram) set, inner
    // join for hits, exact integer ratio
    "q106_contamination_by_bench" ->
      s"""WITH ${shingleCtesOver("(SELECT * FROM documents WHERE doc_id % 20 <> 0)", 4, "c")},
         |btoks AS (SELECT 'b' || CAST(doc_id % 3 AS VARCHAR) AS bench,
         |    $docToks AS t FROM documents WHERE doc_id % 20 = 0),
         |bsh AS (SELECT bench, unnest(CASE WHEN len(t) >= 4
         |    THEN list_transform(range(1, len(t)-2),
         |      i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3]))
         |    ELSE [array_to_string(t, ' ')] END) AS g FROM btoks),
         |bd AS (SELECT DISTINCT bench, g FROM bsh),
         |sz AS (SELECT doc_id, count(*) AS n_grams FROM cd GROUP BY 1),
         |h AS (SELECT cd.doc_id, bd.bench, count(*) AS n_hit
         |  FROM cd JOIN bd USING (g) GROUP BY 1, 2)
         |SELECT h.doc_id, h.bench,
         |  CAST(sz.n_grams AS BIGINT) AS n_grams,
         |  CAST(h.n_hit AS BIGINT) AS n_hit,
         |  CAST(h.n_hit AS DOUBLE) / sz.n_grams AS overlap
         |FROM h JOIN sz USING (doc_id)
         |ORDER BY doc_id, bench""".stripMargin,
    // q103's replay plus the coarse layer: smallest-id pivots, min-L2 cell
    // per vector (pid tiebreak), 4 nearest cells per query, candidates by
    // the cell equi-join, then the same ordered ADC sum and rank window
    // q90's model CTEs reused down to the per-gram `nl` level, then the
    // per-doc DESC nll sort + prefix fold; the 0.2 literal CAST to DOUBLE
    // (the q95 lesson — DuckDB parses bare decimals as exact DECIMAL,
    // which would not match Spark's IEEE ceil(0.2*n))
    "q135_mink_prob" ->
      s"""$pplCtes,
         |mk AS (SELECT doc_id, count(*) AS lm_grams,
         |    list_sort(list(nll), 'DESC') AS l
         |  FROM nl GROUP BY 1),
         |m2 AS (SELECT doc_id, lm_grams,
         |    greatest(1, CAST(ceil(CAST(0.2 AS DOUBLE) * lm_grams) AS BIGINT))
         |      AS mk_k, l
         |  FROM mk)
         |SELECT d.doc_id, d.lang,
         |  coalesce(m2.lm_grams, 0) AS lm_grams,
         |  coalesce(m2.mk_k, 0) AS mk_k,
         |  round(list_sum(m2.l[1:CAST(m2.mk_k AS INT)]) / m2.mk_k, 6)
         |    AS mink_nll
         |FROM documents d LEFT JOIN m2 USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // URL build + the identical canonical regexp chain + count/argmax per
    // canonical key (keep-best = n_chars DESC, id — the engine's
    // min(struct(-score, id)))
    "q138_crawl_pipeline" -> crawlPipelineSql,
    "q134_url_dedup" ->
      """WITH u AS (SELECT doc_id, n_chars,
        |    'http' || CASE WHEN doc_id % 2 = 0 THEN 's' ELSE '' END || '://' ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
        |    'example' || CAST((doc_id % 200) % 4 AS VARCHAR) || '.com/page/' ||
        |    CAST(doc_id % 200 AS VARCHAR) ||
        |    CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN '?utm_source=feed&utm_campaign=x'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 1 THEN '?id=9&gclid=abc' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |c AS (SELECT doc_id, n_chars,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(
        |    lower(coalesce(url, '')),
        |    '#.*$', ''),
        |    '&(?:utm_[a-z0-9]+|gclid|fbclid|ref)=[^&#]*', '', 'g'),
        |    '\?(?:utm_[a-z0-9]+|gclid|fbclid|ref)=[^&#]*&', '?'),
        |    '\?(?:utm_[a-z0-9]+|gclid|fbclid|ref)=[^&#]*$', ''),
        |    '^https://', 'http://'),
        |    '^http://www\.', 'http://'),
        |    '/$', '') AS url_canon
        |  FROM u),
        |g AS (SELECT url_canon, count(*) AS n FROM c GROUP BY 1),
        |k AS (SELECT doc_id, url_canon FROM c
        |  QUALIFY row_number() OVER (PARTITION BY url_canon
        |    ORDER BY n_chars DESC, doc_id) = 1)
        |SELECT k.doc_id, k.url_canon, CAST(g.n AS BIGINT) AS n_url_copies
        |FROM k JOIN g USING (url_canon)
        |ORDER BY doc_id""".stripMargin,
    // q34's exact-Jaccard pair CTEs + two source joins + the unordered
    // source-pair rollup
    "q133_dup_source_matrix" ->
      s"""WITH ${shingleBaseOver("documents", 4)},
         |sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY 1),
         |co AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS c
         |       FROM d a JOIN d b ON a.g=b.g AND a.doc_id<b.doc_id GROUP BY 1,2),
         |j AS (SELECT id1, id2 FROM (SELECT id1, id2,
         |        CAST(c AS DOUBLE)/(s1.n+s2.n-c) AS jaccard
         |      FROM co JOIN sz s1 ON id1=s1.doc_id JOIN sz s2 ON id2=s2.doc_id)
         |      WHERE jaccard >= 0.8),
         |p2 AS (SELECT least(d1.source, d2.source) AS source1,
         |         greatest(d1.source, d2.source) AS source2
         |       FROM j JOIN documents d1 ON j.id1 = d1.doc_id
         |         JOIN documents d2 ON j.id2 = d2.doc_id)
         |SELECT source1, source2, CAST(count(*) AS BIGINT) AS dup_pairs
         |FROM p2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // fingerprint groups -> representatives -> q44's recursive exact-
    // Jaccard closure -> cluster sizes weighted by exact-group size ->
    // histogram; the synthesized corpus CTE mirrors the query verbatim
    "q132_dup_histogram" ->
      s"""WITH RECURSIVE
         |corp AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 10000, text FROM documents
         |    WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id + 20000, text || ' near dup tail'
         |    FROM documents WHERE doc_id % 7 = 0),
         |fh AS (SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM corp),
         |g AS (SELECT fp, min(doc_id) AS rep, count(*) AS gsize
         |  FROM fh GROUP BY 1),
         |rdocs AS (SELECT c.doc_id, c.text FROM corp c JOIN g ON c.doc_id = g.rep),
         |${jaccardClosureCtesOver("rdocs")},
         |clusters AS (SELECT id, min(x) AS cluster FROM reach GROUP BY id),
         |rc AS (SELECT g.rep, g.gsize, coalesce(c.cluster, g.rep) AS cluster
         |  FROM g LEFT JOIN clusters c ON g.rep = c.id),
         |cs AS (SELECT cluster, sum(gsize) AS csize FROM rc GROUP BY 1),
         |h AS (SELECT csize AS cluster_size, count(*) AS n_clusters
         |  FROM cs GROUP BY 1)
         |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
         |  CAST(n_clusters AS BIGINT) AS n_clusters,
         |  CAST(cluster_size * n_clusters AS BIGINT) AS docs_total
         |FROM h ORDER BY cluster_size""".stripMargin,
    // the full atlas replay: pivot cosine assignment (q79's float-dot
    // double-replay convention), q101's integer quality points, per-doc
    // distinct terms for both df tables, q98's ln((N+1)/(df+1)) idf with
    // the 6-dp-before-rank discipline
    "q131_semantic_atlas" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n0 AS (SELECT vec_id, v,
         |    sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
         |piv AS (SELECT vec_id AS pid, v AS pv, nrm AS pnrm FROM n0
         |  ORDER BY vec_id LIMIT 16),
         |asg AS (SELECT c.vec_id AS id, piv.pid AS cell,
         |    round(list_sum(list_transform(range(1, 65),
         |      k -> c.v[k]*piv.pv[k])) / (c.nrm*piv.pnrm), 6) AS pcos
         |  FROM n0 c, piv
         |  QUALIFY row_number() OVER (PARTITION BY c.vec_id
         |    ORDER BY pcos DESC, pid) = 1),
         |d AS (SELECT a.cell, doc.doc_id, coalesce(doc.text, '') AS tx
         |  FROM documents doc JOIN asg a ON doc.doc_id = a.id),
         |t AS (SELECT cell, doc_id, tx,
         |    string_split_regex(lower(trim(replace(tx, chr(11), ' '))), '\\s+') AS toks FROM d),
         |pts AS (SELECT cell, doc_id, toks, tx,
         |    (CASE WHEN len(toks) BETWEEN 30 AND 500 THEN 5 ELSE 0 END)
         |  + (CASE WHEN CAST(len(list_filter(toks, x -> list_contains(
         |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
         |      / len(toks) >= 0.05 THEN 3 ELSE 0 END)
         |  + (CASE WHEN CAST(len(regexp_extract_all(tx, '[.,!?;:]')) AS DOUBLE)
         |      / length(tx) <= 0.1 THEN 2 ELSE 0 END) AS p
         |  FROM t),
         |st AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(toks)) AS BIGINT) AS tokens_sum,
         |    CAST(sum(p) AS BIGINT) AS quality_sum FROM pts GROUP BY 1),
         |dt AS (SELECT cell, doc_id, unnest(list_distinct(toks)) AS term
         |  FROM t),
         |cdf AS (SELECT cell, term, count(*) AS cdf FROM dt GROUP BY 1, 2),
         |gdf AS (SELECT term, count(*) AS df FROM dt GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM d),
         |sc AS (SELECT cell, term,
         |    round(CAST(cdf AS DOUBLE) *
         |      ln(CAST((SELECT n FROM nn) + 1 AS DOUBLE)
         |        / CAST(df + 1 AS DOUBLE)), 6) AS term_score
         |  FROM cdf JOIN gdf USING (term)),
         |r AS (SELECT cell, term, term_score,
         |    CAST(row_number() OVER (PARTITION BY cell
         |      ORDER BY term_score DESC, term) AS INT) AS "rank"
         |  FROM sc)
         |SELECT st.cell, st.n_docs, st.tokens_sum, st.quality_sum,
         |  CAST(st.quality_sum AS DOUBLE) / CAST(st.n_docs AS DOUBLE)
         |    AS mean_quality,
         |  r.term, r.term_score, r."rank"
         |FROM r JOIN st USING (cell) WHERE r."rank" <= 5
         |ORDER BY cell, "rank"""".stripMargin,
    // q104's replay in RESIDUAL space: cells/probes first (they gate the
    // residual construction), train/corpus/query vectors re-expressed as
    // v - pv(cell), the same two-iteration Lloyd over residual subvectors,
    // and the pair join carries the PROBED cell so each query scores a
    // neighbor with the residual of exactly that cell (unique per pair:
    // the neighbor's assigned cell).
    "q130_residual_ivfpq" -> residualIvfPqSql,
    // frozen-codebook append serves the identical result on the union
    // corpus (pivots and train slice contained in the base) — same replay
    "q137_ivfpq_append" -> residualIvfPqSql,
    "q104_ivfpq_topk" ->
      """WITH emb AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |ss AS (SELECT unnest(range(0, 8)) AS s),
        |tsv AS (SELECT e.vec_id, ss.s, e.v[ss.s*8+1 : ss.s*8+8] AS sv
        |  FROM emb e, ss WHERE e.vec_id < 64),
        |cb0 AS (SELECT s, sv, min(vec_id) AS mid FROM tsv GROUP BY 1, 2),
        |cbk AS (SELECT s, sv AS cent,
        |    row_number() OVER (PARTITION BY s ORDER BY mid) - 1 AS code
        |  FROM cb0 QUALIFY code < 16),
        |a1 AS (SELECT t.vec_id, t.s, t.sv, cbk.code,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (t.sv[i] - cbk.cent[i]) * (t.sv[i] - cbk.cent[i]))), 6) AS dd
        |  FROM tsv t JOIN cbk ON t.s = cbk.s
        |  QUALIFY row_number() OVER (PARTITION BY t.vec_id, t.s
        |    ORDER BY dd, cbk.code) = 1),
        |u1e AS (SELECT s, code, sv, unnest(range(1, 9)) AS i FROM a1),
        |u1 AS (SELECT s, code, i,
        |    sum(CAST(floor(sv[i] * 1000000) AS BIGINT)) AS sm, count(*) AS n
        |  FROM u1e GROUP BY 1, 2, 3),
        |c1 AS (SELECT s, code,
        |    list(CAST(sm AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cent
        |  FROM u1 GROUP BY 1, 2),
        |cb1 AS (SELECT cbk.s, cbk.code, coalesce(c1.cent, cbk.cent) AS cent
        |  FROM cbk LEFT JOIN c1 ON cbk.s = c1.s AND cbk.code = c1.code),
        |a2 AS (SELECT t.vec_id, t.s, t.sv, cb1.code,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (t.sv[i] - cb1.cent[i]) * (t.sv[i] - cb1.cent[i]))), 6) AS dd
        |  FROM tsv t JOIN cb1 ON t.s = cb1.s
        |  QUALIFY row_number() OVER (PARTITION BY t.vec_id, t.s
        |    ORDER BY dd, cb1.code) = 1),
        |u2e AS (SELECT s, code, sv, unnest(range(1, 9)) AS i FROM a2),
        |u2 AS (SELECT s, code, i,
        |    sum(CAST(floor(sv[i] * 1000000) AS BIGINT)) AS sm, count(*) AS n
        |  FROM u2e GROUP BY 1, 2, 3),
        |c2 AS (SELECT s, code,
        |    list(CAST(sm AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cent
        |  FROM u2 GROUP BY 1, 2),
        |cb2 AS (SELECT cb1.s, cb1.code, coalesce(c2.cent, cb1.cent) AS cent
        |  FROM cb1 LEFT JOIN c2 ON cb1.s = c2.s AND cb1.code = c2.code),
        |dsv AS (SELECT e.vec_id, ss.s, e.v[ss.s*8+1 : ss.s*8+8] AS sv
        |  FROM emb e, ss),
        |cnd AS (SELECT d.vec_id, d.s, cb2.code,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (d.sv[i] - cb2.cent[i]) * (d.sv[i] - cb2.cent[i]))), 6) AS dd
        |  FROM dsv d JOIN cb2 ON d.s = cb2.s),
        |enc AS (SELECT vec_id, s, code FROM cnd
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, code) = 1),
        |piv AS (SELECT vec_id AS pid, v AS pv FROM emb ORDER BY vec_id LIMIT 16),
        |acell AS (SELECT e.vec_id, piv.pid AS cell,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> (e.v[i] - piv.pv[i]) * (e.v[i] - piv.pv[i]))), 6) AS dd
        |  FROM emb e, piv
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dd, pid) = 1),
        |qcell AS (SELECT e.vec_id AS qid, piv.pid AS cell,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> (e.v[i] - piv.pv[i]) * (e.v[i] - piv.pv[i]))), 6) AS dd
        |  FROM emb e, piv WHERE e.vec_id < 10
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dd, pid) <= 4),
        |cpair AS (SELECT q.qid, a.vec_id AS neighbor_id
        |  FROM acell a JOIN qcell q ON a.cell = q.cell
        |  WHERE a.vec_id <> q.qid),
        |qs AS (SELECT e.vec_id AS qid, ss.s, e.v[ss.s*8+1 : ss.s*8+8] AS qsv
        |  FROM emb e, ss WHERE e.vec_id < 10),
        |pair AS (SELECT cp.qid, cp.neighbor_id, en.s,
        |    list_sum(list_transform(range(1, 9),
        |      i -> (qs.qsv[i] - cb2.cent[i]) * (qs.qsv[i] - cb2.cent[i]))) AS dsub
        |  FROM cpair cp
        |    JOIN enc en ON en.vec_id = cp.neighbor_id
        |    JOIN cb2 ON en.s = cb2.s AND en.code = cb2.code
        |    JOIN qs ON qs.qid = cp.qid AND qs.s = en.s),
        |dist AS (SELECT qid, neighbor_id,
        |    round(list_sum(list(dsub ORDER BY s)), 6) AS adc_dist
        |  FROM pair GROUP BY 1, 2),
        |r AS (SELECT qid, neighbor_id, adc_dist,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY adc_dist, neighbor_id) AS INT) AS "rank"
        |  FROM dist)
        |SELECT qid, neighbor_id, adc_dist, "rank" FROM r
        |WHERE "rank" <= 5
        |ORDER BY qid, "rank"""".stripMargin,
    // the ENTIRE PQ pipeline replayed: first-K codebooks per subspace
    // (distinct subvectors by min id), encode as the rounded-d2 argmin
    // (code tiebreak), ADC distance as the subspace-ORDERED sum of
    // query-to-centroid squared distances (pure +/*, no libm), rank window
    "q103_pq_topk" -> pqTopkReplaySql(
      """SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings""".stripMargin),
    // every report number replayed exactly: q55's integer quality points,
    // q31's fingerprint for the distinct count, integer sums, and the
    // ratio columns as identical double divisions
    "q101_corpus_report" ->
      """WITH t AS (SELECT source, coalesce(text, '') AS tx FROM documents),
        |u AS (SELECT source, tx,
        |    string_split_regex(lower(trim(replace(tx, chr(11), ' '))), '\s+') AS toks,
        |    md5(regexp_replace(lower(trim(tx)), '\s+', ' ', 'g')) AS fp FROM t),
        |p AS (SELECT source, tx, toks, fp,
        |    (CASE WHEN len(toks) BETWEEN 30 AND 500 THEN 5 ELSE 0 END)
        |  + (CASE WHEN CAST(len(list_filter(toks, x -> list_contains(
        |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
        |      / len(toks) >= 0.05 THEN 3 ELSE 0 END)
        |  + (CASE WHEN CAST(len(regexp_extract_all(tx, '[.,!?;:]')) AS DOUBLE)
        |      / length(tx) <= 0.1 THEN 2 ELSE 0 END) AS pts
        |  FROM u),
        |g AS (SELECT source,
        |    CAST(count(*) AS BIGINT) AS docs,
        |    CAST(sum(len(toks)) AS BIGINT) AS tokens_sum,
        |    CAST(sum(length(tx)) AS BIGINT) AS chars_sum,
        |    CAST(count(DISTINCT fp) AS BIGINT) AS distinct_docs,
        |    CAST(count(*) FILTER (WHERE len(toks) < 30) AS BIGINT) AS short_docs,
        |    CAST(sum(pts) AS BIGINT) AS quality_sum
        |  FROM p GROUP BY 1)
        |SELECT source, docs, tokens_sum, chars_sum, distinct_docs, short_docs,
        |  quality_sum,
        |  CAST(1 AS DOUBLE)
        |    - CAST(distinct_docs AS DOUBLE) / CAST(docs AS DOUBLE) AS dup_rate,
        |  CAST(quality_sum AS DOUBLE) / CAST(docs AS DOUBLE) AS avg_quality,
        |  CAST(tokens_sum AS DOUBLE) / CAST(docs AS DOUBLE) AS avg_tokens
        |FROM g ORDER BY source""".stripMargin,
    // the identical md5 placement arithmetic: key = md5("<id>:1:graft:shuffle"),
    // part = leading 32 bits mod 32
    "q102_epoch_shuffle" ->
      """SELECT doc_id,
        |  CAST(CAST(('0x' || substr(k, 1, 8)) AS BIGINT) % 32 AS INT)
        |    AS shuffle_part,
        |  k AS shuffle_key
        |FROM (SELECT doc_id, md5(doc_id || ':1:graft:shuffle') AS k
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // the budget prefix replayed as ONE global cumsum window over the
    // unique (quality DESC, doc_id) order — equivalent to the two-phase
    // prefix sum because the order key is unique; quality points are q55's
    // integer rules, tokens the q32 count; integer sums, exact compare
    "q100_token_budget" ->
      s"""WITH t AS (SELECT doc_id, text, $docToks AS toks FROM documents),
         |p AS (SELECT doc_id,
         |    CAST((CASE WHEN len(toks) BETWEEN 30 AND 500 THEN 5 ELSE 0 END)
         |  + (CASE WHEN CAST(len(list_filter(toks, x -> list_contains(
         |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
         |      / len(toks) >= 0.05 THEN 3 ELSE 0 END)
         |  + (CASE WHEN CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
         |      / length(text) <= 0.1 THEN 2 ELSE 0 END) AS INT) AS quality,
         |    CAST(len(toks) AS INT) AS tokens
         |  FROM t),
         |r AS (SELECT doc_id, quality, tokens,
         |    CAST(sum(tokens) OVER (ORDER BY quality DESC, doc_id) AS BIGINT)
         |      AS cum_tokens
         |  FROM p)
         |SELECT doc_id, quality, tokens, cum_tokens FROM r
         |WHERE cum_tokens <= 10000
         |ORDER BY doc_id""".stripMargin,
    // span masking replayed: positioned 8-grams (pos 0-based both sides),
    // IN-list collision against the distinct bench grams, ordered hit list,
    // and the keep filter as nested lambdas — a token at index i is cut iff
    // some hit p satisfies p-2 <= i <= p+9 (k=8, margin=2)
    "q99_mask_contamination" ->
      s"""WITH c AS (SELECT doc_id, $docToks AS toks FROM documents
         |  WHERE doc_id % 20 <> 0),
         |b AS (SELECT $docToks AS toks FROM documents WHERE doc_id % 20 = 0),
         |bg AS (SELECT DISTINCT concat_ws(' ', toks[i], toks[i+1], toks[i+2],
         |    toks[i+3], toks[i+4], toks[i+5], toks[i+6], toks[i+7]) AS g
         |  FROM (SELECT toks, unnest(range(1, len(toks) - 6)) AS i
         |    FROM b WHERE len(toks) >= 8)),
         |pg AS (SELECT doc_id, i - 1 AS pos, concat_ws(' ', toks[i], toks[i+1],
         |    toks[i+2], toks[i+3], toks[i+4], toks[i+5], toks[i+6], toks[i+7]) AS g
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
         |    FROM c WHERE len(toks) >= 8)),
         |h AS (SELECT doc_id, list(pos ORDER BY pos) AS hits FROM pg
         |  WHERE g IN (SELECT g FROM bg) GROUP BY 1),
         |m AS (SELECT c.doc_id, c.toks, coalesce(h.hits, []::BIGINT[]) AS hits
         |  FROM c LEFT JOIN h USING (doc_id)),
         |r AS (SELECT doc_id, toks, hits,
         |    list_filter(range(0, len(toks)), i ->
         |      len(list_filter(hits, p -> i >= p - 2 AND i <= p + 9)) = 0)
         |      AS keep_idx
         |  FROM m)
         |SELECT doc_id,
         |  coalesce(array_to_string(list_transform(keep_idx, i -> toks[i + 1]),
         |    ' '), '') AS text_clean,
         |  CAST(len(hits) AS INT) AS spans_hit,
         |  CAST(len(toks) AS INT) AS tokens_total,
         |  CAST(len(toks) - len(keep_idx) AS INT) AS tokens_masked
         |FROM r ORDER BY doc_id""".stripMargin,
    // the tf-idf replay: same distinct-token df aggregate with the same
    // deterministic top-K cap, idf over exact integer ratios, score
    // rounded to 6 dp before the per-doc rank window (term tiebreak);
    // DuckDB's row_number is BIGINT so the rank casts to INT to match
    "q98_tfidf_topterms" ->
      s"""WITH t AS (SELECT doc_id, $docToks AS toks FROM documents),
         |dfreq AS (SELECT term, count(*) AS df FROM (
         |    SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t)
         |  GROUP BY 1
         |  QUALIFY row_number() OVER (ORDER BY df DESC, term) <= 1048576),
         |nn AS (SELECT count(*) AS n FROM documents),
         |tfc AS (SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY 1, 2),
         |sc AS (SELECT tfc.doc_id, tfc.term, tfc.tf,
         |    round(CAST(tfc.tf AS DOUBLE) *
         |      ln(CAST(n + 1 AS DOUBLE) / CAST(coalesce(dfreq.df, 1) + 1 AS DOUBLE)),
         |      6) AS tfidf
         |  FROM tfc LEFT JOIN dfreq USING (term), nn),
         |r AS (SELECT doc_id, term, tf, tfidf,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tfidf DESC, term) AS INT) AS "rank"
         |  FROM sc)
         |SELECT doc_id, term, tf, tfidf, "rank" FROM r
         |WHERE "rank" <= 5
         |ORDER BY doc_id, "rank"""".stripMargin,
    // argmax replayed as the rank window: highest n_chars, doc_id tiebreak
    "q97_dedup_keep_best" ->
      """WITH f AS (SELECT doc_id, n_chars,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |b AS (SELECT doc_id, n_chars, fp,
        |    row_number() OVER (PARTITION BY fp ORDER BY n_chars DESC, doc_id) AS rn,
        |    CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_copies
        |  FROM f)
        |SELECT doc_id, n_chars, n_copies, fp
        |FROM b WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // all seven Gopher rules replayed: same tokenization ($docToks), same
    // integer counts, same double divisions and thresholds; rules whose
    // denominator is zero (no words / no non-blank lines) are false, matching
    // the Spark side's coalesce(..., false). Verdicts as INT 0/1 both sides.
    "q82_gopher_quality" ->
      s"""WITH t AS (SELECT doc_id, coalesce(text, '') AS tx,
         |    string_split_regex(lower(trim(replace(coalesce(text, ''), chr(11), ' '))), '\\s+') AS toks
         |  FROM documents),
         |w AS (SELECT doc_id,
         |    len(list_filter(toks, x -> len(x) > 0)) AS n_words,
         |    list_sum(list_transform(toks, x -> CAST(len(x) AS BIGINT))) AS char_sum,
         |    len(regexp_extract_all(tx, '#'))
         |      + len(regexp_extract_all(tx, '\\.\\.\\.')) AS n_symbols,
         |    list_filter(string_split_regex(tx, '\\n'),
         |      l -> len(trim(l)) > 0) AS lns,
         |    len(list_filter(toks, x -> regexp_matches(x, '\\p{L}'))) AS n_alpha,
         |    len(list_filter(['the','be','to','of','and','that','have','with'],
         |      s -> list_contains(toks, s))) AS stop_hits
         |  FROM t),
         |r AS (SELECT doc_id,
         |    CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r_word_count,
         |    CASE WHEN n_words > 0 AND CAST(char_sum AS DOUBLE)/n_words
         |      BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END AS r_mean_word_len,
         |    CASE WHEN n_words > 0 AND CAST(n_symbols AS DOUBLE)/n_words <= 0.1
         |      THEN 1 ELSE 0 END AS r_symbol_ratio,
         |    CASE WHEN len(lns) > 0 AND CAST(len(list_filter(lns,
         |        l -> regexp_matches(trim(l), '^[-*•‣▪]')))
         |        AS DOUBLE)/len(lns) <= 0.9 THEN 1 ELSE 0 END AS r_bullet_lines,
         |    CASE WHEN len(lns) > 0 AND CAST(len(list_filter(lns,
         |        l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$')))
         |        AS DOUBLE)/len(lns) <= 0.3 THEN 1 ELSE 0 END AS r_ellipsis_lines,
         |    CASE WHEN n_words > 0 AND CAST(n_alpha AS DOUBLE)/n_words >= 0.8
         |      THEN 1 ELSE 0 END AS r_alpha_words,
         |    CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS r_stop_hits
         |  FROM w)
         |SELECT doc_id, r_word_count, r_mean_word_len, r_symbol_ratio,
         |  r_bullet_lines, r_ellipsis_lines, r_alpha_words, r_stop_hits,
         |  r_word_count * r_mean_word_len * r_symbol_ratio * r_bullet_lines
         |    * r_ellipsis_lines * r_alpha_words * r_stop_hits AS gopher_pass
         |FROM r ORDER BY doc_id""".stripMargin,
    // the full C4 replay: q70-style line synthesis (8-token slices, ending
    // by (doc_id+i)%4, every 5th line 3 words, lorem/brace plants), then the
    // line rules (terminal punct, >=5 words, no javascript) and page rules
    // (>=3 sentences in CLEANED text, lorem, brace, blockword) in SQL
    "q84_c4_filters" ->
      s"""WITH fix AS (SELECT doc_id, $docToks AS t FROM documents),
         |nl AS (SELECT doc_id, t,
         |    greatest(CAST(ceil(len(t)/8.0) AS INT), 1) AS n FROM fix),
         |li AS (SELECT doc_id, t, unnest(range(0, n)) AS i FROM nl),
         |bl AS (SELECT doc_id, i,
         |    array_to_string(t[i*8+1 : i*8 + (CASE WHEN i%5=4 THEN 3 ELSE 8 END)], ' ')
         |    || (CASE WHEN (doc_id+i)%4=0 THEN '.' WHEN (doc_id+i)%4=1 THEN '!'
         |             WHEN (doc_id+i)%4=2 THEN '' ELSE ' javascript.' END) AS line
         |  FROM li),
         |body AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS b
         |         FROM bl GROUP BY 1),
         |doc AS (SELECT doc_id, b
         |    || (CASE WHEN doc_id%11=0 THEN chr(10)||'see lorem ipsum terms.' ELSE '' END)
         |    || (CASE WHEN doc_id%13=0 THEN chr(10)||'config { }' ELSE '' END) AS tx
         |  FROM body),
         |l0 AS (SELECT doc_id, tx,
         |    list_filter(string_split(tx, chr(10)), l -> len(trim(l)) > 0) AS lns
         |  FROM doc),
         |k AS (SELECT doc_id, tx, lns,
         |    list_filter(lns, l -> regexp_matches(trim(l), '[.!?"]$$')
         |      AND len(list_filter(string_split_regex(trim(l), '\\s+'),
         |            w -> len(w) > 0)) >= 5
         |      AND NOT contains(lower(l), 'javascript')) AS keptl
         |  FROM l0),
         |c AS (SELECT doc_id, tx, lns, keptl,
         |    coalesce(array_to_string(keptl, chr(10)), '') AS clean_text,
         |    string_split_regex(lower(trim(replace(tx, chr(11), ' '))), '\\s+') AS toks FROM k),
         |r AS (SELECT doc_id,
         |    CAST(len(lns) AS INT) AS n_lines,
         |    CAST(len(keptl) AS INT) AS n_lines_kept,
         |    CAST(len(regexp_extract_all(clean_text, '[.!?]')) AS INT) AS n_sentences,
         |    CASE WHEN contains(lower(tx), 'lorem ipsum') THEN 1 ELSE 0 END AS has_lorem,
         |    CASE WHEN contains(tx, '{') THEN 1 ELSE 0 END AS has_brace,
         |    CAST(len(list_filter(['customer'],
         |      w -> list_contains(toks, w))) AS INT) AS blocked_hits,
         |    clean_text FROM c)
         |SELECT doc_id, n_lines, n_lines_kept, n_sentences, has_lorem,
         |  has_brace, blocked_hits,
         |  CASE WHEN n_sentences >= 3 AND has_lorem=0 AND has_brace=0
         |       AND blocked_hits=0 THEN 1 ELSE 0 END AS c4_keep,
         |  clean_text
         |FROM r ORDER BY doc_id""".stripMargin,
    // per-source integer quality points (q32's quality components ×10);
    // mean = sum(int)/count, the fold-order-exact form
    "q55_source_gate" ->
      s"""WITH t AS (SELECT doc_id, source, text, $docToks AS toks FROM documents),
         |p AS (SELECT doc_id, source,
         |    (CASE WHEN len(toks) BETWEEN 30 AND 500 THEN 5 ELSE 0 END)
         |  + (CASE WHEN CAST(len(list_filter(toks, x -> list_contains(
         |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
         |      / len(toks) >= 0.05 THEN 3 ELSE 0 END)
         |  + (CASE WHEN CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
         |      / length(text) <= 0.1 THEN 2 ELSE 0 END) AS pts
         |  FROM t),
         |s AS (SELECT source, CAST(count(*) AS BIGINT) AS src_docs,
         |        CAST(sum(pts) AS BIGINT) AS sum_pts FROM p GROUP BY 1),
         |k AS (SELECT source, src_docs,
         |        CAST(sum_pts AS DOUBLE)/src_docs AS avg_points FROM s
         |      WHERE CAST(sum_pts AS DOUBLE)/src_docs >= 7.8)
         |SELECT d.doc_id, d.source, k.src_docs, k.avg_points
         |FROM documents d JOIN k USING (source)
         |ORDER BY doc_id""".stripMargin,
    // the full quantized-ANN pipeline in exact integer arithmetic:
    // scale = max|v|/127, q = round(v/scale), rank by integer-dot cosine
    "q56_ann_quantized" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |s AS (SELECT vec_id, v,
         |    list_max(list_transform(v, x -> abs(x)))/127.0 AS scale FROM e),
         |q AS (SELECT vec_id,
         |    list_transform(v, x -> CAST(round(x/scale) AS BIGINT)) AS qv FROM s),
         |n AS (SELECT vec_id, qv,
         |    sqrt(CAST(list_sum(list_transform(qv, x -> x*x)) AS DOUBLE)) AS qn
         |  FROM q),
         |qs AS (SELECT vec_id AS qid, qv AS qqv, qn AS qqn FROM n WHERE vec_id < 10),
         |p AS (SELECT qid, n.vec_id AS neighbor_id,
         |    round(CAST(list_sum(list_transform(range(1, 65),
         |      k -> qqv[k]*n.qv[k])) AS DOUBLE)/(qqn*n.qn), 6) AS qcos_sim
         |  FROM n, qs WHERE n.vec_id <> qid),
         |r AS (SELECT qid, neighbor_id, qcos_sim,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY qcos_sim DESC, neighbor_id) AS INT) AS rank
         |  FROM p)
         |SELECT qid, neighbor_id, qcos_sim, rank FROM r WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    // the arrival batch reconstructed in SQL; kept = fingerprints absent
    // from the seen corpus (the Bloom prefilter never changes the result)
    "q60_incremental_dedup" ->
      """WITH seen AS (SELECT DISTINCT
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |nb AS (
        |  SELECT doc_id + 1000 AS doc_id, upper(text) AS text
        |  FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 1000, text || ' zqfreshx'
        |  FROM documents WHERE doc_id BETWEEN 100 AND 149),
        |f AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM nb)
        |SELECT doc_id FROM f WHERE fp NOT IN (SELECT fp FROM seen)
        |ORDER BY doc_id""".stripMargin,
    // q61: the per-channel means recomputed ANALYTICALLY from the synthetic
    // pixel formula (r = (id+3x+5y)%256, g = (2id+7x+y)%256, b = (id+xy)%256
    // over dims 16+id%8 × 16+3id%8) — no image decoder on the oracle side;
    // PNG losslessness is what makes this a decode test, not an encode one
    "q61_image_decode" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(16 + doc_id % 8 AS INT) AS width,
        |    CAST(16 + (doc_id * 3) % 8 AS INT) AS height
        |  FROM documents),
        |xs AS (SELECT doc_id, width, height,
        |         unnest(range(0, width)) AS x FROM dims),
        |xy AS (SELECT doc_id, width, height, x,
        |         unnest(range(0, height)) AS y FROM xs),
        |agg AS (SELECT doc_id, width, height,
        |    SUM((doc_id + 3*x + 5*y) % 256) AS sr,
        |    SUM((2*doc_id + 7*x + y) % 256) AS sg,
        |    SUM((doc_id + x*y) % 256) AS sb
        |  FROM xy GROUP BY 1, 2, 3)
        |SELECT doc_id, width, height,
        |  CAST(sr AS DOUBLE)/(width*height) AS avg_r,
        |  CAST(sg AS DOUBLE)/(width*height) AS avg_g,
        |  CAST(sb AS DOUBLE)/(width*height) AS avg_b
        |FROM agg ORDER BY doc_id""".stripMargin,
    // q62: loudness statistics recomputed analytically from the synthetic
    // PCM sample formula — integer |s| and s² sums are exact, the divide
    // and IEEE sqrt are engine-reproducible; no audio decoder on this side
    "q62_audio_decode" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(1000 + doc_id % 500 AS INT) AS n FROM documents),
        |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
        |v AS (SELECT doc_id, n,
        |        ((doc_id*7 + i*31) % 65536) - 32768 AS s FROM sm),
        |agg AS (SELECT doc_id, n, SUM(ABS(s)) AS sa, SUM(s*s) AS sq
        |        FROM v GROUP BY 1, 2)
        |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, n AS n_samples,
        |  CAST(sa AS DOUBLE)/n AS avg_abs,
        |  sqrt(CAST(sq AS DOUBLE)/n) AS rms
        |FROM agg ORDER BY doc_id""".stripMargin,
    // q68: per-sampled-frame gray means recomputed ANALYTICALLY from the
    // synthetic frame formula (v = (id + 11f + 3x + 5y) % 256 over dims
    // 16+id%5 × 12+3id%5, frames 0..2+id%3, sampled every 2nd) — no video
    // decoder on the oracle side; the explicit gray palette makes the GIF
    // round-trip lossless, so the hash pins the sequence decoder AND the
    // frame count/sampling
    "q68_video_frames" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(16 + doc_id % 5 AS INT) AS width,
        |    CAST(12 + (doc_id * 3) % 5 AS INT) AS height,
        |    2 + doc_id % 3 AS n_frames
        |  FROM documents),
        |fr AS (SELECT doc_id, width, height,
        |         unnest(range(0, n_frames)) AS f FROM dims),
        |sampled AS (SELECT * FROM fr WHERE f % 2 = 0),
        |xs AS (SELECT doc_id, width, height, f,
        |         unnest(range(0, width)) AS x FROM sampled),
        |xy AS (SELECT doc_id, width, height, f, x,
        |         unnest(range(0, height)) AS y FROM xs),
        |agg AS (SELECT doc_id, f, width, height,
        |    SUM((doc_id + 11*f + 3*x + 5*y) % 256) AS sv
        |  FROM xy GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx, width, height,
        |  CAST(sv AS DOUBLE)/(width*height) AS avg_v
        |FROM agg ORDER BY doc_id, frame_idx""".stripMargin,
    // q77: q62's loudness oracle over the μ-law fixture — the G.711
    // expansion ( ~code → sign/exponent/mantissa → linear ) replayed as
    // integer arithmetic (255 - c == ~c & 0xFF for byte codes; << and //
    // are DuckDB's shift and integer-divide), then the same exact integer
    // |s| and s² sums as q62
    "q77_ulaw_audio" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(800 + doc_id % 400 AS INT) AS n FROM documents),
        |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
        |u AS (SELECT doc_id, n,
        |        255 - ((doc_id*13 + i*17) % 256) AS uu FROM sm),
        |v AS (SELECT doc_id, n,
        |        CASE WHEN uu >= 128 THEN -((((uu % 16) * 8 + 132) << ((uu // 16) % 8)) - 132)
        |             ELSE (((uu % 16) * 8 + 132) << ((uu // 16) % 8)) - 132 END AS s
        |      FROM u),
        |agg AS (SELECT doc_id, n, SUM(ABS(s)) AS sa, SUM(s*s) AS sq
        |        FROM v GROUP BY 1, 2)
        |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, n AS n_samples,
        |  CAST(sa AS DOUBLE)/n AS avg_abs,
        |  sqrt(CAST(sq AS DOUBLE)/n) AS rms
        |FROM agg ORDER BY doc_id""".stripMargin,
    // q78: the A-law expansion replayed arithmetically — xor(c, 85)
    // toggles the even bits, segment = bits 4-6, mantissa = low nibble,
    // 0x108 = 264; sign bit SET means positive (A-law's convention, the
    // mirror of μ-law's) — then q77's exact integer loudness sums
    "q78_alaw_audio" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(900 + doc_id % 300 AS INT) AS n FROM documents),
        |sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM dims),
        |aw AS (SELECT doc_id, n,
        |        xor((doc_id*11 + i*19) % 256, 85) AS aa FROM sm),
        |tv AS (SELECT doc_id, n, aa,
        |        CASE WHEN ((aa // 16) % 8) = 0 THEN (aa % 16) * 16 + 8
        |             ELSE ((aa % 16) * 16 + 264) << (((aa // 16) % 8) - 1)
        |        END AS t FROM aw),
        |sv AS (SELECT doc_id, n,
        |        CASE WHEN aa >= 128 THEN t ELSE -t END AS s FROM tv),
        |agg AS (SELECT doc_id, n, SUM(ABS(s)) AS sa, SUM(s*s) AS sq
        |        FROM sv GROUP BY 1, 2)
        |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, n AS n_samples,
        |  CAST(sa AS DOUBLE)/n AS avg_abs,
        |  sqrt(CAST(sq AS DOUBLE)/n) AS rms
        |FROM agg ORDER BY doc_id""".stripMargin,
    // q79: the SemDeDup pipeline replayed end-to-end — q41's planted
    // corpus (verbatim), nearest-of-16-pivots assignment (q42's asg
    // pattern), intra-cell exact pairs at 0.95, q49's recursive min-label
    // closure, survivors = ids that are their component's minimum.
    // q81 serves the SAME pipeline from the persisted bucketed index
    // (bit-stable assignment), so its oracle is this SQL verbatim.
    "q79_semantic_dedup" -> semanticDedupSql,
    "q81_semantic_dedup_indexed" -> semanticDedupSql,
    // q80: incremental embedding dedup — arrivals (odd originals + planted
    // twins of every original) minus those with cosine >= 0.95 to a seen
    // (even-id) vector. Brute-force arrival x seen join is exact because
    // the Spark side runs the recall-1.0 LSH regime (see the query's
    // comment); planted-twin CTE is lshPairsOracleSql's, verbatim.
    "q80_incremental_cosine" ->
      """WITH pb AS (SELECT vec_id AS oid, embedding AS emb FROM embeddings),
        |pl AS (SELECT oid + 1000000 AS vec_id,
        |  list_transform(range(0, 64), d -> CAST(CAST(emb[d+1] AS DOUBLE) +
        |    CAST(0.01 AS DOUBLE) * CAST((oid*131 + d*7919) % 1000003
        |      * 2654435761 % 2000003 - 1000001 AS DOUBLE)
        |    / CAST(1000001.0 AS DOUBLE) AS REAL)) AS embedding
        |  FROM pb),
        |arr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1
        |        UNION ALL SELECT vec_id, embedding FROM pl),
        |na AS (SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |       FROM arr),
        |a2 AS (SELECT vec_id, v,
        |         sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM na),
        |ns AS (SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |       FROM embeddings WHERE vec_id % 2 = 0),
        |s2 AS (SELECT vec_id, v,
        |         sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM ns),
        |dropped AS (SELECT DISTINCT a.vec_id
        |  FROM a2 a JOIN s2 s
        |    ON round(list_sum(list_transform(range(1, 65),
        |      k -> a.v[k]*s.v[k])) / (a.nrm*s.nrm), 6) >= 0.95)
        |SELECT vec_id FROM arr
        |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        |ORDER BY vec_id""".stripMargin,
    // q76: q68's analytic-mean oracle over the AVI fixture's own dims
    // (14+id%6 × 10+5id%7, frames 0..2+id%4, sampled every 2nd); the DIB
    // losslessness argument replaces the GIF palette one — no video
    // decoder on the oracle side
    "q76_avi_frames" ->
      """WITH dims AS (SELECT doc_id,
        |    CAST(14 + doc_id % 6 AS INT) AS width,
        |    CAST(10 + (doc_id * 5) % 7 AS INT) AS height,
        |    2 + doc_id % 4 AS n_frames
        |  FROM documents),
        |fr AS (SELECT doc_id, width, height,
        |         unnest(range(0, n_frames)) AS f FROM dims),
        |sampled AS (SELECT * FROM fr WHERE f % 2 = 0),
        |xs AS (SELECT doc_id, width, height, f,
        |         unnest(range(0, width)) AS x FROM sampled),
        |xy AS (SELECT doc_id, width, height, f, x,
        |         unnest(range(0, height)) AS y FROM xs),
        |agg AS (SELECT doc_id, f, width, height,
        |    SUM((doc_id + 11*f + 3*x + 5*y) % 256) AS sv
        |  FROM xy GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx, width, height,
        |  CAST(sv AS DOUBLE)/(width*height) AS avg_v
        |FROM agg ORDER BY doc_id, frame_idx""".stripMargin,
    // q69: the same deterministic PII fixture rebuilt in SQL, then the SAME
    // RE2-compatible patterns replayed in the SAME order ('g' = replace-all,
    // matching Spark's regexp_replace); counts measured on the original
    // text per pattern, mirroring Corpus.redactPii
    "q69_pii_redaction" ->
      """WITH pii AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com' ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' admin@test.org' ELSE '' END ||
        |    ' or 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |    '\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}', '<PHONE>', 'g') AS text_redacted,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(text,
        |    '\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}')) AS INT) AS n_phones
        |FROM pii ORDER BY doc_id""".stripMargin,
    // q70: the line fixture rebuilt in SQL (header carrying the source,
    // 10-token body lines via list slicing, shared footer), then the
    // frequency threshold over DISTINCT docs per trimmed line and the
    // in-order reassembly — note range() is exclusive where Spark's
    // sequence() is inclusive, hence greatest(n, 1) vs greatest(n-1, 0)
    "q70_boilerplate_lines" ->
      """WITH fix AS (SELECT doc_id, 'begin header ' || source AS hdr,
        |    string_split_regex(lower(trim(replace(text, chr(11), ' '))), '\s+') AS t FROM documents),
        |nl AS (SELECT doc_id, hdr, t,
        |    greatest(CAST(ceil(len(t)/10.0) AS INT), 1) AS n FROM fix),
        |li AS (SELECT doc_id, hdr, t, unnest(range(0, n)) AS i FROM nl),
        |bl AS (SELECT doc_id, hdr, i,
        |    array_to_string(t[i*10+1 : i*10+10], ' ') AS line FROM li),
        |body AS (SELECT doc_id, hdr,
        |    string_agg(line, chr(10) ORDER BY i) AS b FROM bl GROUP BY 1, 2),
        |doc AS (SELECT doc_id, hdr || chr(10) || b || chr(10) ||
        |    'copyright footer all rights reserved' AS text FROM body),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM doc),
        |ln AS (SELECT doc_id, l, unnest(range(1, len(l)+1)) AS i FROM ls),
        |line AS (SELECT doc_id, i, l[i] AS line FROM ln),
        |df AS (SELECT trim(line) AS v, count(DISTINCT doc_id) AS docs
        |       FROM line GROUP BY 1),
        |flag AS (SELECT doc_id, i, line,
        |    trim(line) IN (SELECT v FROM df WHERE docs >= 10) AS dropped
        |  FROM line)
        |SELECT doc_id,
        |  coalesce(string_agg(line, chr(10) ORDER BY i)
        |    FILTER (WHERE NOT dropped), '') AS text_clean,
        |  count(*) FILTER (WHERE NOT dropped) AS n_lines_kept,
        |  count(*) FILTER (WHERE dropped) AS n_lines_dropped
        |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q72: 8-token windows via 1-based list slicing (range is end-exclusive
    // where Spark's sequence is inclusive: i in [1, len-7] mirrors starts
    // [0, len-8]), then the distinct-doc threshold
    "q72_duplicate_spans" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(replace(coalesce(text, ''), chr(11), ' '))), '\s+') AS tk
        |  FROM documents),
        |wi AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
        |  FROM t WHERE len(tk) >= 8),
        |w AS (SELECT doc_id, array_to_string(tk[i : i+7], ' ') AS span FROM wi)
        |SELECT span, count(DISTINCT doc_id) AS n_docs,
        |  count(*) AS n_occurrences
        |FROM w GROUP BY span HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY span""".stripMargin,
    // q73: same windows + threshold, then covered 1-based positions
    // (range(i, i+8) = the 8 tokens under a window at i) anti-joined onto
    // the per-position token list for the in-order rebuild; a fully
    // covered doc yields '' via the FILTER + coalesce, matching the
    // operator's empty-string (never dropped-row) contract
    "q73_drop_duplicate_spans" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(replace(coalesce(text, ''), chr(11), ' '))), '\s+') AS tk
        |  FROM documents),
        |wi AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
        |  FROM t WHERE len(tk) >= 8),
        |w AS (SELECT doc_id, i, array_to_string(tk[i : i+7], ' ') AS span
        |  FROM wi),
        |dup AS (SELECT span FROM w
        |  GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
        |cov0 AS (SELECT doc_id, unnest(range(i, i + 8)) AS j FROM w
        |  WHERE span IN (SELECT span FROM dup)),
        |cov AS (SELECT DISTINCT doc_id, j FROM cov0),
        |tok AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS p FROM t),
        |tv AS (SELECT doc_id, p, tk[p] AS tok FROM tok)
        |SELECT tv.doc_id,
        |  coalesce(string_agg(tok, ' ' ORDER BY p)
        |    FILTER (WHERE cov.j IS NULL), '') AS text_clean,
        |  CAST(count(*) FILTER (WHERE cov.j IS NOT NULL) AS INT)
        |    AS n_tokens_removed
        |FROM tv LEFT JOIN cov ON cov.doc_id = tv.doc_id AND cov.j = tv.p
        |GROUP BY tv.doc_id ORDER BY tv.doc_id""".stripMargin,
    // q74: the same salted-md5 ranking (hex strings order identically in
    // both engines; id as tiebreak)
    "q74_cap_per_source" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id || ':graft:cap'), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin,
    // q75: the count -> rate -> hash-threshold chain replayed with DOUBLE
    // arithmetic end to end (DuckDB numeric literals are DECIMAL, hence the
    // casts; the weight normalization mirrors the operator's left-to-right
    // sum), threshold = floor(f*10000 + 0.5) = Scala's math.round
    "q75_target_mixture" ->
      """WITH z AS (SELECT CAST(0.5 AS DOUBLE) + CAST(0.3 AS DOUBLE)
        |    + CAST(0.2 AS DOUBLE) AS z),
        |tgt AS (
        |  SELECT 'src0' AS source, CAST(0.5 AS DOUBLE)/(SELECT z FROM z) AS wt
        |  UNION ALL
        |  SELECT 'src1', CAST(0.3 AS DOUBLE)/(SELECT z FROM z)
        |  UNION ALL
        |  SELECT 'src2', CAST(0.2 AS DOUBLE)/(SELECT z FROM z)),
        |c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2') GROUP BY source),
        |j AS (SELECT t.source, t.wt, c.n FROM tgt t JOIN c USING (source)),
        |tm AS (SELECT min(n / wt) AS t FROM j),
        |cut AS (SELECT source,
        |    CAST(floor(least(CAST(1.0 AS DOUBLE), (SELECT t FROM tm) * wt / n)
        |      * 10000.0 + 0.5) AS BIGINT) AS cut
        |  FROM j)
        |SELECT d.doc_id, d.source FROM documents d JOIN cut USING (source)
        |WHERE CAST(('0x' || substr(md5(d.doc_id || ':graft:mix'), 1, 8))
        |    AS BIGINT) % 10000 < cut
        |ORDER BY doc_id""".stripMargin,
    // chunk starts = multiples of 4 below the token count; window = 8-token
    // inclusive list slice
    "q88_chunk_documents" ->
      s"""WITH t AS (SELECT doc_id, $docToks AS tk FROM documents),
         |s AS (SELECT doc_id, tk,
         |    unnest(range(0, CAST(floor((len(tk)-1)/4) AS BIGINT) + 1)) AS ci
         |  FROM t),
         |c AS (SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
         |    tk[CAST(ci*4+1 AS BIGINT) : CAST(ci*4+8 AS BIGINT)] AS ch FROM s)
         |SELECT doc_id, chunk_idx, CAST(len(ch) AS INT) AS n_tokens,
         |  array_to_string(ch, ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // q55's integer-points CTE + the per-row hash cut: floor(pts/10 * 10000
    // + 0.5) — same exact-integer division both engines
    "q87_quality_sampling" ->
      s"""WITH t AS (SELECT doc_id, text, $docToks AS toks FROM documents),
         |p AS (SELECT doc_id,
         |    (CASE WHEN len(toks) BETWEEN 30 AND 500 THEN 5 ELSE 0 END)
         |  + (CASE WHEN CAST(len(list_filter(toks, x -> list_contains(
         |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
         |      / len(toks) >= 0.05 THEN 3 ELSE 0 END)
         |  + (CASE WHEN CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
         |      / length(text) <= 0.1 THEN 2 ELSE 0 END) AS pts
         |  FROM t)
         |SELECT doc_id, CAST(pts AS INT) AS pts FROM p
         |WHERE CAST(('0x' || substr(md5(doc_id || ':graft:byfrac'), 1, 8))
         |    AS BIGINT) % 10000
         |  < CAST(floor(CAST(pts AS DOUBLE)/10.0 * 10000 + 0.5) AS BIGINT)
         |ORDER BY doc_id""".stripMargin,
    // URL synthesis + host regex + registrable-domain derivation (full
    // pinned multi-suffix list mirrored) + every rule, replayed in SQL
    "q86_url_filters" ->
      s"""WITH u AS (SELECT doc_id,
         |    'http' || (CASE WHEN doc_id%2=0 THEN 's' ELSE '' END) || '://'
         |    || (CASE WHEN doc_id%3=0 THEN 'www.' ELSE '' END)
         |    || source || '.'
         |    || (CASE CAST(doc_id%7 AS INT) WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com'
         |        WHEN 2 THEN 'org' WHEN 3 THEN 'net' WHEN 4 THEN 'io'
         |        WHEN 5 THEN 'com.au' ELSE 'de' END)
         |    || '/d/' || CAST((doc_id*37)%1000 AS VARCHAR)
         |    || (CASE WHEN doc_id%9=0 THEN '?pad=' || repeat('x', 60) ELSE '' END)
         |    AS url
         |  FROM documents),
         |h AS (SELECT doc_id, url,
         |    regexp_extract(lower(url),
         |      '^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1) AS host
         |  FROM u),
         |lx AS (SELECT doc_id, url, host, string_split(host, '.') AS labs,
         |    len(string_split(host, '.')) AS n FROM h),
         |d AS (SELECT doc_id, url, host,
         |    CASE WHEN regexp_matches(host, '^[0-9.]+$$') THEN host
         |         WHEN n <= 2 THEN host
         |         WHEN (labs[n-1] || '.' || labs[n]) IN ('co.uk','org.uk',
         |           'ac.uk','gov.uk','net.uk','com.au','net.au','org.au',
         |           'co.jp','ne.jp','or.jp','com.br','com.cn','com.mx',
         |           'com.ar','com.tr','com.tw','co.in','co.kr','co.za',
         |           'com.sg','com.hk')
         |           THEN labs[n-2] || '.' || labs[n-1] || '.' || labs[n]
         |         ELSE labs[n-1] || '.' || labs[n] END AS domain
         |  FROM lx),
         |r AS (SELECT doc_id, url, host, domain,
         |    CAST(length(url) AS INT) AS url_len,
         |    CAST(len(regexp_extract_all(url, '[0-9]')) AS DOUBLE)/length(url)
         |      AS digit_frac,
         |    CASE WHEN domain IN ('src0.com','src1.org','src2.co.uk')
         |         THEN 1 ELSE 0 END AS blocked
         |  FROM d)
         |SELECT doc_id, url, host, domain, url_len, digit_frac, blocked,
         |  CASE WHEN length(host) > 0 AND blocked = 0 AND url_len <= 80
         |       AND digit_frac <= 0.12 THEN 1 ELSE 0 END AS url_ok
         |FROM r ORDER BY doc_id""".stripMargin,
    // q75's replay shape with sqrt(n) weights, unnormalized (fractions are
    // normalizer-invariant; no data-ordered double sum -> bit-exact replay);
    // the skew CTE mirrors the query's deterministic two-tier thinning
    "q85_temperature_mixture" ->
      """WITH documents_sk AS (SELECT * FROM documents
        |  WHERE source IN ('src0','src1','src2','src3') OR doc_id%4 = 0),
        |c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
        |  FROM documents_sk WHERE source IS NOT NULL GROUP BY source),
        |w AS (SELECT source, n, sqrt(n) AS wt FROM c),
        |tm AS (SELECT min(n / wt) AS t FROM w),
        |cut AS (SELECT source,
        |    CAST(floor(least(CAST(1.0 AS DOUBLE), (SELECT t FROM tm) * wt / n)
        |      * 10000.0 + 0.5) AS BIGINT) AS cut
        |  FROM w)
        |SELECT d.doc_id, d.source FROM documents_sk d JOIN cut USING (source)
        |WHERE CAST(('0x' || substr(md5(d.doc_id || ':graft:temp'), 1, 8))
        |    AS BIGINT) % 10000 < cut
        |ORDER BY doc_id""".stripMargin,
    // the window-cumsum mirror of the distributed prefix sum; 1024 is a
    // power of two so the floor division is exact in double
    "q59_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($docToks) AS INT) AS tokens
         |  FROM documents),
         |c AS (SELECT doc_id, tokens,
         |    CAST(SUM(tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens
         |  FROM t)
         |SELECT doc_id, tokens, cum_tokens,
         |  CAST(floor((cum_tokens - tokens) / 1024.0) AS BIGINT) AS chunk
         |FROM c ORDER BY doc_id""".stripMargin,
    // q52's overlap chain (8-gram default), kept side: corpus docs under the
    // 0.5 overlap bar (every corpus doc has >= 1 distinct gram, so sizes
    // covers them all)
    "q58_decontaminated" ->
      s"""WITH ${shingleBaseOver("documents", 8)},
         |bench AS (SELECT DISTINCT g FROM d WHERE doc_id % 20 = 0),
         |corpus AS (SELECT * FROM d WHERE doc_id % 20 <> 0),
         |sizes AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1),
         |hits AS (SELECT doc_id, count(*) AS n_hit
         |         FROM corpus JOIN bench USING (g) GROUP BY 1)
         |SELECT s.doc_id
         |FROM sizes s LEFT JOIN hits h USING (doc_id)
         |WHERE CAST(coalesce(h.n_hit, 0) AS DOUBLE)/s.n_grams < 0.5
         |ORDER BY doc_id""".stripMargin,
    // per-stratum hash-threshold sample: en 50%, zh 100%, default 10%
    "q57_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(doc_id || ':sample1'), 1, 8)) AS BIGINT)
        |      % 10000 AS b
        |  FROM documents)
        |WHERE b < (CASE WHEN lang = 'en' THEN 5000
        |                WHEN lang = 'zh' THEN 10000 ELSE 1000 END)
        |ORDER BY doc_id""".stripMargin,
    // q46's embedding pair graph -> recursive transitive closure (q44's
    // pattern): cluster = min reachable id over the >= 0.99 cosine graph.
    // NB the pair graph uses a DENSE 64-dim list per doc (map -> list with
    // zero fill) and a brute-force list-dot join, NOT q46's bucket-join
    // `dots` CTE: under WITH RECURSIVE DuckDB materializes every CTE in the
    // list, and the bucket self-join's ~n²·64-row intermediate spilled tens
    // of GB of temp at sf0.1. The dense form is pair-value-identical
    // (verified: same 6-dp cosines) and runs in ~30 s at sf0.1.
    "q49_embed_dedup_clusters" ->
      """WITH RECURSIVE h AS (
        |  SELECT doc_id, (ascii(substr(text, CAST(i AS INT), 1))*31
        |                  + ascii(substr(text, CAST(i+1 AS INT), 1))) AS hv
        |  FROM (SELECT doc_id, text, unnest(range(1, len(text))) AS i FROM documents)),
        |acc AS (
        |  SELECT doc_id, hv % 64 AS bucket,
        |    CAST(SUM(CASE WHEN (hv // 128) % 2 = 1 THEN 1 ELSE -1 END) AS DOUBLE) AS val
        |  FROM h GROUP BY 1, 2),
        |m AS (SELECT doc_id, MAP(list(bucket ORDER BY bucket),
        |                         list(val ORDER BY bucket)) AS mp
        |      FROM acc GROUP BY doc_id),
        |dense AS (SELECT doc_id,
        |    list_transform(range(0, 64), b -> coalesce(map_extract(mp, b)[1], 0.0)) AS v0
        |  FROM m),
        |fv AS (SELECT doc_id,
        |    list_transform(v0, x -> CAST(CAST(x / sqrt(list_sum(
        |      list_transform(v0, y -> y*y))) AS FLOAT) AS DOUBLE)) AS f
        |  FROM dense),
        |n2 AS (SELECT doc_id, f, sqrt(list_sum(list_transform(f, x -> x*x))) AS n FROM fv),
        |j AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        |      FROM n2 a JOIN n2 b ON a.doc_id < b.doc_id
        |      WHERE ROUND(list_sum(list_transform(range(1, 65), k -> a.f[k]*b.f[k]))
        |                  / (a.n*b.n), 6) >= 0.99),
        |e AS (SELECT id1, id2 FROM j UNION ALL SELECT id2, id1 FROM j),
        |nodes AS (SELECT DISTINCT id1 AS id FROM e),
        |reach(id, x) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT reach.id, e.id2 FROM reach JOIN e ON reach.x = e.id1)
        |SELECT id, min(x) AS cluster FROM reach GROUP BY id ORDER BY id""".stripMargin
  )

  /** The SemDeDup pipeline in SQL (q79 AND q81 — the persisted-index path
    * serves a bit-identical assignment): planted corpus, 16-smallest-id
    * pivots, nearest-pivot cells, intra-cell exact pairs at 0.95,
    * recursive min-label closure, survivors = component minima. */
  // def, not val: referenced from `oracle` (defined above in source order) —
  // a val here would still be null when the map is built at object init.
  /** q130's full residual-IVFADC replay (smallest-id cells, residual
    * two-iteration Lloyd codebooks, residual encode + probing, ADC
    * rank) — shared verbatim by q137: frozen-codebook append equals
    * build-from-scratch on the union corpus when the pivot set and
    * train slice live in the base, so one oracle pins both. */
  private def residualIvfPqSql: String =
    """WITH emb AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |ss AS (SELECT unnest(range(0, 8)) AS s),
        |piv AS (SELECT vec_id AS pid, v AS pv FROM emb ORDER BY vec_id LIMIT 16),
        |acell AS (SELECT e.vec_id, piv.pid AS cell,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> (e.v[i] - piv.pv[i]) * (e.v[i] - piv.pv[i]))), 6) AS dd
        |  FROM emb e, piv
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dd, pid) = 1),
        |tr AS (SELECT a.vec_id,
        |    list_transform(range(1, 65), i -> e.v[i] - piv.pv[i]) AS rv
        |  FROM acell a JOIN emb e USING (vec_id) JOIN piv ON a.cell = piv.pid
        |  WHERE a.vec_id < 64),
        |tsv AS (SELECT t.vec_id, ss.s, t.rv[ss.s*8+1 : ss.s*8+8] AS sv
        |  FROM tr t, ss),
        |cb0 AS (SELECT s, sv, min(vec_id) AS mid FROM tsv GROUP BY 1, 2),
        |cbk AS (SELECT s, sv AS cent,
        |    row_number() OVER (PARTITION BY s ORDER BY mid) - 1 AS code
        |  FROM cb0 QUALIFY code < 16),
        |a1 AS (SELECT t.vec_id, t.s, t.sv, cbk.code,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (t.sv[i] - cbk.cent[i]) * (t.sv[i] - cbk.cent[i]))), 6) AS dd
        |  FROM tsv t JOIN cbk ON t.s = cbk.s
        |  QUALIFY row_number() OVER (PARTITION BY t.vec_id, t.s
        |    ORDER BY dd, cbk.code) = 1),
        |u1e AS (SELECT s, code, sv, unnest(range(1, 9)) AS i FROM a1),
        |u1 AS (SELECT s, code, i,
        |    sum(CAST(floor(sv[i] * 1000000) AS BIGINT)) AS sm, count(*) AS n
        |  FROM u1e GROUP BY 1, 2, 3),
        |c1 AS (SELECT s, code,
        |    list(CAST(sm AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cent
        |  FROM u1 GROUP BY 1, 2),
        |cb1 AS (SELECT cbk.s, cbk.code, coalesce(c1.cent, cbk.cent) AS cent
        |  FROM cbk LEFT JOIN c1 ON cbk.s = c1.s AND cbk.code = c1.code),
        |a2 AS (SELECT t.vec_id, t.s, t.sv, cb1.code,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (t.sv[i] - cb1.cent[i]) * (t.sv[i] - cb1.cent[i]))), 6) AS dd
        |  FROM tsv t JOIN cb1 ON t.s = cb1.s
        |  QUALIFY row_number() OVER (PARTITION BY t.vec_id, t.s
        |    ORDER BY dd, cb1.code) = 1),
        |u2e AS (SELECT s, code, sv, unnest(range(1, 9)) AS i FROM a2),
        |u2 AS (SELECT s, code, i,
        |    sum(CAST(floor(sv[i] * 1000000) AS BIGINT)) AS sm, count(*) AS n
        |  FROM u2e GROUP BY 1, 2, 3),
        |c2 AS (SELECT s, code,
        |    list(CAST(sm AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cent
        |  FROM u2 GROUP BY 1, 2),
        |cb2 AS (SELECT cb1.s, cb1.code, coalesce(c2.cent, cb1.cent) AS cent
        |  FROM cb1 LEFT JOIN c2 ON cb1.s = c2.s AND cb1.code = c2.code),
        |cr AS (SELECT a.vec_id, a.cell,
        |    list_transform(range(1, 65), i -> e.v[i] - piv.pv[i]) AS rv
        |  FROM acell a JOIN emb e USING (vec_id) JOIN piv ON a.cell = piv.pid),
        |dsv AS (SELECT c0.vec_id, ss.s, c0.rv[ss.s*8+1 : ss.s*8+8] AS sv
        |  FROM cr c0, ss),
        |cnd AS (SELECT d.vec_id, d.s, cb2.code,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (d.sv[i] - cb2.cent[i]) * (d.sv[i] - cb2.cent[i]))), 6) AS dd
        |  FROM dsv d JOIN cb2 ON d.s = cb2.s),
        |enc AS (SELECT vec_id, s, code FROM cnd
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, code) = 1),
        |qcell AS (SELECT e.vec_id AS qid, piv.pid AS cell,
        |    round(list_sum(list_transform(range(1, 65),
        |      i -> (e.v[i] - piv.pv[i]) * (e.v[i] - piv.pv[i]))), 6) AS dd
        |  FROM emb e, piv WHERE e.vec_id < 10
        |  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dd, pid) <= 4),
        |cpair AS (SELECT q.qid, a.vec_id AS neighbor_id, a.cell
        |  FROM acell a JOIN qcell q ON a.cell = q.cell
        |  WHERE a.vec_id <> q.qid),
        |qr AS (SELECT q.qid, q.cell,
        |    list_transform(range(1, 65), i -> e.v[i] - piv.pv[i]) AS rv
        |  FROM qcell q JOIN emb e ON q.qid = e.vec_id JOIN piv ON q.cell = piv.pid),
        |qs AS (SELECT q0.qid, q0.cell, ss.s, q0.rv[ss.s*8+1 : ss.s*8+8] AS qsv
        |  FROM qr q0, ss),
        |pair AS (SELECT cp.qid, cp.neighbor_id, en.s,
        |    list_sum(list_transform(range(1, 9),
        |      i -> (qs.qsv[i] - cb2.cent[i]) * (qs.qsv[i] - cb2.cent[i]))) AS dsub
        |  FROM cpair cp
        |    JOIN enc en ON en.vec_id = cp.neighbor_id
        |    JOIN cb2 ON en.s = cb2.s AND en.code = cb2.code
        |    JOIN qs ON qs.qid = cp.qid AND qs.cell = cp.cell AND qs.s = en.s),
        |dist AS (SELECT qid, neighbor_id,
        |    round(list_sum(list(dsub ORDER BY s)), 6) AS adc_dist
        |  FROM pair GROUP BY 1, 2),
        |r AS (SELECT qid, neighbor_id, adc_dist,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY adc_dist, neighbor_id) AS INT) AS "rank"
        |  FROM dist)
        |SELECT qid, neighbor_id, adc_dist, "rank" FROM r
        |WHERE "rank" <= 5
        |ORDER BY qid, "rank"""".stripMargin

  /** q103's full PQ replay (first-K seed, two fixed-point Lloyd
    * iterations, encode, ADC rank) parameterized by the `emb` CTE body
    * — q136 reuses the whole chain over OPQ-permuted vectors. */
  private def pqTopkReplaySql(embBody: String): String =
    s"""WITH emb AS (${embBody}),
        |ss AS (SELECT unnest(range(0, 8)) AS s),
        |tsv AS (SELECT e.vec_id, ss.s, e.v[ss.s*8+1 : ss.s*8+8] AS sv
        |  FROM emb e, ss WHERE e.vec_id < 64),
        |cb0 AS (SELECT s, sv, min(vec_id) AS mid FROM tsv GROUP BY 1, 2),
        |cbk AS (SELECT s, sv AS cent,
        |    row_number() OVER (PARTITION BY s ORDER BY mid) - 1 AS code
        |  FROM cb0 QUALIFY code < 16),
        |a1 AS (SELECT t.vec_id, t.s, t.sv, cbk.code,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (t.sv[i] - cbk.cent[i]) * (t.sv[i] - cbk.cent[i]))), 6) AS dd
        |  FROM tsv t JOIN cbk ON t.s = cbk.s
        |  QUALIFY row_number() OVER (PARTITION BY t.vec_id, t.s
        |    ORDER BY dd, cbk.code) = 1),
        |u1e AS (SELECT s, code, sv, unnest(range(1, 9)) AS i FROM a1),
        |u1 AS (SELECT s, code, i,
        |    sum(CAST(floor(sv[i] * 1000000) AS BIGINT)) AS sm, count(*) AS n
        |  FROM u1e GROUP BY 1, 2, 3),
        |c1 AS (SELECT s, code,
        |    list(CAST(sm AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cent
        |  FROM u1 GROUP BY 1, 2),
        |cb1 AS (SELECT cbk.s, cbk.code, coalesce(c1.cent, cbk.cent) AS cent
        |  FROM cbk LEFT JOIN c1 ON cbk.s = c1.s AND cbk.code = c1.code),
        |a2 AS (SELECT t.vec_id, t.s, t.sv, cb1.code,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (t.sv[i] - cb1.cent[i]) * (t.sv[i] - cb1.cent[i]))), 6) AS dd
        |  FROM tsv t JOIN cb1 ON t.s = cb1.s
        |  QUALIFY row_number() OVER (PARTITION BY t.vec_id, t.s
        |    ORDER BY dd, cb1.code) = 1),
        |u2e AS (SELECT s, code, sv, unnest(range(1, 9)) AS i FROM a2),
        |u2 AS (SELECT s, code, i,
        |    sum(CAST(floor(sv[i] * 1000000) AS BIGINT)) AS sm, count(*) AS n
        |  FROM u2e GROUP BY 1, 2, 3),
        |c2 AS (SELECT s, code,
        |    list(CAST(sm AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cent
        |  FROM u2 GROUP BY 1, 2),
        |cb2 AS (SELECT cb1.s, cb1.code, coalesce(c2.cent, cb1.cent) AS cent
        |  FROM cb1 LEFT JOIN c2 ON cb1.s = c2.s AND cb1.code = c2.code),
        |dsv AS (SELECT e.vec_id, ss.s, e.v[ss.s*8+1 : ss.s*8+8] AS sv
        |  FROM emb e, ss),
        |cand AS (SELECT d.vec_id, d.s, cb2.code,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (d.sv[i] - cb2.cent[i]) * (d.sv[i] - cb2.cent[i]))), 6) AS dd
        |  FROM dsv d JOIN cb2 ON d.s = cb2.s),
        |enc AS (SELECT vec_id, s, code FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dd, code) = 1),
        |qs AS (SELECT e.vec_id AS qid, ss.s, e.v[ss.s*8+1 : ss.s*8+8] AS qsv
        |  FROM emb e, ss WHERE e.vec_id < 10),
        |pair AS (SELECT qs.qid, en.vec_id AS neighbor_id, en.s,
        |    list_sum(list_transform(range(1, 9),
        |      i -> (qs.qsv[i] - cb2.cent[i]) * (qs.qsv[i] - cb2.cent[i]))) AS dsub
        |  FROM enc en JOIN cb2 ON en.s = cb2.s AND en.code = cb2.code
        |    JOIN qs ON qs.s = en.s
        |  WHERE en.vec_id <> qs.qid),
        |dist AS (SELECT qid, neighbor_id,
        |    round(list_sum(list(dsub ORDER BY s)), 6) AS adc_dist
        |  FROM pair GROUP BY 1, 2),
        |r AS (SELECT qid, neighbor_id, adc_dist,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY adc_dist, neighbor_id) AS INT) AS "rank"
        |  FROM dist)
        |SELECT qid, neighbor_id, adc_dist, "rank" FROM r
        |WHERE "rank" <= 5
        |ORDER BY qid, "rank"""".stripMargin

  private def semanticDedupSql: String =
    """WITH RECURSIVE pb AS (SELECT vec_id AS oid, embedding AS emb FROM embeddings),
      |pl AS (SELECT oid + 1000000 AS vec_id,
      |  list_transform(range(0, 64), d -> CAST(CAST(emb[d+1] AS DOUBLE) +
      |    CAST(0.01 AS DOUBLE) * CAST((oid*131 + d*7919) % 1000003
      |      * 2654435761 % 2000003 - 1000001 AS DOUBLE)
      |    / CAST(1000001.0 AS DOUBLE) AS REAL)) AS embedding
      |  FROM pb),
      |corpus AS (SELECT vec_id, embedding FROM embeddings
      |           UNION ALL SELECT vec_id, embedding FROM pl),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM corpus),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
      |      FROM e),
      |piv AS (SELECT vec_id AS pid, v AS pv, nrm AS pnrm FROM n
      |        ORDER BY vec_id LIMIT 16),
      |asg AS (SELECT c.vec_id AS id, c.v, c.nrm, pid,
      |    ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
      |      round(list_sum(list_transform(range(1, 65),
      |        k -> c.v[k]*pv[k])) / (c.nrm*pnrm), 6) DESC, pid) AS rn
      |  FROM n c CROSS JOIN piv),
      |cells AS (SELECT id, v, nrm, pid AS cell FROM asg WHERE rn = 1),
      |j AS (SELECT a.id AS id1, b.id AS id2
      |      FROM cells a JOIN cells b ON a.cell = b.cell AND a.id < b.id
      |      WHERE round(list_sum(list_transform(range(1, 65),
      |        k -> a.v[k]*b.v[k])) / (a.nrm*b.nrm), 6) >= 0.95),
      |ed AS (SELECT id1, id2 FROM j UNION ALL SELECT id2, id1 FROM j),
      |nodes AS (SELECT DISTINCT id1 AS id FROM ed),
      |reach(id, x) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT reach.id, ed.id2 FROM reach JOIN ed ON reach.x = ed.id1),
      |cl AS (SELECT id, min(x) AS cluster FROM reach GROUP BY id),
      |drops AS (SELECT id FROM cl WHERE cluster < id)
      |SELECT vec_id FROM corpus
      |WHERE vec_id NOT IN (SELECT id FROM drops)
      |ORDER BY vec_id""".stripMargin

  /** Brute-force cosine pairs at 0.95 over the corpus with planted near-dups
    * — mirrors Similarity.plantNearDups exactly: integer LCG in [-1e6, 1e6]
    * scaled to [-1, 1], double arithmetic, one float round-trip. */
  private def lshPairsOracleSql: String =
    s"""WITH pb AS (SELECT vec_id AS oid, embedding AS emb FROM embeddings),
       |pv AS (SELECT oid + 1000000 AS vec_id,
       |  list_transform(range(0, 64), d -> CAST(CAST(emb[d+1] AS DOUBLE) +
       |    CAST(0.01 AS DOUBLE) * CAST((oid*131 + d*7919) % 1000003
       |      * 2654435761 % 2000003 - 1000001 AS DOUBLE)
       |    / CAST(1000001.0 AS DOUBLE) AS REAL)) AS embedding
       |  FROM pb),
       |corpus AS (SELECT vec_id, embedding FROM embeddings
       |           UNION ALL SELECT vec_id, embedding FROM pv),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM corpus),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm
       |      FROM e),
       |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
       |        round(list_sum(list_transform(range(1, 65),
       |          k -> a.v[k]*b.v[k])) / (a.nrm*b.nrm), 6) AS cos_sim
       |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |SELECT id1, id2, cos_sim FROM p WHERE cos_sim >= 0.95
       |ORDER BY id1, id2""".stripMargin

  // ---- dynamic oracles for the two iterative trainers -------------------
  // Built at Verify's SQL-dump time — AFTER the queries ran — from the
  // trained artifacts the queries froze through OracleAux, so the emitted
  // SQL is fully self-contained (weights/merges embedded as literals) by
  // the time DuckDB executes it. Absent artifacts (a dev subset run that
  // skipped the query) simply omit the entry — the driver then records the
  // weaker rows-only check instead of failing the whole dump.

  /** Names whose oracle SQL exists only AFTER the query has frozen its
    * trained artifacts through [[OracleAux]]. In a fresh JVM (EntrySpec)
    * these keys are legitimately absent from `oracleSql`; the driver always
    * receives them because Verify dumps the SQL after running every query.
    * Kept as a static set so the contract spec is deterministic instead of
    * depending on which suite happened to run the trainer first. */
  val dynamicOracleNames: Set[String] = Set(
    "q111_quality_classifier", "q123_bpe_train", "q136_opq_pq_topk",
    "q140_pca_project", "q144_unigram_tokenize", "q146_clf_calibration",
    "q148_tokenizer_fertility", "q173_wordpiece_train")

  /** Oracle entries whose SQL depends on what the query run just trained. */
  def dynamicOracle: Map[String, String] =
    scala.util.Try {
      q111OracleSql.map("q111_quality_classifier" -> _).toMap ++
        q123OracleSql.map("q123_bpe_train" -> _).toMap ++
        q136OracleSql.map("q136_opq_pq_topk" -> _).toMap ++
        q140OracleSql.map("q140_pca_project" -> _).toMap ++
        q144OracleSql.map("q144_unigram_tokenize" -> _).toMap ++
        q146OracleSql.map("q146_clf_calibration" -> _).toMap ++
        q148OracleSql.map("q148_tokenizer_fertility" -> _).toMap ++
        q173OracleSql.map("q173_wordpiece_train" -> _).toMap
    }.getOrElse(Map.empty)

  /** q148's oracle: the q91 merge-chain BPE replay (b-prefixed CTEs) and
    * the q144 recursive-CTE Viterbi under the FROZEN q148 unigram model,
    * composed into per-source word/char/token sums and the fertility
    * ratios — identical double divisions of the same exact longs. */
  private def q148OracleSql: Option[String] =
    OracleAux.read("q148_model").map { lines =>
      val entries = lines.filter(_.nonEmpty).map { l =>
        val i = l.indexOf(' ')
        val sc = l.substring(0, i)
        val piece = l.substring(i + 1).replace("'", "''")
        s"('$piece', CAST($sc AS BIGINT))"
      }.mkString(", ")
      val pat = graft.ext.TextStats.BpePattern.replace("'", "''")
      val unk = graft.ext.Unigram.UnkScore
      s"""WITH RECURSIVE
         |model(piece, s) AS (VALUES $entries),
         |base AS (SELECT doc_id, source, text,
         |    regexp_extract_all(coalesce(text, ''), '$pat') AS pts
         |  FROM documents),
         |e AS (SELECT doc_id, pts, unnest(range(1, len(pts)+1)) AS i FROM base),
         |tok AS (SELECT doc_id, i, pts[i] AS w FROM e
         |  WHERE NOT regexp_matches(pts[i], '^\\s+$$')),
         |ws AS (SELECT DISTINCT w FROM tok),
         |wst AS (SELECT w, unnest(range(0, length(w))) AS st FROM ws),
         |cand AS (SELECT w, st, l.range AS ln,
         |    substr(w, st + 1, l.range) AS piece
         |  FROM wst CROSS JOIN range(1, 5) l
         |  WHERE st + l.range <= length(w)),
         |edges0 AS (SELECT c.w, c.st, c.st + c.ln AS en,
         |    coalesce(m.s, CASE WHEN c.ln = 1 THEN CAST($unk AS BIGINT) END) AS sc
         |  FROM cand c LEFT JOIN model m ON c.piece = m.piece
         |  WHERE m.s IS NOT NULL OR c.ln = 1),
         |elist AS (SELECT w, list({'en': en, 'st': st, 'sc': sc}
         |      ORDER BY en, st) AS edges
         |  FROM edges0 GROUP BY 1),
         |dp AS (
         |  SELECT w, edges, 0 AS k, [CAST(0 AS BIGINT)] AS sc,
         |    [CAST(-1 AS INT)] AS bk, CAST(length(w) AS INT) AS len FROM elist
         |  UNION ALL
         |  SELECT w, edges, k + 1,
         |    list_append(sc, struct_extract(best, 'c')),
         |    list_append(bk, CAST(-struct_extract(best, 'ns') AS INT)), len
         |  FROM (
         |    SELECT *, list_aggregate(list_filter(
         |        list_transform(list_filter(edges, e -> e.en = k + 1),
         |          e -> {'c': sc[e.st + 1] + e.sc, 'ns': -e.st}),
         |        x -> struct_extract(x, 'c') IS NOT NULL), 'max') AS best
         |    FROM dp) WHERE k < len),
         |fin AS (SELECT w, bk, len FROM dp WHERE k = len),
         |bt AS (
         |  SELECT w, bk, len AS pos, CAST(0 AS BIGINT) AS np FROM fin
         |  UNION ALL
         |  SELECT w, bk, bk[pos + 1] AS pos, np + 1
         |  FROM bt WHERE pos > 0),
         |useg AS (SELECT w, np FROM bt WHERE pos = 0),
         |ucount AS (SELECT tok.doc_id, sum(useg.np) AS uni
         |  FROM tok JOIN useg ON tok.w = useg.w GROUP BY 1),
         |bwr AS (SELECT doc_id, i,
         |    regexp_replace(w, '(?s)(.)', chr(31)||'\\1'||chr(31), 'g') AS s0
         |  FROM tok),
         |bmg AS (SELECT doc_id, i,
         |    string_split(trim(${q91MergedExpr("s0")}, chr(31)),
         |      chr(31)||chr(31)) AS tl
         |  FROM bwr),
         |bcount AS (SELECT doc_id, sum(len(tl)) AS bpe FROM bmg GROUP BY 1),
         |wcount AS (SELECT doc_id, count(*) AS words FROM tok GROUP BY 1),
         |per AS (SELECT b.doc_id, b.source,
         |    length(coalesce(b.text, '')) AS chars,
         |    coalesce(wcount.words, 0) AS words,
         |    coalesce(bcount.bpe, 0) AS bpe,
         |    coalesce(ucount.uni, 0) AS uni
         |  FROM base b
         |  LEFT JOIN wcount ON b.doc_id = wcount.doc_id
         |  LEFT JOIN bcount ON b.doc_id = bcount.doc_id
         |  LEFT JOIN ucount ON b.doc_id = ucount.doc_id),
         |agg AS (SELECT source, count(*) AS docs,
         |    CAST(sum(words) AS BIGINT) AS words,
         |    CAST(sum(chars) AS BIGINT) AS chars,
         |    CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
         |    CAST(sum(uni) AS BIGINT) AS uni_pieces
         |  FROM per GROUP BY 1)
         |SELECT source, CAST(docs AS BIGINT) AS docs, words, chars,
         |  bpe_tokens, uni_pieces,
         |  CAST(bpe_tokens AS DOUBLE) / CAST(words AS DOUBLE) AS bpe_per_word,
         |  CAST(uni_pieces AS DOUBLE) / CAST(words AS DOUBLE) AS uni_per_word,
         |  CAST(chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE) AS chars_per_bpe,
         |  CAST(chars AS DOUBLE) / CAST(uni_pieces AS DOUBLE) AS chars_per_uni
         |FROM agg ORDER BY source""".stripMargin
    }

  /** q146's oracle: q111's frozen-model scoring replay scoped to the
    * held-out slice (doc_id % 4 = 2), labels from the q87 quality-points
    * fragment (== 10), then the binning arithmetic — exact integer
    * micro-prob sums, identical double divisions. */
  private def q146OracleSql: Option[String] =
    OracleAux.readModel("q146_model").map { case (bias, ws0) =>
      val ws = if (ws0.isEmpty) Seq((0, 0.0)) else ws0
      val values = ws.map { case (b, w) => s"($b, $w)" }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, $docToksC AS toks FROM documents
         |  WHERE doc_id % 4 = 2),
         |lb AS (SELECT doc_id, CASE WHEN
         |    (CASE WHEN len(toks) BETWEEN 30 AND 500 THEN 5 ELSE 0 END)
         |  + (CASE WHEN CAST(len(list_filter(toks, x -> list_contains(
         |      ['the','and','of','to','a','is','in','for','on','with'], x))) AS DOUBLE)
         |      / len(toks) >= 0.05 THEN 3 ELSE 0 END)
         |  + (CASE WHEN CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
         |      / length(text) <= 0.1 THEN 2 ELSE 0 END) = 10
         |    THEN 1 ELSE 0 END AS label FROM t),
         |g AS (SELECT doc_id, list_concat(toks,
         |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
         |      i -> concat_ws(' ', toks[i], toks[i+1])) ELSE [] END) AS grams
         |  FROM t),
         |bk AS (SELECT doc_id, len(grams) AS n, list_transform(grams, x ->
         |    CAST(CAST(('0x' || substr(md5(x || ':graft:clf'), 1, 8)) AS BIGINT)
         |      % 4096 AS INT)) AS bks FROM g),
         |e AS (SELECT doc_id, n, unnest(bks) AS bucket FROM bk),
         |c AS (SELECT doc_id, n, bucket, count(*) AS cnt FROM e
         |  GROUP BY 1, 2, 3),
         |w(bucket, wt) AS (VALUES $values),
         |m AS (SELECT c.doc_id,
         |    sum(CAST((CAST(c.cnt AS DOUBLE) / CAST(c.n AS DOUBLE))
         |      * coalesce(w.wt, 0.0) AS DECIMAL(38,18))) AS mm
         |  FROM c LEFT JOIN w USING (bucket) GROUP BY 1),
         |pr AS (SELECT m.doc_id,
         |    round(1.0 / (1.0 + exp(-(CAST(mm AS DOUBLE) + ($bias)))), 6)
         |      AS clf_prob
         |  FROM m),
         |bn AS (SELECT pr.doc_id, least(CAST(floor(clf_prob * 10) AS INT), 9)
         |    AS bin, clf_prob, lb.label
         |  FROM pr JOIN lb ON pr.doc_id = lb.doc_id),
         |a AS (SELECT bin, count(*) AS n,
         |    sum(CAST(round(clf_prob * 1e6) AS BIGINT)) AS pm,
         |    sum(CAST(label AS BIGINT)) AS pos
         |  FROM bn GROUP BY 1)
         |SELECT bin, CAST(n AS BIGINT) AS n,
         |  CAST(pm AS DOUBLE) / CAST(n AS DOUBLE) / 1e6 AS mean_prob,
         |  CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
         |  (CAST(pm AS DOUBLE) / CAST(n AS DOUBLE) / 1e6)
         |    - (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) AS cal_gap
         |FROM a ORDER BY bin""".stripMargin
    }

  /** q144's oracle: the FROZEN unigram model (pieces + integer micro-nat
    * scores as a VALUES list) replayed over the whole corpus — candidate
    * substrings lateral-generated per DISTINCT word, UNK single chars
    * coalesced to the engine's constant, the Viterbi forward pass as a
    * recursive CTE carrying exact-integer score/backpointer lists (struct
    * max = (cand desc, start asc), NULL-filtered so unreachable states
    * never win), a recursive backtrace, and ordered per-document
    * reassembly. Integer scores end-to-end: a single flipped tie anywhere
    * changes a row and fails the driver compare. */
  private def q144OracleSql: Option[String] =
    OracleAux.read("q144_model").map { lines =>
      val entries = lines.filter(_.nonEmpty).map { l =>
        val i = l.indexOf(' ')
        val sc = l.substring(0, i)
        val piece = l.substring(i + 1).replace("'", "''")
        s"('$piece', CAST($sc AS BIGINT))"
      }.mkString(", ")
      val pat = graft.ext.TextStats.BpePattern.replace("'", "''")
      val unk = graft.ext.Unigram.UnkScore
      s"""WITH RECURSIVE
         |model(piece, s) AS (VALUES $entries),
         |base AS (SELECT doc_id, regexp_extract_all(coalesce(text, ''), '$pat') AS pts
         |  FROM documents),
         |e AS (SELECT doc_id, pts, unnest(range(1, len(pts)+1)) AS i FROM base),
         |tok AS (SELECT doc_id, i, pts[i] AS w FROM e
         |  WHERE NOT regexp_matches(pts[i], '^\\s+$$')),
         |ws AS (SELECT DISTINCT w FROM tok),
         |wst AS (SELECT w, unnest(range(0, length(w))) AS st FROM ws),
         |cand AS (SELECT w, st, l.range AS ln,
         |    substr(w, st + 1, l.range) AS piece
         |  FROM wst CROSS JOIN range(1, 5) l
         |  WHERE st + l.range <= length(w)),
         |edges0 AS (SELECT c.w, c.st, c.st + c.ln AS en,
         |    coalesce(m.s, CASE WHEN c.ln = 1 THEN CAST($unk AS BIGINT) END) AS sc
         |  FROM cand c LEFT JOIN model m ON c.piece = m.piece
         |  WHERE m.s IS NOT NULL OR c.ln = 1),
         |elist AS (SELECT w, list({'en': en, 'st': st, 'sc': sc}
         |      ORDER BY en, st) AS edges
         |  FROM edges0 GROUP BY 1),
         |dp AS (
         |  SELECT w, edges, 0 AS k, [CAST(0 AS BIGINT)] AS sc,
         |    [CAST(-1 AS INT)] AS bk, CAST(length(w) AS INT) AS len FROM elist
         |  UNION ALL
         |  SELECT w, edges, k + 1,
         |    list_append(sc, struct_extract(best, 'c')),
         |    list_append(bk, CAST(-struct_extract(best, 'ns') AS INT)), len
         |  FROM (
         |    SELECT *, list_aggregate(list_filter(
         |        list_transform(list_filter(edges, e -> e.en = k + 1),
         |          e -> {'c': sc[e.st + 1] + e.sc, 'ns': -e.st}),
         |        x -> struct_extract(x, 'c') IS NOT NULL), 'max') AS best
         |    FROM dp) WHERE k < len),
         |fin AS (SELECT w, bk, len FROM dp WHERE k = len),
         |bt AS (
         |  SELECT w, bk, len AS pos, CAST([] AS VARCHAR[]) AS ps FROM fin
         |  UNION ALL
         |  SELECT w, bk, bk[pos + 1] AS pos,
         |    list_prepend(substr(w, bk[pos + 1] + 1, pos - bk[pos + 1]), ps)
         |  FROM bt WHERE pos > 0),
         |seg AS (SELECT w, ps FROM bt WHERE pos = 0),
         |f AS (SELECT tok.doc_id, flatten(list(seg.ps ORDER BY tok.i)) AS toks
         |  FROM tok JOIN seg ON tok.w = seg.w GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(len(f.toks), 0) AS INT) AS uni_count,
         |  coalesce(array_to_string(f.toks, chr(31)), '') AS uni_str
         |FROM documents d LEFT JOIN f USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }

  /** q140's oracle: the FROZEN PCA model (mean + components) embedded as
    * literal lists; every projection value recomputed as the identical
    * in-dimension-order centered dot, rounded 6 dp. */
  private def q140OracleSql: Option[String] =
    OracleAux.read("q140_pca").map { lines =>
      def dl(s: String) = s.trim.split(" ").mkString("[", ", ", "]")
      val mu = dl(lines.head)
      val cl = lines.tail.filter(_.nonEmpty).map(dl).mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |p AS (SELECT vec_id, unnest(range(0, ${lines.tail.count(_.nonEmpty)}))
         |    AS comp, v FROM e)
         |SELECT vec_id, CAST(comp AS INT) AS comp,
         |  round(list_sum(list_transform(range(1, 65),
         |    d -> (v[d] - ($mu)[d]) * ($cl)[comp+1][d])), 6) AS y
         |FROM p ORDER BY vec_id, comp""".stripMargin
    }

  /** q136's oracle: the frozen OPQ permutation (64 1-based indices
    * embedded as a literal list) applied inside the `emb` CTE, then
    * q103's entire PQ replay unchanged — training, encode, and ADC all
    * run in the permuted basis exactly as the engine does. */
  private def q136OracleSql: Option[String] =
    OracleAux.read("q136_perm").map { lines =>
      val idx = lines.filter(_.nonEmpty).map(l => (l.trim.toInt + 1).toString)
        .mkString("[", ", ", "]")
      pqTopkReplaySql(
        s"""SELECT vec_id, list_transform($idx, p -> v0[p]) AS v
           |  FROM (SELECT vec_id, list_transform(embedding,
           |    x -> CAST(x AS DOUBLE)) AS v0 FROM embeddings)""".stripMargin)
    }

  /** q111's scoring pass replayed in full against the FROZEN trained model:
    * tokenize → hashed uni+bigram buckets (q93's md5 arithmetic, salt
    * "graft:clf", B = 4096) → per-(doc, bucket) L1-normalized counts → dot
    * product with the embedded weight table summed as DECIMAL(38,18)
    * (exact, order-free — mirroring Classifier's determinism discipline) →
    * sigmoid with the embedded bias, 6 dp. Zero-weight buckets are omitted
    * from the VALUES list (their terms are exactly 0 on both engines). */
  private def q111OracleSql: Option[String] =
    OracleAux.readModel("q111_model").map { case (bias, ws0) =>
      val ws = if (ws0.isEmpty) Seq((0, 0.0)) else ws0
      val values = ws.map { case (b, w) => s"($b, $w)" }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, lang, $docToksC AS toks FROM documents),
         |g AS (SELECT doc_id, lang, list_concat(toks,
         |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
         |      i -> concat_ws(' ', toks[i], toks[i+1])) ELSE [] END) AS grams
         |  FROM t),
         |bk AS (SELECT doc_id, lang, len(grams) AS n, list_transform(grams, x ->
         |    CAST(CAST(('0x' || substr(md5(x || ':graft:clf'), 1, 8)) AS BIGINT)
         |      % 4096 AS INT)) AS bks FROM g),
         |e AS (SELECT doc_id, lang, n, unnest(bks) AS bucket FROM bk),
         |c AS (SELECT doc_id, lang, n, bucket, count(*) AS cnt FROM e
         |  GROUP BY 1, 2, 3, 4),
         |w(bucket, wt) AS (VALUES $values),
         |m AS (SELECT c.doc_id, c.lang,
         |    sum(CAST((CAST(c.cnt AS DOUBLE) / CAST(c.n AS DOUBLE))
         |      * coalesce(w.wt, 0.0) AS DECIMAL(38,18))) AS mm
         |  FROM c LEFT JOIN w USING (bucket) GROUP BY 1, 2),
         |p AS (SELECT doc_id, lang,
         |    round(1.0 / (1.0 + exp(-(CAST(mm AS DOUBLE) + ($bias)))), 6)
         |      AS clf_prob
         |  FROM m)
         |SELECT doc_id, lang, clf_prob, clf_prob >= 0.5 AS clf_keep
         |FROM p ORDER BY doc_id""".stripMargin
    }

  /** q123's oracle, built from the FROZEN learned merges: replays the
    * corpus tokenization with the full merge chain (q91's ␟-wrapped
    * replace-pass machinery) AND inductively re-derives the training loop —
    * for every rank k it recomputes the capped word-frequency table from
    * scratch, applies merges 1..k−1, recounts frequency-weighted adjacent
    * symbol pairs (whitespace-bearing symbols excluded, the mergeable()
    * rule), and checks the argmax under (count desc, left, right) with the
    * minPairCount ≥ 2 floor equals merge k exactly; if training stopped
    * early it additionally checks no further merge was possible. All checks
    * GATE the output rows (WHERE ok), so a single deviated selection
    * empties the oracle and fails the driver's row compare. */
  /** q173's oracle: inductive WordPiece-training replay + greedy
    * tokenization under the frozen vocabulary. Per rank k the SQL
    * rebuilds the capped word table from scratch, applies merges 1..k-1
    * as rank-order replace passes over ␟-wrapped [c1, ##c2, ...] rep
    * strings, recounts pairs and symbols, and re-derives the selection as
    * the score-dominance survivor — s beats r when
    * `s.c·r.ca·r.cb > r.c·s.ca·s.cb` (HUGEINT, exact) or on the
    * lexicographic (a, b) tie — restricted to pairs with count >=
    * minPairCount; on early stop one extra rank must produce NO
    * candidate. All selections gate the output rows. */
  private def q173OracleSql: Option[String] =
    for {
      mergeLines <- OracleAux.read("q173_merges")
      vocab <- OracleAux.read("q173_vocab")
    } yield {
      val merges = mergeLines.filter(_.nonEmpty).map { l =>
        val i = l.indexOf(' '); (l.substring(0, i), l.substring(i + 1))
      }
      val numMerges = TrainNumMerges
      def sq(x: String) = x.replace("'", "''")
      def strip(x: String) = if (x.startsWith("##")) x.substring(2) else x
      def wpMergedExpr(src: String, k: Int): String =
        merges.take(k).foldLeft(src) { case (acc, (a, b)) =>
          s"replace($acc, chr(31)||'${sq(a)}'||chr(31)||chr(31)||'${sq(b)}'||chr(31), " +
            s"chr(31)||'${sq(a + strip(b))}'||chr(31))"
        }
      val ranks = merges.indices.map(_ + 1) ++
        (if (merges.length < numMerges) Seq(merges.length + 1) else Nil)
      val rankCtes = ranks.map { k =>
        s"""s$k AS (SELECT string_split(trim(${wpMergedExpr("s0", k - 1)}, chr(31)),
           |    chr(31)||chr(31)) AS syms, n FROM wr0),
           |e$k AS (SELECT syms, n, unnest(range(1, len(syms))) AS i FROM s$k),
           |p$k AS (SELECT syms[i] AS a, syms[i+1] AS b, sum(n) AS c FROM e$k
           |  GROUP BY 1, 2),
           |y$k AS (SELECT sym, sum(cn) AS sc FROM (
           |    SELECT unnest(syms) AS sym, n AS cn FROM s$k) u$k GROUP BY 1),
           |sc$k AS (SELECT p.a, p.b, p.c, ya.sc AS ca, yb.sc AS cb
           |  FROM p$k p JOIN y$k ya ON p.a = ya.sym
           |    JOIN y$k yb ON p.b = yb.sym
           |  WHERE p.c >= $Q173MinPairCount),
           |m$k AS (SELECT a || ' ' || b AS mrg FROM sc$k r
           |  WHERE NOT EXISTS (SELECT 1 FROM sc$k s WHERE
           |    CAST(s.c AS HUGEINT) * r.ca * r.cb
           |      > CAST(r.c AS HUGEINT) * s.ca * s.cb
           |    OR (CAST(s.c AS HUGEINT) * r.ca * r.cb
           |          = CAST(r.c AS HUGEINT) * s.ca * s.cb
           |        AND (s.a < r.a OR (s.a = r.a AND s.b < r.b)))))""".stripMargin
      }.mkString(",\n")
      val checks = merges.zipWithIndex.map { case ((a, b), i) =>
        s"coalesce((SELECT mrg FROM m${i + 1}) = '${sq(s"$a $b")}', FALSE)"
      } ++ (if (merges.length < numMerges)
        Seq(s"(SELECT count(*) FROM m${merges.length + 1}) = 0") else Nil)
      val ok = if (checks.isEmpty) "TRUE" else checks.mkString("\n  AND ")
      val trainCtes =
        s"""wt AS (SELECT w, count(*) AS n FROM (
           |    SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
           |      '\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]')) AS w
           |    FROM documents) u0
           |  GROUP BY 1
           |  QUALIFY row_number() OVER (ORDER BY n DESC, w) <= $TrainMaxWords),
           |wr0 AS (SELECT chr(31) || w[1] || chr(31) ||
           |    coalesce(array_to_string(list_transform(
           |      range(2, len(w) + 1),
           |      i -> chr(31) || '##' || w[CAST(i AS INT)] || chr(31)), ''), '')
           |      AS s0, n
           |  FROM wt),
           |$rankCtes,
           |chk AS (SELECT $ok AS ok),
           |""".stripMargin
      wpGreedySql(
        vocab.map(v => s"'${sq(v)}'").mkString("[", ", ", "]"),
        "lower(coalesce(text, ''))",
        extraCtes = trainCtes,
        gateExpr = "(SELECT ok FROM chk)")
    }

  private def q123OracleSql: Option[String] =
    OracleAux.read("q123_merges").map { lines =>
      val merges = lines.filter(_.nonEmpty).map { l =>
        val i = l.indexOf(' '); (l.substring(0, i), l.substring(i + 1))
      }
      val numMerges = TrainNumMerges
      def sq(s: String) = s.replace("'", "''")
      def mergedExpr(src: String, k: Int): String =
        merges.take(k).foldLeft(src) { case (acc, (a, b)) =>
          s"replace($acc, chr(31)||'${sq(a)}'||chr(31)||chr(31)||'${sq(b)}'||chr(31), " +
            s"chr(31)||'${sq(a + b)}'||chr(31))"
        }
      val pat = graft.ext.TextStats.BpePattern.replace("'", "''")
      // ranks to re-derive: every learned merge, plus (on early stop) one
      // extra rank that must find NO admissible pair
      val ranks = merges.indices.map(_ + 1) ++
        (if (merges.length < numMerges) Seq(merges.length + 1) else Nil)
      val rankCtes = ranks.map { k =>
        s"""s$k AS (SELECT string_split(trim(${mergedExpr("s0", k - 1)}, chr(31)),
           |    chr(31)||chr(31)) AS syms, n FROM wr0),
           |e$k AS (SELECT syms, n, unnest(range(1, len(syms))) AS i FROM s$k),
           |p$k AS (SELECT syms[i] AS a, syms[i+1] AS b, sum(n) AS c FROM e$k
           |  WHERE NOT regexp_matches(syms[i], '\\s')
           |    AND NOT regexp_matches(syms[i+1], '\\s')
           |  GROUP BY 1, 2),
           |m$k AS (SELECT a || ' ' || b AS mrg FROM p$k WHERE c >= 2
           |  ORDER BY c DESC, a, b LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val checks = merges.zipWithIndex.map { case ((a, b), i) =>
        s"coalesce((SELECT mrg FROM m${i + 1}) = '${sq(s"$a $b")}', FALSE)"
      } ++ (if (merges.length < numMerges)
        Seq(s"(SELECT count(*) FROM m${merges.length + 1}) = 0") else Nil)
      val ok = if (checks.isEmpty) "TRUE" else checks.mkString("\n  AND ")
      s"""WITH base AS (SELECT doc_id,
         |    regexp_extract_all(coalesce(text, ''), '$pat') AS pts
         |  FROM documents),
         |wt AS (SELECT w, count(*) AS n FROM (
         |    SELECT unnest(pts) AS w FROM base) u
         |  WHERE NOT regexp_matches(w, '^\\s+$$')
         |  GROUP BY 1
         |  QUALIFY row_number() OVER (ORDER BY n DESC, w) <= $TrainMaxWords),
         |wr0 AS (SELECT regexp_replace(w, '(?s)(.)',
         |    chr(31)||'\\1'||chr(31), 'g') AS s0, n FROM wt),
         |$rankCtes,
         |chk AS (SELECT $ok AS ok),
         |we AS (SELECT doc_id, pts, unnest(range(1, len(pts)+1)) AS i FROM base),
         |w2 AS (SELECT doc_id, i, pts[i] AS pt FROM we
         |  WHERE NOT regexp_matches(pts[i], '^\\s+$$')),
         |wr AS (SELECT doc_id, i,
         |    regexp_replace(pt, '(?s)(.)', chr(31)||'\\1'||chr(31), 'g') AS s0
         |  FROM w2),
         |mg AS (SELECT doc_id, i,
         |    string_split(trim(${mergedExpr("s0", merges.length)}, chr(31)),
         |      chr(31)||chr(31)) AS tl
         |  FROM wr),
         |f AS (SELECT doc_id, flatten(list(tl ORDER BY i)) AS toks
         |  FROM mg GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(len(f.toks), 0) AS INT) AS bpe_count,
         |  coalesce(array_to_string(f.toks, chr(31)), '') AS bpe_str
         |FROM documents d LEFT JOIN f USING (doc_id)
         |WHERE (SELECT ok FROM chk)
         |ORDER BY d.doc_id""".stripMargin
    }
}
