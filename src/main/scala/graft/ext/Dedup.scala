package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lineage-truncation strategy for iterative algorithms
  * ([[Dedup.nearDupClusters]]). `Local` materializes executor-local blocks —
  * fast and the right default in local mode, but the blocks are LOST on
  * executor failure, killing the job mid-iteration. `Reliable(dir)` writes
  * checkpoints under a (distributed) filesystem path and survives executor
  * loss — use it on a real cluster. */
sealed trait CheckpointStrategy
object CheckpointStrategy {
  case object Local extends CheckpointStrategy
  final case class Reliable(dir: String) extends CheckpointStrategy

  /** No materialization — for callers whose input is ALREADY materialized
    * (a foreachBatch micro-batch source) where per-call checkpoint blocks
    * would linger until RDD GC; see the streaming epoch loop's identity
    * note. Multi-consumer plans re-execute their lineage under this
    * strategy — only correct when that lineage is a materialized source. */
  case object Passthrough extends CheckpointStrategy

  /** The materialization function a strategy denotes — shared by every
    * iterative/multi-consumer operator that truncates lineage. */
  private[ext] def materializer(s: CheckpointStrategy): DataFrame => DataFrame =
    s match {
      case Local => _.localCheckpoint()
      case Passthrough => identity
      case Reliable(dir) =>
        df => {
          val sc = df.sparkSession.sparkContext
          if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
          df.checkpoint()
        }
    }
}

/** Deduplication operators for training-data pipelines: exact (fingerprint
  * hash-groupBy), n-gram Jaccard similarity join, MinHash+LSH, and SimHash.
  * (Beyond the reference surface; required by the build brief.)
  *
  * Scale design: every method is a shuffle-on-key pipeline — fingerprints
  * group by hash; the Jaccard join is an inverted-index join on shingles
  * (never a cross join) with a stop-gram document-frequency cap on by
  * default; LSH banding turns all-pairs similarity into a band-bucket
  * equi-join, the only formulation that survives 100 TB. Signatures
  * (MinHash mins, SimHash bit balances) are per-document quantities computed
  * by codegen'd scalar expressions ([[graft.funcs.MinHashSignature]],
  * [[graft.funcs.SimHashSignature]]) over per-doc shingle-hash arrays —
  * zero shuffles until the band/block equi-join.
  */
object Dedup {

  /** Word k-shingles of a token-array column (distinct, order-insensitive
    * set). The input expression is lambda-bound ([[TextStats.bound]]) so it
    * evaluates ONCE per row even when a raw `split(text)` is passed:
    * higher-order-function lambdas are interpreted without
    * common-subexpression elimination, so an unbound reference would be
    * re-evaluated by every `element_at` call — O(tokens²) regex work per
    * document. */
  def shinglesOfTokens(t: Column, k: Int = 4): Column =
    TextStats.bound(t) { ts =>
      when(size(ts) >= k,
        array_distinct(transform(sequence(lit(0), size(ts) - k),
          i => concat_ws(" ", (0 until k).map(j => element_at(ts, (i + j + 1))): _*))))
        .otherwise(array(concat_ws(" ", ts))) }

  /** Word k-shingles of a document (distinct, order-insensitive set). */
  def shingles(text: Column, k: Int = 4): Column =
    shinglesOfTokens(TextStats.tokens(text), k)

  /** Exact dedup: group by content fingerprint, keep the smallest id.
    * One shuffle on the fingerprint; at scale this is the cheapest possible
    * formulation (map-side partial aggregation applies). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextStats.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"), col("fp"))

  /** [[exact]] with a QUALITY-AWARE representative: instead of the minimum
    * id, each duplicate group keeps the member with the HIGHEST `scoreCol`
    * (id ascending as tiebreak) — the RefinedWeb/RedPajama-style "keep the
    * best copy" policy, where the score is whatever quality signal the
    * pipeline already carries (length, LM score, quality-classifier
    * output). Same cost shape as [[exact]]: one map-side-combined shuffle
    * on the fingerprint; the argmax is a `min(struct(-score, id))` —
    * deterministic under ties because (score, id) is a total order, never
    * the tie-arbitrary `max_by`. Returns (id, score, n_copies, fp). */
  def exactKeepBest(df: DataFrame, idCol: String, textCol: String,
                    scoreCol: String): DataFrame =
    df.select(col(idCol), col(scoreCol),
        TextStats.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(
        min(struct((-col(scoreCol)).as("ns"), col(idCol).as("id"))).as("__best"),
        max(col(scoreCol)).as(scoreCol),
        count(lit(1)).as("n_copies"))
      .select(col("__best.id").as(idCol), col(scoreCol), col("n_copies"),
        col("fp"))

  /** Incremental exact dedup — the CONTINUOUS-INGESTION form of [[exact]]:
    * drop from `newDf` every document whose content fingerprint already
    * exists in `seenDf`, without joining the full history. A Bloom filter
    * over the seen fingerprints (built once with the public
    * `stat.bloomFilter` — one tree-aggregated scan; ~1.2 MB per million
    * docs at 1% fpp, bounded driver/broadcast state) prefilters the new
    * batch inside whole-stage codegen
    * ([[graft.funcs.BloomMightContain]]); only the tiny might-be-seen
    * fraction pays the exact confirmation semi-join, so false positives
    * cost join rows, never correctness. At 100 TB the history scan
    * amortizes: persist the filter once per ingestion epoch and probe every
    * arriving batch against it.
    *
    * `expectedSeen` (the filter's capacity) defaults to the MEASURED
    * distinct-fingerprint count of the history — the fingerprint set is
    * already materialized for the confirm join, so the count is one cheap
    * job. A blind constant here would be a scale trap: a capacity of 1M
    * against a 10B-doc history saturates the filter (fpp → 1) and the
    * "tiny might-be-seen fraction" silently becomes the whole batch — the
    * full-history join this operator exists to avoid. Pass it explicitly
    * only to pre-size for growth within an epoch.
    *
    * Dedup WITHIN the new batch is [[exact]]'s job — this operator is
    * deliberately orthogonal (new-vs-seen only). */
  def incrementalExact(newDf: DataFrame, seenDf: DataFrame, idCol: String,
                       textCol: String, expectedSeen: Option[Long] = None,
                       fpp: Double = 0.01,
                       checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    graft.funcs.VectorFunctions.register(newDf.sparkSession)
    // the distinct fingerprint set feeds TWO consumers (the Bloom build's
    // eager job and the confirm semi-join), so it is materialized once —
    // otherwise every ingested batch would scan and re-fingerprint the full
    // history twice
    val seenFp = CheckpointStrategy.materializer(checkpoint)(
      seenDf.select(TextStats.fingerprint(col(textCol)).as("__fp")).distinct())
    val bytes = serializedBloom(buildSeenBloom(seenFp, expectedSeen, fpp))
    probeAndConfirm(newDf, seenFp, bytes, idCol, textCol,
      CheckpointStrategy.materializer(checkpoint))
  }

  /** The probe+confirm core of [[incrementalExact]], with the (possibly
    * frozen) filter supplied by the caller: Bloom-prefilter the batch inside
    * codegen, confirm the might-be-seen fraction with an exact semi-join
    * against the live fingerprint set, drop the confirmed. Exposed for the
    * epoch-loop composition ([[graft.streaming.Streaming.dedupIncremental]]),
    * where one filter serves many batches. NB the filter must cover every
    * fingerprint in `seenFp` — a fingerprint present in the history but NOT
    * in the filter takes the definitely-fresh shortcut past the confirm
    * join and its duplicate is emitted. */
  private[graft] def probeAndConfirm(newDf: DataFrame, seenFp: DataFrame,
                                     filterBytes: Array[Byte], idCol: String,
                                     textCol: String,
                                     materialize: DataFrame => DataFrame = identity): DataFrame =
    probeAndConfirmMulti(newDf, seenFp, Seq(filterBytes), idCol, textCol,
      materialize)

  /** [[probeAndConfirm]] over a LIST of filters: a row is a candidate iff
    * ANY filter might contain its fingerprint. This is how the epoch loop
    * keeps its per-batch state small — one large FROZEN epoch filter plus
    * one batch-sized filter per accepted batch, probed together, instead of
    * rebuilding (and shipping) an epoch-capacity filter every batch. Each
    * probe is the same codegen'd expression; k extra ORed probes against
    * small byte arrays are cheap relative to one epoch-sized build. The
    * UNION of the filters must cover every fingerprint in `seenFp` (see
    * [[probeAndConfirm]]'s covering note); the effective false-positive
    * rate is at most the SUM of the filters' rates — a perf dial, never
    * correctness.
    *
    * `materialize` cuts the batch's lineage at the two points where Catalyst
    * would otherwise re-execute it: (1) the skinny (id, fingerprint)
    * projection — the ORed probe arms are short-circuit branches, which
    * whole-stage codegen EXCLUDES from common-subexpression elimination, so
    * probing a lazy projection re-evaluates the fingerprint (and everything
    * under it, including the caller's scans) once per arm — and (2) the
    * confirmed id set, which the final anti-join would otherwise duplicate
    * per branch of a union-shaped `newDf`. Batch operators pass their
    * checkpoint strategy; the streaming epoch loop passes identity (its
    * per-batch lineage is the micro-batch source — already materialized —
    * and per-batch checkpoint blocks would linger until RDD GC). */
  private[graft] def probeAndConfirmMulti(newDf: DataFrame, seenFp: DataFrame,
                                          filters: Seq[Array[Byte]],
                                          idCol: String,
                                          textCol: String,
                                          materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(filters.nonEmpty, "at least one filter required")
    graft.funcs.VectorFunctions.register(newDf.sparkSession)
    val newKeys = materialize(newDf.select(
      col(idCol), TextStats.fingerprint(col(textCol)).as("__fp")))
    val confirmed = materialize(newKeys
      .filter(filters.map(b => graft.funcs.VectorFunctions.bloomMightContain(
        xxhash64(col("__fp")), b)).reduce(_ || _))
      .join(seenFp, Seq("__fp"), "left_semi")
      .select(col(idCol)))
    newDf.join(confirmed, Seq(idCol), "left_anti")
  }

  /** Incremental NEAR-dup ingestion dedup — [[incrementalExact]]'s
    * signature-space sibling: drop from `newDf` every document whose
    * 64-bit SimHash signature is within Hamming distance `maxDist` of a
    * seen document's. The same Bloom-prefilter + exact-confirm shape.
    *
    * `maxDist = 0` (default): the filter is built over the signatures
    * themselves (already longs — no extra hashing) and the confirm is a
    * signature-equality semi-join. This is the cheapest online scope
    * (boilerplate, whitespace variants, token repeats/reorders at k=1),
    * matching [[graft.streaming.Streaming.dedupNear]].
    *
    * `maxDist` 1–3: the pigeonhole extension of the same shape — a pair
    * within Hamming 3 must agree on at least one of the four 16-bit
    * signature blocks (the [[simhashPairs]] blocking scheme), so the filter
    * is built over the seen side's BLOCK KEYS (block index ⊕ 16-bit value,
    * 4 per signature) and an arrival is a candidate iff ANY of its four
    * block probes hits — four codegen'd probes, no explode on the fast
    * path. Candidates then pay the exact confirmation: a block-keyed
    * equi-join against the seen signatures (never a cross join) filtered
    * by popcount Hamming ≤ `maxDist`. False positives and block
    * collisions cost confirm-join rows, never correctness. This closes
    * the online/batch scope gap: small real edits (1–3 flipped signature
    * bits) are dropped at ingestion, not just by the next [[simhashPairs]]
    * terminal run. The full PAIR GRAPH (who matches whom, both sides new)
    * remains the batch operator's job — this drops arrivals against
    * history. Skew note: a degenerate block value shared by many seen
    * signatures multiplies confirm-join rows exactly as in
    * [[simhashPairs]]; the prefilter keeps that join candidate-only.
    *
    * Capacity auto-sizes from the measured seen-side count (signatures,
    * or 4× blocks), like [[incrementalExact]]. */
  def incrementalNear(newDf: DataFrame, seenDf: DataFrame, idCol: String,
                      textCol: String, k: Int = 4,
                      hasher: Hasher = Hasher.Xx, maxDist: Int = 0,
                      expectedSeen: Option[Long] = None, fpp: Double = 0.01,
                      checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"pigeonhole blocking assumes maxDist <= 3 (4 blocks), got $maxDist")
    // materialized once: feeds the Bloom build (+ its sizing count) and the
    // confirm join — same posture as incrementalExact's seenFp
    val seenSig = CheckpointStrategy.materializer(checkpoint)(
      simhash(seenDf, idCol, textCol, k, hasher)
        .select(col("simhash").as("__sig")).distinct())
    // the batch's (id, signature) projection is materialized BEFORE the
    // probe filter: the ORed probe arms are short-circuit branches that
    // codegen excludes from common-subexpression elimination, so probing a
    // lazy projection re-evaluates the full simhash lineage (tokenize,
    // shingle, per-shingle hash, plus the caller's scans under it) once per
    // arm — measured 4 × the whole-batch signature cost at maxDist 3
    val newSig = CheckpointStrategy.materializer(checkpoint)(
      simhash(newDf, idCol, textCol, k, hasher))
    val confirmed =
      if (maxDist == 0) {
        val bytes = serializedBloom(
          buildLongBloom(seenSig, "__sig", expectedSeen, fpp))
        newSig
          .filter(graft.funcs.VectorFunctions.bloomMightContain(
            col("simhash"), bytes))
          .join(seenSig, col("simhash") === col("__sig"), "left_semi")
          .select(col("id"))
      } else nearSeenIds(newSig, seenSig, maxDist, expectedSeen, fpp)
    // materialized too: `confirmed` is bounded by the BATCH (ids only), but
    // its plan embeds the whole probe+confirm pipeline INCLUDING newDf's
    // lineage — left unmaterialized, Catalyst pushes the anti-join through
    // a union-shaped newDf and executes that pipeline once per branch
    // (q65's fixture paid 2× the probe, the confirm join, and every
    // documents scan under it)
    val confirmedIds = CheckpointStrategy.materializer(checkpoint)(confirmed)
    newDf.join(confirmedIds, newDf(idCol) === confirmedIds("id"), "left_anti")
  }

  /** [[incrementalNear]]'s probe + confirm over PRE-BUILT seen-side state —
    * the near-dup epoch loop's per-batch core, mirroring
    * [[probeAndConfirmMulti]]: `seenSig` is a one-column (`__fp`) signature
    * set and `filters` is a frozen epoch filter plus batch-sized delta
    * filters whose UNION covers it (signatures themselves at `maxDist` 0,
    * the 4-per-signature block keys otherwise). A batch row is a candidate
    * iff ANY filter hits (any of its four block probes, at maxDist > 0 —
    * 4·k ORed codegen probes, no explode on the fast path); candidates pay
    * the exact confirm (equality semi-join, or the block-keyed equi-join
    * filtered by popcount Hamming). Returns the fresh rows of `newDf`. */
  private[graft] def nearProbeConfirmMulti(newDf: DataFrame,
      seenSig: DataFrame, filters: Seq[Array[Byte]], idCol: String,
      textCol: String, k: Int, hasher: Hasher, maxDist: Int,
      materialize: DataFrame => DataFrame = identity): DataFrame = {
    require(filters.nonEmpty, "at least one filter required")
    graft.funcs.VectorFunctions.register(newDf.sparkSession)
    // materialize: same lineage-cut dial as [[probeAndConfirmMulti]] — the
    // 4·k ORed probe arms each re-evaluate a lazy signature projection
    val newSig = materialize(simhash(newDf, idCol, textCol, k, hasher))
    val confirmed =
      if (maxDist == 0)
        newSig
          .filter(filters.map(b => graft.funcs.VectorFunctions
            .bloomMightContain(col("simhash"), b)).reduce(_ || _))
          .join(seenSig, col("simhash") === col("__fp"), "left_semi")
          .select(col("id"))
      else {
        def blocks(sig: Column) = array((0 until 4).map(blockKey(sig, _)): _*)
        val candidates = newSig.filter((for {
          b <- 0 until 4; f <- filters
        } yield graft.funcs.VectorFunctions.bloomMightContain(
          blockKey(col("simhash"), b), f)).reduce(_ || _))
        val candBlocks = candidates.select(col("id"), col("simhash"),
          explode(blocks(col("simhash"))).as("__bk"))
        val seenKeyed = seenSig.select(col("__fp"),
          explode(blocks(col("__fp"))).as("__bk"))
        candBlocks.join(seenKeyed, Seq("__bk"))
          .filter(bit_count(col("simhash").bitwiseXOR(col("__fp"))) <= maxDist)
          .select(col("id")).distinct()
      }
    val confirmedIds = materialize(confirmed)
    newDf.join(confirmedIds, newDf(idCol) === confirmedIds("id"), "left_anti")
  }

  /** Distinct one-column (`__fp`) SimHash signature set of a frame — the
    * near-dup epoch loop's covering-key extraction (the signature chain of
    * [[simhash]] without an id column). */
  private[graft] def signatureKeys(df: DataFrame, textCol: String, k: Int,
                                   hasher: Hasher): DataFrame = {
    graft.funcs.VectorFunctions.register(df.sparkSession)
    df.select(TextStats.tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .select(shinglesOfTokens(col("__t"), k).as("__g"))
      .select(graft.funcs.VectorFunctions.simhashSig(col("__g"),
        useMd5 = hasher == Hasher.Md5).as("__fp"))
      .distinct()
  }

  /** Serialized Bloom filter covering a `__fp` SIGNATURE key set for the
    * given Hamming scope: the signatures themselves at `maxDist` 0, their
    * 4-per-signature block keys (capacity ×4) otherwise. */
  private[graft] def signatureBloom(keys: DataFrame, expected: Option[Long],
                                    fpp: Double, maxDist: Int): Array[Byte] =
    serializedBloom(
      if (maxDist == 0) buildLongBloom(keys, "__fp", expected, fpp)
      else buildLongBloom(
        keys.select(explode(array((0 until 4).map(b =>
          blockKey(col("__fp"), b)): _*)).as("__bk")),
        "__bk", expected.map(_ * 4), fpp))

  /** Block key of 16-bit signature block `b`: block value ⊕ block index in
    * the high bits — distinct key spaces per block, one long. */
  private def blockKey(sig: Column, b: Int): Column =
    shiftrightunsigned(sig, b * 16).bitwiseAND(lit(0xFFFFL)) +
      lit(b.toLong << 16)

  /** The Hamming ≤ `maxDist` core of [[incrementalNear]] over already-built
    * signature tables: `newSig` = (id, simhash), `seenSig` = (__sig).
    * Returns the distinct ids of new signatures within `maxDist` of any
    * seen signature. Package-visible so specs can plant exact bit flips. */
  private[graft] def nearSeenIds(newSig: DataFrame, seenSig: DataFrame,
                                 maxDist: Int, expectedSeen: Option[Long],
                                 fpp: Double): DataFrame = {
    graft.funcs.VectorFunctions.register(newSig.sparkSession)
    def blocks(sig: Column) = array((0 until 4).map(blockKey(sig, _)): _*)
    // capacity: caller's expected seen count × 4 blocks, or the measured
    // block-row count (4 × |seen|, an upper bound on distinct keys — no
    // distinct shuffle; duplicate Bloom inserts are harmless)
    val seenBlocks = seenSig.select(explode(blocks(col("__sig"))).as("__bk"))
    val bytes = serializedBloom(
      buildLongBloom(seenBlocks, "__bk", expectedSeen.map(_ * 4), fpp))
    val candidates = newSig.filter((0 until 4).map(b =>
      graft.funcs.VectorFunctions.bloomMightContain(
        blockKey(col("simhash"), b), bytes)).reduce(_ || _))
    val candBlocks = candidates.select(col("id"), col("simhash"),
      explode(blocks(col("simhash"))).as("__bk"))
    val seenKeyed = seenSig.select(col("__sig"),
      explode(blocks(col("__sig"))).as("__bk"))
    candBlocks.join(seenKeyed, Seq("__bk"))
      .filter(bit_count(col("simhash").bitwiseXOR(col("__sig"))) <= maxDist)
      .select(col("id")).distinct()
  }

  /** Bloom filter over the xxhash64 of a materialized `__fp` fingerprint
    * column; capacity = `expectedSeen` or (default) the measured distinct
    * count. Package-visible so the sizing behavior is testable directly —
    * the filter's achieved fpp, not just the (always-correct) join result. */
  private[graft] def buildSeenBloom(seenFp: DataFrame,
                                    expectedSeen: Option[Long],
                                    fpp: Double): org.apache.spark.util.sketch.BloomFilter =
    buildLongBloom(seenFp.select(xxhash64(col("__fp")).as("__h")), "__h",
      expectedSeen, fpp)

  /** Bloom filter over a long column (both ingestion-dedup variants build
    * through here, so the sizing/sentinel logic has ONE home); capacity =
    * `expected` or (default) the measured row count. */
  private[graft] def buildLongBloom(values: DataFrame, valueCol: String,
                                    expected: Option[Long],
                                    fpp: Double): org.apache.spark.util.sketch.BloomFilter = {
    val capacity = math.max(1L, expected.getOrElse(values.count()))
    // the sentinel row keeps `stat.bloomFilter` off its empty-input NPE
    // (bloom_filter_agg returns null for zero rows); its only effect is a
    // possible false positive on value 0, which the confirm join resolves
    values.select(col(valueCol).as("__h"))
      .unionByName(values.sparkSession.range(1).select(lit(0L).as("__h")))
      .stat.bloomFilter("__h", capacity, fpp)
  }

  private[graft] def serializedBloom(
      bloom: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Exploded, distinct (id, shingle) posting list. The token array is
    * materialized in its own projection first; CollapseProject keeps it
    * separate (non-cheap expression referenced many times), so the regex
    * split runs once per document instead of once per element_at. */
  private def postings(df: DataFrame, idCol: String, textCol: String, k: Int) =
    // no pinnedCol here: measured 2.4-2.6 s either way at sf0.1 (the
    // shingle build was NOT being re-evaluated per output row, unlike
    // Spans.spanWindows' window transform, which the pin cut 34%)
    df.select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("__t"))
      .select(col("id"), explode(shinglesOfTokens(col("__t"), k)).as("g"))
      .distinct()

  /** Default stop-gram cap: shingles occurring in more documents than this
    * carry no near-dup signal and would dominate the inverted-index join on a
    * skewed corpus (a df-F shingle contributes F² join rows). The cap is a
    * fixed absolute count, not a corpus fraction: genuine near-dup clusters
    * are small, so any shingle shared by 1000+ documents is boilerplate. */
  val DefaultMaxDocFreq = 1000

  /** Exact n-gram Jaccard similarity join: pairs with |A∩B|/|A∪B| >= minJaccard.
    * Inverted-index join on shingles: co-occurrence counts per pair, then
    * J = c / (n1 + n2 - c).
    *
    * `maxDocFreq` (on by default) drops shingles with document frequency
    * above the cap before the self-join — the skew guard that keeps the join
    * near-linear on a real corpus where stop-grams ("in the of the") appear
    * in millions of documents. Note the asymmetry is intentional: dropped
    * stop-grams shrink BOTH the intersection and the per-doc set sizes, so
    * J is computed over the filtered shingle space (standard practice;
    * equivalent to Jaccard over discriminative shingles only). Pass `None`
    * to disable.
    *
    * `checkpoint` governs the posting-list materialization (default
    * [[CheckpointStrategy.Local]]; pass [[CheckpointStrategy.Reliable]] on
    * a real cluster — the postings are the operator's working set, and a
    * local-only block is lost on executor failure).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        minJaccard: Double = 0.8, k: Int = 4,
                        maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq),
                        checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val post0 = postings(df, idCol, textCol, k)
    // OPT r19: the posting list feeds THREE consumers (the per-doc sizes
    // aggregate and both sides of the co-occurrence self-join), and each
    // consumer used to re-run the whole tokenize+shingle+distinct pipeline
    // — the q35 plan audit showed no exchange reuse across the differently
    // keyed parents. One materialization of the skinny (id, gram) rows
    // replaces 3 corpus passes (guide §2.4/§5: cache only what is reused
    // AND expensive to recompute — this is both).
    val all = CheckpointStrategy.materializer(checkpoint)(post0)
    // OPT r20 (guide §2.5, VERDICT r19 #4): the doc-freq cap was a windowed
    // count over `g`, which lands EVERY posting row of a hot gram on one
    // window task — the straggler the cap exists to prevent. Now a partial-
    // aggregated count (map-side combine compresses a hot gram to one row
    // per map task — the two-level (g, salt)→g count with the map task as
    // the salt) filtered to the OVER-cap grams, anti-joined back. The hot
    // table is tiny by construction (≤ |postings| / maxDocFreq rows), so
    // AQE turns the anti-join into a broadcast probe — the postings are
    // never shuffled by `g` for the cap at all; if the hot set ever
    // outgrows the broadcast threshold, AQE keeps a sort-merge anti join
    // WITH skew-split, which the window shape could never have.
    val post = maxDocFreq match {
      case Some(mx) =>
        // hot is materialized (one cheap scan+agg job) so the three
        // consumers of `post` probe a built table instead of each
        // re-running the frequency aggregate. Its size is then KNOWN for
        // free (count over local blocks), so the anti-join is broadcast
        // EXPLICITLY while the hot set fits — leaving it to AQE still
        // materializes a postings-by-g exchange per consumer before the
        // runtime conversion (measured +30% on q132). An empty hot set
        // (the common small-SF case) skips the join outright; an
        // over-threshold one (degenerate 100 TB boilerplate) falls back
        // to the planner's shuffled anti join, which AQE skew-splits.
        val hot = CheckpointStrategy.materializer(checkpoint)(
          all.groupBy(col("g")).agg(count(lit(1)).as("__df"))
            .filter(col("__df") > mx).select(col("g")))
        val nHot = hot.count()
        if (nHot == 0L) all
        else if (nHot <= (1L << 22)) all.join(broadcast(hot), Seq("g"), "left_anti")
        else all.join(hot, Seq("g"), "left_anti")
      case None => all
    }
    val sizes = post.groupBy("id").agg(count(lit(1)).as("n"))
    val co = post.as("a").join(post.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("c"))
    co.join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n", "n1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n", "n2"), "id2")
      .withColumn("jaccard", col("c").cast("double") / (col("n1") + col("n2") - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Near-dup CLUSTERS from a pair list: connected components by iterative
    * min-label propagation (each node repeatedly adopts the smallest label
    * among itself and its neighbors until fixpoint — the hash-join
    * formulation of connected components; O(log diameter) rounds, and
    * near-dup cluster diameters are tiny). Returns (id, cluster) where
    * cluster = the smallest doc id in the component, i.e. the KEPT
    * representative of the dedup group. Each round is one shuffle join +
    * aggregate; lineage is truncated per round so plans stay flat.
    *
    * @param checkpoint lineage-truncation strategy: [[CheckpointStrategy.Local]]
    *   (default, local-mode) or [[CheckpointStrategy.Reliable]] with a
    *   checkpoint dir for fault tolerance on a real cluster
    */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 20,
                      checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val cp: DataFrame => DataFrame = CheckpointStrategy.materializer(checkpoint)
    // materialize the (possibly expensive) pair pipeline ONCE: edges and the
    // initial labels both derive from it, and every propagation round joins
    // against edges — without this the upstream similarity join would
    // re-execute each round
    val p = cp(pairs.select(col("id1"), col("id2")))
    val edges = p.unionByName(p.select(col("id2").as("id1"), col("id1").as("id2")))
    // fused first round: every node's initial label is min(self, min
    // neighbor) — identical to propagating once from self-labels, for the
    // price of the node-distinct aggregate the init pays anyway. Most
    // near-dup components are pairs/triples (diameter 1), so they converge
    // one full join+checkpoint round earlier.
    var labels = cp(edges
      .groupBy(col("id1").as("id")).agg(min(col("id2")).as("__m"))
      .select(col("id"), least(col("id"), col("__m")).as("cluster")))
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val nbrMin = labels.join(edges, labels("id") === edges("id1"))
        .groupBy(edges("id2").as("id"))
        .agg(min(col("cluster")).as("__nbr"))
      // carry the previous label through the checkpoint so convergence
      // detection is a local filter over materialized rows, not another join
      val next = cp(labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("cluster").as("__old"),
          least(col("cluster"), coalesce(col("__nbr"), col("cluster"))).as("cluster")))
      converged = next.filter(col("cluster") =!= col("__old")).isEmpty
      labels = next.select(col("id"), col("cluster"))
      iters += 1
    }
    labels
  }

  /** The corpus with near-duplicates REMOVED: every document that belongs to
    * a near-dup cluster and is not its representative (the cluster's
    * smallest id) is dropped; documents in no cluster pass through. The
    * "give me the deduped corpus" terminal a training-data pipeline actually
    * consumes — `pairs` comes from any of the pair operators
    * ([[ngramJaccardPairs]], [[minhashDedupPairs]], [[simhashPairs]],
    * [[deletionNeighborPairs]], [[graft.ext.Similarity.cosineLshPairs]]),
    * so the policy (exact, Jaccard, SimHash, edit distance, embedding
    * cosine) is the caller's choice. One LEFT ANTI join
    * against the drop set — an id-only skinny side that AQE broadcasts when
    * it fits and shuffles on the key otherwise (at real dup rates the drop
    * set is a large fraction of the corpus, so no broadcast is forced). */
  def removeNearDups(df: DataFrame, idCol: String, pairs: DataFrame,
                     maxIters: Int = 20,
                     checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val clusters = nearDupClusters(pairs, maxIters, checkpoint)
    val drop = clusters.filter(col("id") =!= col("cluster")).select(col("id"))
    df.join(drop, df(idCol) === drop("id"), "left_anti")
  }

  /** SOFT dedup: keep every document but DOWNWEIGHT near-dup clusters to
    * unit total mass — `weight` = 1/n_copies, so a group of n near-copies
    * contributes the sampling mass of one document instead of n (and
    * instead of zero for all but one, [[removeNearDups]]'s hard policy).
    * The standard soft alternative when exact members differ in ways the
    * pair policy ignores (formatting, boilerplate tails) and dropping
    * would lose the variation; feed `weight` to
    * [[graft.ext.Corpus.weightedSample]] or a mixture stage. Adds
    * `cluster` (representative id), `n_copies`, `weight` (1/n rounded to
    * 6 dp — one double division of exact longs, engine-stable).
    *
    * `pairs` may reference ids absent from `df` (a filtered subset of the
    * corpus that produced the pairs is a normal composition): cluster
    * membership is semi-joined against `df`'s ids before the size
    * aggregate, so `n_copies` counts only rows actually present and the
    * unit-total-mass invariant holds over `df` itself.
    *
    * Scale shape: connected components over the PAIR GRAPH only, one
    * id-keyed semi-join (skinny both sides), one pairs-sized (cluster, n)
    * aggregate, two joins back (AQE broadcasts the skinny sides when they
    * fit); documents in no cluster take n_copies = 1 without touching the
    * cluster table. */
  def softDedupWeights(df: DataFrame, idCol: String, pairs: DataFrame,
                       maxIters: Int = 20,
                       checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val clash = Seq("cluster", "n_copies", "weight").filter(df.columns.contains)
    require(clash.isEmpty, s"softDedupWeights reserves column name(s) " +
      s"${clash.mkString(", ")}; rename the input column(s) first")
    // only members present in df count toward n_copies — pairs may come
    // from a superset corpus, and absent members must not dilute weights
    val clusters = nearDupClusters(pairs, maxIters, checkpoint)
      .join(df.select(col(idCol).as("id")), Seq("id"), "left_semi")
    val sizes = clusters.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_copies"))
    df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .join(sizes, Seq("cluster"), "left")
      .withColumn("n_copies", coalesce(col("n_copies"), lit(1L)))
      .withColumn("weight",
        round(lit(1.0) / col("n_copies").cast("double"), 6))
  }

  /** SymSpell-style typo pairs over SHORT string fields (titles, names,
    * canonical URLs): all pairs within Levenshtein distance `maxDist`
    * (1 or 2), found via the DELETION NEIGHBORHOOD — if
    * `lev(a, b) <= d`, then some string obtainable by deleting <= d chars
    * from `a` equals one obtainable by deleting <= d chars from `b`
    * (Garbe's SymSpell invariant), so an EQUI-join on delete-variants has
    * recall 1.0 by construction, not by tuning. This is the near-dup tool
    * the shingle/SimHash family can't serve: on a 20-char title a single
    * typo destroys most 4-grams, but its delete-neighborhood key survives
    * exactly. Returns (id1, id2, dist) with id1 < id2, confirmed by the
    * exact DP distance.
    *
    * Scale shape: variants explode each row into len+1 (d=1) or
    * O(len²/2) (d=2) skinny (variant, id, s) postings — short-field
    * discipline, the generator is linear in corpus characters; the pair
    * join is variant-keyed with the stop-gram frequency cap
    * (`maxKeyFreq`) guarding hot keys exactly like [[ngramJaccardPairs]]
    * — collapse EXACT duplicates first (the terminals' rule): a key
    * shared by an exact-dup cluster is quadratic by semantics, not by
    * plan. Candidates dedupe on (id1, id2) before the single codegen'd
    * `levenshtein` confirm. */
  def deletionNeighborPairs(df: DataFrame, idCol: String, strCol: String,
                            maxDist: Int = 1,
                            maxKeyFreq: Option[Int] = Some(DefaultMaxDocFreq),
                            observation: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (the SymSpell regime), got $maxDist")
    val post0 = deleteVariantPostings(df, idCol, strCol, maxDist)
    // OPT r19 note: measured BOTH ways at sf0.1 — materializing the capped
    // variant postings for the two self-join sides LOST ~20% (the explode
    // is cheap codegen'd string slicing; writing ~(len+1)× corpus skinny
    // rows costs more than recomputing them), so this stays lazy.
    val post = capVariantKeys(post0, maxKeyFreq.map(_.toLong), observation)
    val a = post.select(col("__k"), col("__id").as("id1"), col("__s").as("__s1"))
    val b = post.select(col("__k"), col("__id").as("id2"), col("__s").as("__s2"))
    a.join(b, Seq("__k")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("__s1"), col("__s2")).distinct()
      .withColumn("dist", levenshtein(col("__s1"), col("__s2")))
      .filter(col("dist") <= maxDist)
      .select(col("id1"), col("id2"), col("dist"))
  }

  /** Fuzzy key JOIN across two tables — entity resolution's workhorse:
    * every (left, right) row pair whose SHORT string keys sit within
    * Levenshtein `maxDist` (1 or 2), found through the same SymSpell
    * deletion-neighborhood key space as [[deletionNeighborPairs]] — an
    * EQUI-join on delete-variants with recall 1.0 by Garbe's invariant,
    * never a cross join — and confirmed by the exact codegen'd
    * `levenshtein`. Exact matches surface as dist 0 (a fuzzy join
    * subsumes the exact one), and unlike the self-pair operator there is
    * no `id1 < id2` mask: left and right are different relations.
    * Output: (`leftId`, `rightId`, dist).
    *
    * NULL keys match NOTHING, on either side — the SQL comparison
    * semantics (`levenshtein(NULL, x) IS NULL`), which is what the q171
    * oracle's exact theta-join computes. Rows with a NULL key are
    * filtered before the variant explode; a caller who wants
    * NULL-as-empty-string semantics (every NULL pairing with every key of
    * length ≤ maxDist) should `coalesce` the key upstream, explicitly.
    *
    * Scale shape: each side explodes into skinny linear variant postings;
    * `maxKeyFreq` caps hot variant keys PER SIDE (a key over-cap on
    * either side emits no pairs — lost recall). Pass `leftObservation` /
    * `rightObservation` to read each side's dropped mass
    * (`dropped_postings`, `max_key_freq`) off this very action — the
    * [[deletionNeighborPairs]] observation surface; without them the
    * auto-named `graft.symspell.key_cap` observations still fire, or
    * measure with [[symspellCapReport]] on each input (same AQE caveat
    * as [[SymSpellCapMetric]]). Collapse exact duplicates per side
    * first, the terminals' rule. */
  def typoJoin(left: DataFrame, right: DataFrame,
               leftId: String, leftKey: String,
               rightId: String, rightKey: String,
               maxDist: Int = 1,
               maxKeyFreq: Option[Int] = Some(DefaultMaxDocFreq),
               leftObservation: Option[org.apache.spark.sql.Observation] = None,
               rightObservation: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (the SymSpell regime), got $maxDist")
    require(leftId != rightId,
      s"output id columns must have distinct names, both are '$leftId'")
    val cap = maxKeyFreq.map(_.toLong)
    val lp = capVariantKeys(
        deleteVariantPostings(left.filter(col(leftKey).isNotNull),
          leftId, leftKey, maxDist), cap, leftObservation)
      .select(col("__k"), col("__id").as("__lid"), col("__s").as("__ls"))
    val rp = capVariantKeys(
        deleteVariantPostings(right.filter(col(rightKey).isNotNull),
          rightId, rightKey, maxDist), cap, rightObservation)
      .select(col("__k"), col("__id").as("__rid"), col("__s").as("__rs"))
    lp.join(rp, Seq("__k"))
      .select(col("__lid"), col("__rid"), col("__ls"), col("__rs")).distinct()
      .withColumn("dist", levenshtein(col("__ls"), col("__rs")))
      .filter(col("dist") <= maxDist)
      .select(col("__lid").as(leftId), col("__rid").as(rightId), col("dist"))
  }

  /** Metric name for the SymSpell variant-key frequency cap — the
    * [[BucketCapMetric]] pattern for [[deletionNeighborPairs]]: a capped
    * hot key is LOST RECALL, and as of r16 it is observable per action
    * rather than a silent keep-join (VERDICT r15 #2). Emits
    * `dropped_postings` (variant rows in over-cap keys — rows that emit no
    * candidate pairs) and `max_key_freq` (the hottest key seen — cap
    * headroom). Same AQE caveat as [[BucketCapMetric]]: the observed
    * branch feeds the candidate self-join, so prefer an explicit
    * [[org.apache.spark.sql.Observation]] or the single-consumer
    * [[symspellCapReport]] when the number must be trusted. */
  val SymSpellCapMetric = "graft.symspell.key_cap"
  private val symspellCapIds = new java.util.concurrent.atomic.AtomicLong()

  /** The variant-key frequency guard: drop postings of keys hotter than
    * `cap` via one windowed count over the same `__k` partitioning the
    * candidate join shuffles on (no extra shuffle shape — the old
    * groupBy-and-keep-join paid a second aggregate for the same answer),
    * with dropped mass observed à la [[capBuckets]]. */
  private def capVariantKeys(post0: DataFrame, cap: Option[Long],
      observation: Option[org.apache.spark.sql.Observation]): DataFrame =
    (cap, observation) match {
      // uncapped and unobserved: no window pass at all
      case (None, None) => post0
      case _ =>
        // uncapped-but-OBSERVED still runs the window so the passed
        // Observation is attached to a real plan — otherwise obs.get()
        // would block forever on a metric that never fires; the
        // Long.MaxValue cap drops 0 by construction (the
        // symspellCapReport discipline) while max_key_freq stays real
        val m = cap.getOrElse(Long.MaxValue)
        val sized = post0.withColumn("__kf", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))))
        val dropped = coalesce(
          sum(when(col("__kf") > m, 1L).otherwise(0L)), lit(0L))
          .as("dropped_postings")
        val hottest = coalesce(max(col("__kf")), lit(0L)).as("max_key_freq")
        val observed = observation match {
          case Some(o) => sized.observe(o, dropped, hottest)
          case None => sized.observe(
            s"$SymSpellCapMetric.${symspellCapIds.incrementAndGet()}",
            dropped, hottest)
        }
        observed.filter(col("__kf") <= m).drop("__kf")
    }

  /** Dropped-mass report for the SymSpell key cap — [[bucketCapReport]]'s
    * sibling: measures what `maxKeyFreq` drops on the corpus's
    * delete-variant postings on a SINGLE-CONSUMER plan (where the
    * observation provably surfaces), one extra pass, for cap tuning and
    * corpus audits. `droppedRows` = variant postings in over-cap keys,
    * `maxBucket` = the hottest variant key's frequency. */
  def symspellCapReport(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int = 1,
                        maxKeyFreq: Option[Int] = Some(DefaultMaxDocFreq)): BucketCapReport = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (the SymSpell regime), got $maxDist")
    // the uncapped probe passes Long.MaxValue (no count can exceed it), so
    // "drops 0 by construction" is literal — the capBucketsLong discipline
    val obs = org.apache.spark.sql.Observation()
    capVariantKeys(deleteVariantPostings(df, idCol, strCol, maxDist),
        Some(maxKeyFreq.map(_.toLong).getOrElse(Long.MaxValue)), Some(obs))
      .write.format("noop").mode("overwrite").save()
    BucketCapReport(
      droppedRows = obs.get("dropped_postings").asInstanceOf[Long],
      maxBucket = obs.get("max_key_freq").asInstanceOf[Long],
      cap = maxKeyFreq)
  }

  /** Shared SymSpell key space: (__id, __s, __k) postings where __k ranges
    * over every string obtainable by deleting <= maxDist characters
    * (including the string itself), distinct per row. */
  private def deleteVariantPostings(df: DataFrame, idCol: String,
                                    strCol: String, maxDist: Int): DataFrame = {
    // guard len = 0: Spark's sequence(1, 0) auto-steps BACKWARD ([1, 0])
    // instead of returning empty
    def dels(c: Column): Column =
      concat(array(c),
        when(length(c) >= 1, transform(sequence(lit(1), length(c)),
            i => concat(substr(c, lit(1), i - 1),
              substr(c, i + 1, length(c)))))
          .otherwise(array().cast("array<string>")))
    val s0 = coalesce(col(strCol), lit(""))
    val v1 = df.select(col(idCol).as("__id"), s0.as("__s"))
      // pinned: HOF lambdas get no CSE and d=2 re-derives from d=1
      .withColumn("__v1", TextStats.pinnedCol(array_distinct(dels(col("__s")))))
    val vars =
      if (maxDist == 1) v1.withColumn("__v", col("__v1"))
      else v1.withColumn("__v",
        array_distinct(flatten(transform(col("__v1"), v => dels(v)))))
    vars.select(col("__id"), col("__s"), explode(col("__v")).as("__k"))
  }

  /** Incremental SHORT-FIELD typo dedup — [[incrementalExact]]'s
    * edit-distance sibling over [[deletionNeighborPairs]]'s key space:
    * drop from `newDf` every arrival whose `strCol` is within Levenshtein
    * `maxDist` (1 or 2) of a SEEN row's. Same Bloom-prefilter +
    * exact-confirm shape: the filter is built over the seen side's
    * delete-variant keys (capacity auto-sizes from their measured distinct
    * count, the [[incrementalExact]] discipline); an arrival's skinny
    * variant postings probe it inside whole-stage codegen, and only the
    * might-be-seen fraction pays the variant-keyed equi-join against the
    * seen variants (never a cross join), confirmed by the exact codegen'd
    * `levenshtein`. Recall 1.0 by the SymSpell invariant; Bloom false
    * positives and variant collisions cost confirm rows, never
    * correctness. Dedup WITHIN the batch is [[deletionNeighborPairs]] +
    * a cluster terminal's job — this drops arrivals against history. */
  def incrementalTypo(newDf: DataFrame, seenDf: DataFrame, idCol: String,
                      strCol: String, maxDist: Int = 1,
                      expectedSeen: Option[Long] = None, fpp: Double = 0.01,
                      checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame =
    dropSeenTypos(newDf, idCol, strCol,
      prepareTypoCatalog(seenDf, strCol, maxDist, expectedSeen, fpp,
        checkpoint), checkpoint)

  /** Frozen catalog state for typo ingestion dedup: the catalog's
    * distinct delete-variant postings (materialized once) plus their
    * Bloom filter bytes. Build ONCE per ingestion epoch and probe every
    * arriving batch with [[dropSeenTypos]] — the frozen-model discipline
    * every streaming probe in this engine follows; [[incrementalTypo]] is
    * the one-shot composition for batch callers. `capacity`/`fpp` are the
    * Bloom's build parameters, carried so a persisted catalog
    * ([[writeTypoCatalog]]) can grow by shard-sized merges
    * ([[appendToTypoCatalog]]) — Spark Bloom filters only merge when both
    * sides were created with identical (capacity, fpp). */
  final case class TypoCatalog private[ext] (maxDist: Int,
                                             seenVars: DataFrame,
                                             filterBytes: Array[Byte],
                                             capacity: Long,
                                             fpp: Double)

  /** Build a [[TypoCatalog]]: the seen side's distinct delete-variant
    * postings feed the Bloom build (+ its sizing count) and the confirm
    * join — one materialization, on DISTINCT strings (a seen exact-dup
    * cluster must not multiply confirm rows). For a catalog that will be
    * persisted and appended to, size `expectedSeen` for the epoch's
    * growth horizon: appends past the capacity only degrade the Bloom's
    * false-positive rate (more confirm-join rows), never correctness. */
  def prepareTypoCatalog(seenDf: DataFrame, strCol: String, maxDist: Int = 1,
                         expectedSeen: Option[Long] = None, fpp: Double = 0.01,
                         checkpoint: CheckpointStrategy = CheckpointStrategy.Local): TypoCatalog = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (the SymSpell regime), got $maxDist")
    val seenVars = CheckpointStrategy.materializer(checkpoint)(
      deleteVariantPostings(
          seenDf.select(col(strCol)).distinct(), strCol, strCol, maxDist)
        .select(col("__k"), col("__s").as("__s2")).distinct())
    // resolve the capacity HERE (the materialized count is cheap) so the
    // catalog records the exact parameter the filter was created with
    val capacity = math.max(1L, expectedSeen.getOrElse(seenVars.count()))
    val bytes = serializedBloom(buildLongBloom(
      seenVars.select(xxhash64(col("__k")).as("__h")), "__h",
      Some(capacity), fpp))
    TypoCatalog(maxDist, seenVars, bytes, capacity, fpp)
  }

  // ---------------------------------------------------------------------
  // Persisted typo catalog — the postings-store lifecycle applied to the
  // SymSpell key space (VERDICT r15 #8): build once, append survivor
  // shards as ingestion admits them, reload after a restart without a
  // rebuild scan of the seen corpus.
  // ---------------------------------------------------------------------

  private def typoMeta(spark: SparkSession, name: String): Map[String, String] =
    spark.table(s"${name}_meta").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  private def writeTypoMeta(spark: SparkSession, name: String,
                            cat: TypoCatalog): Unit = {
    val sq = spark
    import sq.implicits._
    graft.sources.IO.dropOrphanedLocation(spark, s"${name}_meta")
    Seq("max_dist" -> cat.maxDist.toString,
        "capacity" -> cat.capacity.toString,
        "fpp" -> cat.fpp.toString,
        "bloom_b64" -> java.util.Base64.getEncoder.encodeToString(cat.filterBytes))
      .toDF("key", "value").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"${name}_meta")
  }

  /** Persist `cat` as `<name>_vars` (the distinct delete-variant
    * postings) + `<name>_meta` (max_dist, the Bloom's bytes and its
    * frozen build parameters) — the postings-store posture
    * ([[graft.ext.Retrieval.buildPostingsStore]]) applied to typo
    * ingestion dedup: the seen-side state survives a driver restart, so
    * the next epoch starts from [[readTypoCatalog]] instead of a rebuild
    * scan of everything ever admitted. */
  def writeTypoCatalog(cat: TypoCatalog, name: String): Unit = {
    val spark = cat.seenVars.sparkSession
    graft.sources.IO.dropOrphanedLocation(spark, s"${name}_vars")
    cat.seenVars.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"${name}_vars")
    writeTypoMeta(spark, name, cat)
  }

  /** Reload a persisted catalog. The confirm join reads the store table
    * directly (it IS the materialization — no re-checkpoint needed). */
  def readTypoCatalog(spark: SparkSession, name: String): TypoCatalog = {
    val meta = typoMeta(spark, name)
    TypoCatalog(meta("max_dist").toInt, spark.table(s"${name}_vars"),
      java.util.Base64.getDecoder.decode(meta("bloom_b64")),
      meta("capacity").toLong, meta("fpp").toDouble)
  }

  /** Append a shard of NEWLY-ADMITTED strings to the persisted catalog
    * and return the refreshed [[TypoCatalog]]. Contract (the
    * postings-store append rules, [[graft.ext.Retrieval.appendToPostingsStore]]):
    * shard strings are DISJOINT from everything already stored — the
    * ingestion reality, since the shard is exactly an epoch's
    * [[dropSeenTypos]] survivors — so the shard's (variant, string)
    * postings are disjoint from the stored rows and the append is a pure
    * INSERT, O(shard) not O(catalog); and appends are SINGLE-WRITER (the
    * meta Bloom update is a read-modify-write). The Bloom grows by a
    * driver-side merge of a shard-sized filter built with the store's
    * frozen (capacity, fpp) — Spark filters only merge when the
    * parameters match, which is why [[TypoCatalog]] carries them. A
    * crash between the INSERT and the meta rewrite leaves the vars
    * complete but the Bloom stale by one shard: stale-Bloom misses would
    * LOSE drops, so recovery is [[repairTypoCatalogBloom]] (one pass over
    * the stored postings), never a rebuild of the seen corpus. */
  def appendToTypoCatalog(shard: DataFrame, strCol: String,
                          name: String): TypoCatalog = {
    val spark = shard.sparkSession
    val meta = typoMeta(spark, name)
    val maxDist = meta("max_dist").toInt
    val capacity = meta("capacity").toLong
    val fpp = meta("fpp").toDouble
    val shardVars = deleteVariantPostings(
        shard.select(col(strCol)).distinct(), strCol, strCol, maxDist)
      .select(col("__k"), col("__s").as("__s2")).distinct()
      .localCheckpoint()
    shardVars.write.mode(org.apache.spark.sql.SaveMode.Append)
      .saveAsTable(s"${name}_vars")
    val merged = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(
        java.util.Base64.getDecoder.decode(meta("bloom_b64"))))
    merged.mergeInPlace(buildLongBloom(
      shardVars.select(xxhash64(col("__k")).as("__h")), "__h",
      Some(capacity), fpp))
    val cat = TypoCatalog(maxDist, spark.table(s"${name}_vars"),
      serializedBloom(merged), capacity, fpp)
    writeTypoMeta(spark, name, cat)
    cat
  }

  /** Rebuild the persisted catalog's Bloom from its own vars table — the
    * crash-recovery path for an append that committed the INSERT but not
    * the meta rewrite (see [[appendToTypoCatalog]]): one pass over the
    * store, O(catalog postings), never a rescan of the seen corpus. */
  def repairTypoCatalogBloom(spark: SparkSession, name: String): TypoCatalog = {
    val meta = typoMeta(spark, name)
    val vars = spark.table(s"${name}_vars")
    val capacity = math.max(meta("capacity").toLong, vars.count())
    val cat = TypoCatalog(meta("max_dist").toInt, vars,
      serializedBloom(buildLongBloom(
        vars.select(xxhash64(col("__k")).as("__h")), "__h",
        Some(capacity), fpp = meta("fpp").toDouble)),
      capacity, meta("fpp").toDouble)
    writeTypoMeta(spark, name, cat)
    cat
  }

  /** Drop from `newDf` every arrival within Levenshtein `cat.maxDist` of
    * the prepared catalog (see [[incrementalTypo]] for the shape). */
  def dropSeenTypos(newDf: DataFrame, idCol: String, strCol: String,
                    cat: TypoCatalog,
                    checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    graft.funcs.VectorFunctions.register(newDf.sparkSession)
    val mat = CheckpointStrategy.materializer(checkpoint)
    val newVars = mat(deleteVariantPostings(newDf, idCol, strCol, cat.maxDist))
    val confirmed = mat(newVars
      .filter(graft.funcs.VectorFunctions.bloomMightContain(
        xxhash64(col("__k")), cat.filterBytes))
      .join(cat.seenVars, Seq("__k"))
      .filter(levenshtein(col("__s"), col("__s2")) <= cat.maxDist)
      .select(col("__id").as(idCol)).distinct())
    newDf.join(confirmed, Seq(idCol), "left_anti")
  }

  // ---- MinHash + LSH ----------------------------------------------------

  // 31-bit Mersenne prime: keeps a*h + b within 63 bits (ANSI-safe, no
  // overflow) while giving ample hash space for shingle sets.
  private val P31 = 2147483647L

  /** Deterministic permutation coefficients (seeded), all < 2^31. */
  private def perms(numPerm: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPerm)((rnd.nextInt(Int.MaxValue - 1).toLong + 1,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signatures: for each permutation i, min over shingles of
    * (a_i * h + b_i) mod p, with h = xxhash64(shingle) folded to 31 bits.
    * A signature is a per-document quantity, so it is computed as ONE
    * codegen'd scalar expression ([[graft.funcs.MinHashSignature]]) over the
    * per-doc distinct shingle-hash array — zero shuffles, embarrassingly
    * parallel, no aggregation buffers (the r2 UDAF formulation paid a
    * groupBy(id) shuffle plus encoder round-trips for the same mins).
    * Assumes `idCol` identifies a document uniquely (one signature per row).
    * Output: (id, sig: array<long>).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numPerm: Int = 128, k: Int = 4,
                        seed: Long = 42L): DataFrame = {
    graft.funcs.VectorFunctions.register(df.sparkSession)
    val (as, bs) = perms(numPerm, seed).unzip
    // Each projection materializes the non-cheap array the next one folds
    // over, so CollapseProject cannot duplicate the regex/shingle work;
    // shingle hashing happens inside the codegen'd signature expression.
    // coalesce makes the whole chain NON-NULLABLE (null text = empty doc):
    // otherwise the downstream band join infers isnotnull(sig) and pushes a
    // filter below these projections, re-inlining the full signature tree
    // into an interpreted per-row Filter with no CSE — measured 5-10× the
    // entire query's cost.
    df.select(col(idCol).as("id"),
        TextStats.tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .select(col("id"), shinglesOfTokens(col("__t"), k).as("__g"))
      .select(col("id"),
        graft.funcs.VectorFunctions.minhashSig(col("__g"), as.toArray, bs.toArray).as("sig"))
  }

  /** Default band-bucket size cap for the LSH candidate joins (MinHash here,
    * cosine banding in [[graft.ext.Similarity]]): a band value shared by F
    * docs contributes F² candidate rows, so one degenerate bucket (e.g.
    * millions of empty/boilerplate documents collapsing to one signature)
    * turns the candidate join quadratic. Genuine near-dup groups are small;
    * a 10k+ bucket carries no per-pair signal worth F² work. */
  val DefaultMaxBandBucket = 10000

  /** Observed-metric name prefix emitted by [[capBuckets]] (suffixed with a
    * per-call counter for uniqueness — match on the prefix). When a bucket
    * cap is active, the guard reports on the SAME action (`Dataset.observe`
    * / CollectMetrics, readable from a QueryExecutionListener or
    * StreamingQueryListener) how much banded mass it dropped:
    * `dropped_rows` ((id, band) rows in oversized buckets) and `max_bucket`
    * (the largest bucket seen). A nonzero `dropped_rows` means some group
    * exceeded the cap and emitted no pairs.
    *
    * BEST-EFFORT under AQE: Spark does not surface CollectMetrics
    * accumulators from inside adaptive query stages when the observed
    * branch feeds the candidate self-join (verified on 4.1.2; works with
    * AQE disabled or on single-consumer plans such as
    * [[bandedSignatures]] → [[capBuckets]] driven directly). Because the
    * signal can be silent exactly where it matters most, the cap's
    * semantic risk is ALSO closed structurally: [[dedupCorpus]] collapses
    * exact duplicates before the near-dup pass, so an identical-content
    * group larger than the cap can never slip through unfiltered. */
  val BucketCapMetric = "graft.lsh.bucket_cap"
  private val bucketCapIds = new java.util.concurrent.atomic.AtomicLong()

  /** The shared bucket-size guard: drop (id, bk) rows of band buckets larger
    * than `cap` via one windowed count over the same bk partitioning the
    * candidate self-join shuffles on (no extra shuffle shape). Dropped mass
    * is observable per action — see [[BucketCapMetric]] (and its AQE
    * caveat); pass an [[org.apache.spark.sql.Observation]] to read the
    * metrics programmatically on a single-consumer plan
    * ([[bucketCapReport]] does exactly that). */
  private[graft] def capBuckets(banded: DataFrame, cap: Option[Int],
      observation: Option[org.apache.spark.sql.Observation] = None): DataFrame =
    capBucketsLong(banded, cap.map(_.toLong), observation)

  /** Long-cap core of [[capBuckets]]: the windowed count is a Long, so the
    * guard compares in Long space — [[bucketCapReport]]'s uncapped probe
    * passes Long.MaxValue, which no count can exceed, making its
    * "drops 0 by construction" contract literal rather than
    * 2³¹-bounded. */
  private def capBucketsLong(banded: DataFrame, cap: Option[Long],
      observation: Option[org.apache.spark.sql.Observation]): DataFrame =
    cap match {
      case Some(c) =>
        val sized = banded.withColumn("__bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))))
        val dropped = coalesce(
          sum(when(col("__bsz") > c, 1L).otherwise(0L)), lit(0L))
          .as("dropped_rows")
        val biggest = coalesce(max(col("__bsz")), lit(0L)).as("max_bucket")
        val observed = observation match {
          case Some(o) => sized.observe(o, dropped, biggest)
          case None => sized.observe(
            s"$BucketCapMetric.${bucketCapIds.incrementAndGet()}", dropped, biggest)
        }
        observed.filter(col("__bsz") <= c).drop("__bsz")
      case None => banded
    }

  /** Dropped-mass report from [[bucketCapReport]] / [[dedupCorpusDiagnostic]]:
    * `droppedRows` = (id, band) rows in over-cap buckets (rows that emit no
    * candidate pairs), `maxBucket` = the largest band bucket seen (cap
    * headroom: how close the corpus is to losing recall), `cap` = the
    * configured cap, or None when the pipeline ran UNCAPPED (droppedRows is
    * then 0 by construction; a fabricated sentinel cap here would feed
    * downstream headroom checks a lie). */
  case class BucketCapReport(droppedRows: Long, maxBucket: Long,
                             cap: Option[Int])

  /** Measure what the band-bucket cap drops on a signature table — the
    * programmatic answer to "did the cap change my corpus?", which the
    * in-pipeline [[BucketCapMetric]] observation cannot reliably give (AQE
    * swallows CollectMetrics inside the candidate self-join's query stages).
    * Drives [[bandedSignatures]] → [[capBuckets]] SINGLE-CONSUMER, where the
    * observation provably surfaces, and pays one extra pass over the
    * signatures — a diagnostic you run when tuning the cap or auditing a
    * corpus, not on every pipeline invocation. `cap = None` measures
    * droppedRows/maxBucket for an uncapped pipeline (always 0 dropped). */
  def bucketCapReport(sigs: DataFrame,
                      cap: Option[Int] = Some(DefaultMaxBandBucket),
                      numPerm: Int = 128, bands: Int = 32): BucketCapReport = {
    val obs = org.apache.spark.sql.Observation()
    // an uncapped run still observes max_bucket (the headroom number) by
    // driving the guard with Long.MaxValue — a cap no windowed count can
    // exceed, so the filter provably drops nothing
    capBucketsLong(bandedSignatures(sigs, numPerm, bands),
        Some(cap.map(_.toLong).getOrElse(Long.MaxValue)), Some(obs))
      .write.format("noop").mode("overwrite").save()
    val row = obs.get
    BucketCapReport(row("dropped_rows").asInstanceOf[Long],
      row("max_bucket").asInstanceOf[Long], cap)
  }

  /** (id, bk) banded rows of a MinHash signature table — the candidate
    * join's input, exposed separately so diagnostics can drive it on a
    * single-consumer plan (where the [[BucketCapMetric]] observation
    * reliably surfaces). */
  def bandedSignatures(sigs: DataFrame, numPerm: Int = 128,
                       bands: Int = 32): DataFrame = {
    val rows = numPerm / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash(slice(col("sig"), b * rows + 1, rows)).as("sig"))
    }
    sigs.select(col("id"), explode(array(bandCols: _*)).as("bk"))
  }

  /** LSH candidate pairs: signatures banded into `bands` groups of
    * numPerm/bands rows; docs sharing any band hash are candidates.
    * Returns distinct (id1, id2) with id1 < id2.
    *
    * `maxBucketSize` (on by default) drops band buckets above the cap before
    * the self-join — the F² skew guard; a true pair loses recall only if
    * EVERY band it collides in is oversized. Pass `None` to disable. */
  def lshCandidates(sigs: DataFrame, numPerm: Int = 128,
                    bands: Int = 32,
                    maxBucketSize: Option[Int] = Some(DefaultMaxBandBucket),
                    checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    // OPT r19: materialize the capped (id, bk) band rows once — the q35
    // plan audit showed BOTH self-join sides re-running the full
    // minhash-signature pipeline (tokenize → shingle → 128 permutations)
    // from the parquet scan up, with no exchange reuse. The band rows are
    // skinny key/metadata pairs (guide §8: shuffle keys, not payloads), so
    // one materialization is far cheaper than a second signature pass.
    // `checkpoint` upgrades the materialization on a cluster (r20: the
    // band rows are the operator's working set — Reliable survives
    // executor loss where a local block does not).
    val buckets = CheckpointStrategy.materializer(checkpoint)(
      capBuckets(bandedSignatures(sigs, numPerm, bands), maxBucketSize))
    buckets.as("a").join(buckets.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
  }

  /** MinHash-LSH near-dup pairs, verified with exact Jaccard on the candidate
    * set only (the candidates are a tiny fraction of all pairs — this is the
    * 100 TB formulation; the exact join above is the small-data oracle).
    * Verification is a per-pair shingle-SET intersection: the corpus is
    * scanned once to build shingle sets for candidate documents only, and
    * J = |A∩B| / (|A| + |B| − |A∩B|) evaluates as array ops on the joined
    * pair — no posting-list self-join, no co-occurrence aggregation.
    *
    * `maxBucketSize` forwards to [[lshCandidates]] (default-on F² guard).
    * NB a duplicate GROUP larger than the cap shares one signature, so every
    * band bucket it fills is oversized and the whole group emits no pairs —
    * by design: enumerating its F² pairs is never what you want. Handle mass
    * exact duplicates with [[exact]] (one group row regardless of F) before
    * the near-dup pass, or pass `None` to disable the cap. */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
                        minJaccard: Double = 0.8, numPerm: Int = 128,
                        bands: Int = 32, k: Int = 4,
                        maxBucketSize: Option[Int] = Some(DefaultMaxBandBucket),
                        checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    // OPT r19: the candidate pair list feeds the id-collection AND the
    // final confirm join; un-materialized, each consumer re-ran the whole
    // banded self-join (and its signature pipeline) from scratch.
    // Candidates are a tiny fraction of all pairs by construction — one
    // cheap materialization halves the LSH work. `checkpoint` threads to
    // the band-row materialization too (r20).
    val cands = CheckpointStrategy.materializer(checkpoint)(
      lshCandidates(minhashSignatures(df, idCol, textCol, numPerm, k),
        numPerm, bands, maxBucketSize, checkpoint))
    val candIds = cands
      .select(explode(array(col("id1"), col("id2"))).as("id")).distinct()
    // the candidate-id semi-join is left to AQE: at real dup rates candidate
    // ids are an O(corpus) fraction, so a forced broadcast would build the
    // whole set on the driver and OOM at scale — AQE broadcasts only when the
    // side actually fits (same posture as removeNearDups' anti-join)
    val sets = df
      .select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("__t"))
      .select(col("id"), shinglesOfTokens(col("__t"), k).as("g"))
      .join(candIds, Seq("id"))
    val s1 = sets.select(col("id").as("id1"), col("g").as("g1"))
    val s2 = sets.select(col("id").as("id2"), col("g").as("g2"))
    cands.join(s1, Seq("id1")).join(s2, Seq("id2"))
      .withColumn("c", size(array_intersect(col("g1"), col("g2"))))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("g1")) + size(col("g2")) - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Incremental MinHash-LSH near-dup dedup: the rows of `newDf` with NO
    * Jaccard ≥ `minJaccard` near-duplicate in the frozen `seenDf` — the
    * continuous-ingestion form of [[minhashDedupPairs]] (today's crawl
    * delta against the standing corpus), completing the incremental family
    * ([[incrementalExact]] for identity, [[incrementalNear]] for Hamming,
    * [[graft.ext.Similarity.incrementalCosine]] for embeddings) with the
    * probe-then-confirm shape they share:
    *   1. the seen side's (band, bandHash) keys are computed once
    *      (materialized — at production scale persist them next to the
    *      corpus) and folded into a measured-capacity Bloom filter;
    *   2. each batch band row probes the filter (codegen, zero shuffle):
    *      batches are mostly fresh, so most rows exit here for the cost of
    *      a hash;
    *   3. survivors equi-join the seen band keys — never a cross join — to
    *      concrete (new, seen) candidate pairs, and exact shingle-set
    *      Jaccard on those pairs only confirms (LSH decides recall, the
    *      exact check decides precision, same contract as
    *      [[minhashDedupPairs]]).
    * The band-bucket cap guards the candidate join's F² term on the seen
    * side; as with the batch terminal, collapse exact duplicates (here:
    * [[incrementalExact]]) FIRST at real dup rates — an over-cap
    * identical-content group emits no candidates by design.
    *
    * RECALL CONTRACT (probabilistic, quantified): candidacy is LSH-banded,
    * so a true pair at Jaccard J that matches NO band survives dedup even
    * though an exact all-pairs check (the q119 oracle's formulation) would
    * drop it. At the defaults (numPerm = 128, bands = 32 → r = 4 rows per
    * band) the per-pair miss probability is (1 − J⁴)³²: ≈ 4.7e-8 at the
    * J = 0.8 threshold, falling to ≈ 1.6e-14 at J = 0.9 and ~0 as J → 1.
    * The q119 fixture's planted near-dups sit at J ≈ (n−3)/(n−2) ≈ 1 and
    * its rewrites at J ≈ 0, so the oracle's exact replay and the banded
    * path agree with miss mass ≪ 1e-10 over the whole corpus — the same
    * argument q41 makes for its auto-sized vector bands. */
  def incrementalMinhash(newDf: DataFrame, seenDf: DataFrame, idCol: String,
                         textCol: String, minJaccard: Double = 0.8,
                         numPerm: Int = 128, bands: Int = 32, k: Int = 4,
                         maxBucketSize: Option[Int] = Some(DefaultMaxBandBucket),
                         expectedSeen: Option[Long] = None, fpp: Double = 0.01,
                         checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val m = CheckpointStrategy.materializer(checkpoint)
    def bandKey = xxhash64(col("bk.band"), col("bk.sig"))
    // materialized once: feeds the Bloom build (+ its sizing count) and the
    // confirm join — incrementalExact's seenFp posture
    val seenBk = m(capBuckets(
      bandedSignatures(
        minhashSignatures(seenDf, idCol, textCol, numPerm, k), numPerm, bands),
      maxBucketSize)
      .select(col("id").as("sid"), col("bk"), bandKey.as("__bkh")))
    val bytes = serializedBloom(buildLongBloom(
      seenBk.select(col("__bkh")).distinct(), "__bkh", expectedSeen, fpp))
    // batch signatures materialized BEFORE the probe (the ORed-probe /
    // no-CSE lesson from incrementalNear: a lazy projection would re-run
    // the whole signature lineage under the filter)
    val newBk = m(bandedSignatures(
      minhashSignatures(newDf, idCol, textCol, numPerm, k), numPerm, bands))
    val probed = newBk.filter(
      graft.funcs.VectorFunctions.bloomMightContain(bandKey, bytes))
    // OPT r19 materialized this pair list (three consumers); r20 REVERTED
    // it after the quiet re-A/B VERDICT r19 #3 asked for: q119 reads
    // 3.26 s lazy vs 5.03 s checkpointed on the same subset — the Bloom
    // probe is so selective that the probe join + distinct recompute far
    // cheaper than the materialization job they'd amortize against
    // (the r19 measurement was taken under driver-load contamination).
    val pairs = probed.as("p")
      .join(seenBk.as("s"), col("p.bk") === col("s.bk"))
      .select(col("p.id").as("id"), col("s.sid").as("sid")).distinct()
    // exact confirm on candidate pairs only; candidate-id semi-joins are
    // left to AQE (same no-forced-broadcast posture as minhashDedupPairs)
    def sets(df: DataFrame, idc: String, out: String, gout: String) = df
      .select(col(idc).as(out),
        TextStats.tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .select(col(out), shinglesOfTokens(col("__t"), k).as(gout))
    val newSets = sets(newDf, idCol, "id", "g1")
      .join(pairs.select("id").distinct(), Seq("id"))
    val seenSets = sets(seenDf, idCol, "sid", "g2")
      .join(pairs.select("sid").distinct(), Seq("sid"))
    val confirmed = pairs.join(newSets, Seq("id")).join(seenSets, Seq("sid"))
      .withColumn("__c", size(array_intersect(col("g1"), col("g2"))))
      .withColumn("__j", col("__c").cast("double") /
        (size(col("g1")) + size(col("g2")) - col("__c")))
      .filter(col("__j") >= minJaccard)
      .select(col("id")).distinct()
    // bounded by the batch, but its plan embeds the whole probe+confirm
    // pipeline — materialize before the anti-join (incrementalNear's q65
    // union-shaped-input lesson)
    val confirmedIds = m(confirmed)
    newDf.join(confirmedIds, newDf(idCol) === confirmedIds("id"), "left_anti")
  }

  /** The full text-dedup TERMINAL: exact-duplicate collapse, then MinHash-LSH
    * near-dup pairs over the exact REPRESENTATIVES only, then connected
    * components and one anti-join keeping one document per cluster.
    *
    * Running [[exact]] first is load-bearing at scale, not just cheaper: an
    * identical-content group larger than the band-bucket cap shares one
    * signature, fills every one of its band buckets past the cap, and emits
    * ZERO pairs from [[minhashDedupPairs]] — i.e. the MOST-duplicated
    * content (empty docs, boilerplate) would pass through a bare
    * cap-guarded near-dup pass unfiltered. Collapsed to one representative
    * per fingerprint before banding, mass duplicates are removed by
    * construction and every band bucket holds distinct content only, so the
    * cap guards genuine skew instead of silently changing semantics.
    * The representative sub-corpus is a multi-consumer input (the signature
    * branch, both sides of the candidate verification, and the final
    * anti-join all read it), so it is materialized ONCE via `checkpoint` —
    * the same posture as [[nearDupClusters]]'s pair input; without it the
    * fingerprint groupBy and corpus scan would re-execute per consumer.
    * No broadcast is forced anywhere. */
  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
                  minJaccard: Double = 0.8, numPerm: Int = 128,
                  bands: Int = 32, k: Int = 4,
                  maxBucketSize: Option[Int] = Some(DefaultMaxBandBucket),
                  maxIters: Int = 20,
                  checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame =
    dedupCorpusCore(df, idCol, textCol, minJaccard, numPerm, bands, k,
      maxBucketSize, maxIters, checkpoint, diagnose = false)._1

  /** [[dedupCorpus]] with QUALITY-AWARE representative choice — the
    * [[exactKeepBest]] policy extended through the near-dup stage: each
    * exact-duplicate group keeps its highest-`scoreCol` member, and each
    * near-dup cluster then keeps ITS highest-scoring member (id ascending
    * among score ties — `min(struct(-score, id))`, deterministic where
    * `max_by` is not). The standard curation refinement over first-wins:
    * when boilerplate variants cluster, the longest / highest-quality
    * variant survives instead of whichever id sorts first. Same plan shape
    * and cap semantics as [[dedupCorpus]]; the extra cost is one
    * cluster-sized argmax aggregate. */
  def dedupCorpusKeepBest(df: DataFrame, idCol: String, textCol: String,
                          scoreCol: String,
                          minJaccard: Double = 0.8, numPerm: Int = 128,
                          bands: Int = 32, k: Int = 4,
                          maxBucketSize: Option[Int] = Some(DefaultMaxBandBucket),
                          maxIters: Int = 20,
                          checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val reps = exactKeepBest(df, idCol, textCol, scoreCol).select(col(idCol))
    val repDocs = CheckpointStrategy.materializer(checkpoint)(
      df.join(reps, Seq(idCol), "left_semi"))
    val pairs = minhashDedupPairs(repDocs, idCol, textCol, minJaccard,
      numPerm, bands, k, maxBucketSize, checkpoint)
    val clusters = nearDupClusters(pairs, maxIters, checkpoint)
    val members = clusters.join(
      repDocs.select(col(idCol).as("id"), col(scoreCol).as("__sc")), Seq("id"))
    val winners = members.groupBy(col("cluster"))
      .agg(min(struct((-col("__sc")).as("ns"), col("id").as("wid"))).as("__b"))
      .select(col("__b.wid").as("wid"))
    val drop = members.join(winners, members("id") === winners("wid"), "left_anti")
      .select(col("id"))
    repDocs.join(drop, repDocs(idCol) === drop("id"), "left_anti")
  }

  /** [[dedupCorpus]] plus the cap's [[BucketCapReport]] — for pipelines that
    * must assert "the cap dropped nothing" (or log how close it came) as a
    * first-class output rather than scrape listener metrics. The report is
    * measured over the SAME representative sub-corpus the terminal bands
    * (checkpointed once, shared by both), driven single-consumer so the
    * observation reliably surfaces; the extra cost is one
    * signature+banding pass. When `maxBucketSize` is None the report is
    * (0, maxBucket, None) — nothing can be dropped, but the headroom
    * number is still worth logging. */
  def dedupCorpusDiagnostic(df: DataFrame, idCol: String, textCol: String,
                            minJaccard: Double = 0.8, numPerm: Int = 128,
                            bands: Int = 32, k: Int = 4,
                            maxBucketSize: Option[Int] = Some(DefaultMaxBandBucket),
                            maxIters: Int = 20,
                            checkpoint: CheckpointStrategy = CheckpointStrategy.Local): (DataFrame, BucketCapReport) = {
    val (out, report) = dedupCorpusCore(df, idCol, textCol, minJaccard,
      numPerm, bands, k, maxBucketSize, maxIters, checkpoint, diagnose = true)
    (out, report.get)
  }

  /** One body for both terminals — the diagnostic variant must describe
    * exactly the pipeline [[dedupCorpus]] runs, so they cannot be two
    * hand-synced copies. */
  private def dedupCorpusCore(df: DataFrame, idCol: String, textCol: String,
                              minJaccard: Double, numPerm: Int, bands: Int,
                              k: Int, maxBucketSize: Option[Int],
                              maxIters: Int, checkpoint: CheckpointStrategy,
                              diagnose: Boolean): (DataFrame, Option[BucketCapReport]) = {
    val reps = exact(df, idCol, textCol).select(col(idCol))
    val repDocs = CheckpointStrategy.materializer(checkpoint)(
      df.join(reps, Seq(idCol), "left_semi"))
    val report =
      if (diagnose) Some(bucketCapReport(
        minhashSignatures(repDocs, idCol, textCol, numPerm, k),
        maxBucketSize, numPerm, bands))
      else None
    val pairs = minhashDedupPairs(repDocs, idCol, textCol, minJaccard,
      numPerm, bands, k, maxBucketSize, checkpoint)
    (removeNearDups(repDocs, idCol, pairs, maxIters, checkpoint), report)
  }

  // ---- SimHash ----------------------------------------------------------

  /** Shingle hasher for SimHash: [[Hasher.Xx]] (xxhash64 seed 42, fast
    * default) or [[Hasher.Md5]] (lower 64 md5 bits as two hex-substring
    * words — slower but recomputable in ANSI SQL, the hasher the DuckDB
    * correctness oracle mirrors; see [[graft.funcs.SimHashSignature]]). */
  sealed trait Hasher
  object Hasher {
    case object Xx extends Hasher
    case object Md5 extends Hasher
  }

  /** 64-bit SimHash: per bit position, sum +1/-1 over shingle hash bits; the
    * sign vector packs into one long. Per-document quantity → one codegen'd
    * scalar expression ([[graft.funcs.SimHashSignature]], hashing inside the
    * compiled loop) over the per-doc shingle array — zero shuffles (the r2
    * formulation paid a groupBy(id) shuffle for the bit-balance
    * aggregation). Assumes `idCol` identifies a document uniquely. */
  def simhash(df: DataFrame, idCol: String, textCol: String, k: Int = 4,
              hasher: Hasher = Hasher.Xx): DataFrame = {
    graft.funcs.VectorFunctions.register(df.sparkSession)
    // coalesce keeps the chain non-nullable — see minhashSignatures for why
    // (inferred isnotnull(sig) would re-inline the tree below the block join)
    df.select(col(idCol).as("id"),
        TextStats.tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .select(col("id"), shinglesOfTokens(col("__t"), k).as("__g"))
      .select(col("id"),
        graft.funcs.VectorFunctions.simhashSig(col("__g"),
          useMd5 = hasher == Hasher.Md5).as("simhash"))
  }

  /** Hamming near-dup pairs over ANY precomputed 64-bit signature table
    * (`id`, `sig`) — SimHash text signatures, image dHashes, audio
    * fingerprints: blocked on 16-bit signature quarters (a pair within
    * distance 3 must agree on at least one of 4 blocks — pigeonhole), so
    * the candidate generation is an equi-join on the block key, never a
    * cross join. Returns distinct (id1, id2, dist) with id1 < id2 and
    * dist ≤ `maxDist`. */
  def hammingPairs(sigs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 4,
      "blocking scheme assumes 0 <= maxDist <= 3 (4 blocks)")
    // OPT r19: both self-join sides re-executed the caller's signature
    // lineage (SimHash over text, or a full image/audio/video DECODE for
    // the media callers) — materialize the skinny (id, sig) rows once
    val sigsM = sigs.localCheckpoint()
    val blocks = (0 until 4).map(b =>
      struct(lit(b).as("blk"),
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("v")))
    val keyed = sigsM.select(col("id"), col("sig"), explode(array(blocks: _*)).as("bk"))
    val hamming = bit_count(col("a.sig").bitwiseXOR(col("b.sig")))
    keyed.as("a").join(keyed.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"), hamming.as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Incremental Hamming dedup over ANY precomputed 64-bit signature
    * tables (`id`, `sig`) — the media-modality member of the incremental
    * family (image dHash, acoustic fingerprints, clip hashes from
    * [[graft.ext.Multimodal]]): the rows of `newSigs` with NO `seenSigs`
    * signature within `maxDist`. maxDist 0 probes a Bloom over the seen
    * signatures themselves then confirms with an equality semi-join;
    * 1–3 probes the four 16-bit pigeonhole block keys and confirms with
    * the popcount join ([[incrementalNear]]'s engine, signature-table-in
    * instead of text-in — compute signatures once, reuse them across the
    * pairs AND incremental paths). Returns the fresh (id, sig) rows. */
  def incrementalHamming(newSigs: DataFrame, seenSigs: DataFrame,
                         maxDist: Int = 0,
                         expectedSeen: Option[Long] = None, fpp: Double = 0.01,
                         checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"pigeonhole blocking assumes maxDist <= 3 (4 blocks), got $maxDist")
    graft.funcs.VectorFunctions.register(newSigs.sparkSession)
    val m = CheckpointStrategy.materializer(checkpoint)
    // both sides materialized (the incrementalNear no-CSE/probe lessons)
    val seen = m(seenSigs.select(col("sig").as("__sig")).distinct())
    val nw = m(newSigs.select(col("id"), col("sig").as("simhash")))
    val dropIds =
      if (maxDist == 0) {
        val bytes = serializedBloom(
          buildLongBloom(seen, "__sig", expectedSeen, fpp))
        nw.filter(graft.funcs.VectorFunctions.bloomMightContain(
            col("simhash"), bytes))
          .join(seen, col("simhash") === col("__sig"), "left_semi")
          .select(col("id"))
      } else nearSeenIds(nw, seen, maxDist, expectedSeen, fpp)
    val confirmed = m(dropIds)
    newSigs.join(confirmed, Seq("id"), "left_anti")
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist — [[simhash]]
    * signatures through the generic [[hammingPairs]] pigeonhole join. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, k: Int = 4,
                   hasher: Hasher = Hasher.Xx): DataFrame =
    hammingPairs(
      simhash(df, idCol, textCol, k, hasher)
        .select(col("id"), col("simhash").as("sig")), maxDist)
}
