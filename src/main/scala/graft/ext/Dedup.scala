package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.funcs.ArrayAggregates

/** Deduplication operators for training-data pipelines: exact (fingerprint
  * hash-groupBy), n-gram Jaccard similarity join, MinHash+LSH, and SimHash.
  * (Beyond the reference surface; required by the build brief.)
  *
  * Scale design: every method is a shuffle-on-key pipeline — fingerprints
  * group by hash; the Jaccard join is an inverted-index join on shingles
  * (never a cross join) with a stop-gram document-frequency cap on by
  * default; LSH banding turns all-pairs similarity into a band-bucket
  * equi-join, the only formulation that survives 100 TB. Signature
  * aggregation (MinHash mins, SimHash bit balances) runs through single
  * array-buffer aggregates ([[graft.funcs.ArrayAggregates]]) — one narrow
  * aggregate column instead of the 128/64 independent aggregate columns of
  * the naive formulation.
  */
object Dedup {

  /** Word k-shingles from an ALREADY MATERIALIZED token-array column
    * (distinct, order-insensitive set). Taking the array rather than the raw
    * text matters for performance: higher-order-function lambdas are
    * interpreted without common-subexpression elimination, so an inline
    * `split(text)` here would be re-evaluated by every `element_at` call —
    * O(tokens²) regex work per document. */
  def shinglesOfTokens(t: Column, k: Int = 4): Column =
    when(size(t) >= k,
      array_distinct(transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(t, (i + j + 1))): _*))))
      .otherwise(array(concat_ws(" ", t)))

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

  /** Exploded, distinct (id, shingle) posting list. The token array is
    * materialized in its own projection first; CollapseProject keeps it
    * separate (non-cheap expression referenced many times), so the regex
    * split runs once per document instead of once per element_at. */
  private def postings(df: DataFrame, idCol: String, textCol: String, k: Int) =
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
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        minJaccard: Double = 0.8, k: Int = 4,
                        maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val post0 = postings(df, idCol, textCol, k)
    val post = maxDocFreq match {
      case Some(m) =>
        val freq = post0.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") <= m)
        post0.join(freq.select("g"), "g")
      case None => post0
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
    */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // materialize the (possibly expensive) pair pipeline ONCE: edges and the
    // initial labels both derive from it, and every propagation round joins
    // against edges — without this the upstream similarity join would
    // re-execute each round
    val p = pairs.select(col("id1"), col("id2")).localCheckpoint()
    val edges = p.unionByName(p.select(col("id2").as("id1"), col("id1").as("id2")))
    var labels = p
      .select(explode(array(col("id1"), col("id2"))).as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint()
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      val nbrMin = labels.join(edges, labels("id") === edges("id1"))
        .groupBy(edges("id2").as("id"))
        .agg(min(col("cluster")).as("__nbr"))
      // carry the previous label through the checkpoint so convergence
      // detection is a local filter over materialized rows, not another join
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("cluster").as("__old"),
          least(col("cluster"), coalesce(col("__nbr"), col("cluster"))).as("cluster"))
        .localCheckpoint()
      converged = next.filter(col("cluster") =!= col("__old")).isEmpty
      labels = next.select(col("id"), col("cluster"))
      iters += 1
    }
    labels
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
    * One aggregation over the exploded posting list — a single shuffle on id
    * — with the whole 128-slot signature in one array buffer
    * ([[ArrayAggregates.MinHashAgg]]); same math and same mins as the
    * 128-column formulation it replaces. Output: (id, sig: array<long>).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numPerm: Int = 128, k: Int = 4,
                        seed: Long = 42L): DataFrame = {
    val post = postings(df, idCol, textCol, k)
      .withColumn("h", pmod(xxhash64(col("g")), lit(P31)))
    val (as, bs) = perms(numPerm, seed).unzip
    post.groupBy(col("id"))
      .agg(ArrayAggregates.minhash(as.toArray, bs.toArray)(col("h")).as("sig"))
  }

  /** LSH candidate pairs: signatures banded into `bands` groups of
    * numPerm/bands rows; docs sharing any band hash are candidates.
    * Returns distinct (id1, id2) with id1 < id2. */
  def lshCandidates(sigs: DataFrame, numPerm: Int = 128,
                    bands: Int = 32): DataFrame = {
    val rows = numPerm / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash(slice(col("sig"), b * rows + 1, rows)).as("sig"))
    }
    val buckets = sigs.select(col("id"), explode(array(bandCols: _*)).as("bk"))
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
    * pair — no posting-list self-join, no co-occurrence aggregation. */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
                        minJaccard: Double = 0.8, numPerm: Int = 128,
                        bands: Int = 32, k: Int = 4): DataFrame = {
    val cands = lshCandidates(minhashSignatures(df, idCol, textCol, numPerm, k), numPerm, bands)
    val candIds = cands
      .select(explode(array(col("id1"), col("id2"))).as("id")).distinct()
    val sets = df
      .select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("__t"))
      .select(col("id"), shinglesOfTokens(col("__t"), k).as("g"))
      .join(broadcast(candIds), Seq("id"))
    val s1 = sets.select(col("id").as("id1"), col("g").as("g1"))
    val s2 = sets.select(col("id").as("id2"), col("g").as("g2"))
    cands.join(s1, Seq("id1")).join(s2, Seq("id2"))
      .withColumn("c", size(array_intersect(col("g1"), col("g2"))))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("g1")) + size(col("g2")) - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit shingle hash as two non-negative 32-bit words (low, high) from
    * xxhash64 — the fast default hasher. */
  def xxWords(g: Column): (Column, Column) = {
    val h = xxhash64(g)
    (h.bitwiseAND(lit(0xFFFFFFFFL)), shiftrightunsigned(h, 32))
  }

  /** 64-bit shingle hash as two 32-bit words taken from the LOWER 64 bits of
    * md5 (hex chars 25..32 = low word, 17..24 = high word). Slower than
    * xxhash64 but recomputable in ANSI SQL (`md5` + hex substring + CAST) —
    * the hasher the DuckDB correctness oracle can mirror exactly. */
  def md5Words(g: Column): (Column, Column) = {
    val m = md5(g)
    (conv(substring(m, 25, 8), 16, 10).cast("long"),
     conv(substring(m, 17, 8), 16, 10).cast("long"))
  }

  /** 64-bit SimHash: per bit position, sum +1/-1 over shingle hash bits; the
    * sign vector packs into one long. Single shuffle on id with the 64 bit
    * balances in one array buffer ([[ArrayAggregates.BitBalanceAgg]]).
    * `words` picks the shingle hasher (default xxhash64; [[md5Words]] for
    * SQL-oracle-able signatures). */
  def simhash(df: DataFrame, idCol: String, textCol: String, k: Int = 4,
              words: Column => (Column, Column) = xxWords): DataFrame = {
    val (w0, w1) = words(col("g"))
    val post = postings(df, idCol, textCol, k)
      .select(col("id"), w0.as("w0"), w1.as("w1"))
    val sums = post.groupBy(col("id"))
      .agg(ArrayAggregates.bitBalance(col("w0"), col("w1")).as("s"))
    val sig = (0 until 64).map(i =>
      when(element_at(col("s"), i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, blocked on
    * 16-bit signature quarters (a pair within distance 3 must agree on at
    * least one of 4 blocks — pigeonhole), so no cross join. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, k: Int = 4,
                   words: Column => (Column, Column) = xxWords): DataFrame = {
    require(maxDist < 4, "blocking scheme assumes maxDist <= 3 (4 blocks)")
    val sigs = simhash(df, idCol, textCol, k, words)
    val blocks = (0 until 4).map(b =>
      struct(lit(b).as("blk"),
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("v")))
    val keyed = sigs.select(col("id"), col("simhash"), explode(array(blocks: _*)).as("bk"))
    val hamming = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    keyed.as("a").join(keyed.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"), hamming.as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
