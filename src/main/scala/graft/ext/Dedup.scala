package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (fingerprint
  * hash-groupBy), n-gram Jaccard similarity join, MinHash+LSH, and SimHash.
  * (Beyond the reference surface; required by the build brief.)
  *
  * Scale design: every method is a shuffle-on-key pipeline — fingerprints
  * group by hash; the Jaccard join is an inverted-index join on shingles
  * (never a cross join); LSH banding turns all-pairs similarity into a
  * band-bucket equi-join, the only formulation that survives 100 TB.
  */
object Dedup {

  /** Word k-shingles of a document (distinct, order-insensitive set). */
  def shingles(text: Column, k: Int = 4): Column = {
    val t = TextStats.tokens(text)
    when(size(t) >= k,
      array_distinct(transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(t, (i + j + 1))): _*))))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** Exact dedup: group by content fingerprint, keep the smallest id.
    * One shuffle on the fingerprint; at scale this is the cheapest possible
    * formulation (map-side partial aggregation applies). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextStats.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"), col("fp"))

  /** Exploded, distinct (id, shingle) posting list. */
  private def postings(df: DataFrame, idCol: String, textCol: String, k: Int) =
    df.select(col(idCol).as("id"), explode(shingles(col(textCol), k)).as("g")).distinct()

  /** Exact n-gram Jaccard similarity join: pairs with |A∩B|/|A∪B| >= minJaccard.
    * Inverted-index join on shingles: co-occurrence counts per pair, then
    * J = c / (n1 + n2 - c). Skew note: at corpus scale, drop shingles with
    * document frequency above `maxDocFreq` (stop-grams dominate the join and
    * add no discriminative signal).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        minJaccard: Double = 0.8, k: Int = 4,
                        maxDocFreq: Option[Int] = None): DataFrame = {
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
    * Computed as one aggregation over the exploded posting list — a single
    * shuffle on id.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numPerm: Int = 128, k: Int = 4,
                        seed: Long = 42L): DataFrame = {
    val post = postings(df, idCol, textCol, k)
      .withColumn("h", pmod(xxhash64(col("g")), lit(P31)))
    val aggs = perms(numPerm, seed).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * lit(a) + lit(b)) % P31).as(s"mh_$i")
    }
    post.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: signatures banded into `bands` groups of
    * numPerm/bands rows; docs sharing any band hash are candidates.
    * Returns distinct (id1, id2) with id1 < id2. */
  def lshCandidates(sigs: DataFrame, numPerm: Int = 128,
                    bands: Int = 32): DataFrame = {
    val rows = numPerm / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((0 until rows).map(r => col(s"mh_${b * rows + r}")): _*).as("sig"))
    }
    val buckets = sigs.select(col("id"), explode(array(bandCols: _*)).as("bk"))
    buckets.as("a").join(buckets.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
  }

  /** MinHash-LSH near-dup pairs, verified with exact Jaccard on the candidate
    * set only (the candidates are a tiny fraction of all pairs — this is the
    * 100 TB formulation; the exact join above is the small-data oracle). */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
                        minJaccard: Double = 0.8, numPerm: Int = 128,
                        bands: Int = 32, k: Int = 4): DataFrame = {
    val cands = lshCandidates(minhashSignatures(df, idCol, textCol, numPerm, k), numPerm, bands)
    // exact verification restricted to docs that appear in any candidate pair
    // — the corpus-scale win: the shingle join runs over candidates only
    val candIds = cands
      .select(explode(array(col("id1"), col("id2"))).as("id")).distinct()
    val post = postings(df, idCol, textCol, k).join(broadcast(candIds), Seq("id"))
    val sizes = post.groupBy("id").agg(count(lit(1)).as("n"))
    val co = post.as("a").join(post.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(cands), Seq("id1", "id2")) // keep candidate pairs only
    co.join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n", "n1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n", "n2"), "id2")
      .withColumn("jaccard", col("c").cast("double") / (col("n1") + col("n2") - col("c")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash: per bit position, sum +1/-1 over shingle hashes; the
    * sign vector packs into one long. Computed via explode + 64 conditional
    * sums — single shuffle on id. */
  def simhash(df: DataFrame, idCol: String, textCol: String, k: Int = 4): DataFrame = {
    val post = postings(df, idCol, textCol, k).withColumn("h", xxhash64(col("g")))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"s_$i")
    }
    val sums = post.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
      when(col(s"s_$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, blocked on
    * 16-bit signature quarters (a pair within distance 3 must agree on at
    * least one of 4 blocks — pigeonhole), so no cross join. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, k: Int = 4): DataFrame = {
    require(maxDist < 4, "blocking scheme assumes maxDist <= 3 (4 blocks)")
    val sigs = simhash(df, idCol, textCol, k)
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
