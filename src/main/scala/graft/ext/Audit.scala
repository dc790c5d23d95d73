package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus auditing and deterministic training-order operators.
  * (Beyond the reference surface; required by the build brief.) */
object Audit {

  /** Per-source corpus audit in ONE scan: the report every curation run
    * wants before and after a pipeline stage — volume, duplication, and
    * quality per source, comparable across runs because every number is an
    * exact integer or a ratio of exact integers. Columns per source:
    *   - `docs`, `tokens_sum`, `chars_sum` — volume
    *   - `distinct_docs` — exact distinct content fingerprints; `dup_rate`
    *     = 1 − distinct/docs
    *   - `short_docs` — documents under `shortTokens` tokens
    *   - `quality_sum` (integer points) and `avg_quality`, `avg_tokens`
    *
    * Scale shape: one groupBy(source) aggregate; the exact distinct count
    * adds Spark's standard partial-distinct expansion (still one logical
    * pass, map-side combined). Output is source-cardinality-sized. */
  def corpusReport(df: DataFrame, textCol: String, sourceCol: String,
                   shortTokens: Int = 30): DataFrame = {
    require(shortTokens >= 0, s"shortTokens must be >= 0, got $shortTokens")
    val t = coalesce(col(textCol), lit(""))
    df.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("docs"),
        sum(TextStats.tokenCount(t).cast("long")).as("tokens_sum"),
        sum(length(t).cast("long")).as("chars_sum"),
        countDistinct(TextStats.fingerprint(t)).as("distinct_docs"),
        sum(when(TextStats.tokenCount(t) < shortTokens, 1L).otherwise(0L))
          .as("short_docs"),
        sum(TextStats.qualityPoints(t).cast("long")).as("quality_sum"))
      .withColumn("dup_rate",
        lit(1.0) - col("distinct_docs").cast("double") / col("docs").cast("double"))
      .withColumn("avg_quality",
        col("quality_sum").cast("double") / col("docs").cast("double"))
      .withColumn("avg_tokens",
        col("tokens_sum").cast("double") / col("docs").cast("double"))
  }

  /** Snapshot diff between two corpus versions — the audit of what a
    * curation run actually did: per id, `added` (only in `newDf`),
    * `removed` (only in `oldDf`), `changed` (both, content fingerprint
    * differs), `unchanged`. One full-outer join on the id; content
    * identity is [[TextStats.fingerprint]] (whitespace-normalized
    * lowercase), so a reformatted doc counts as unchanged — pass a
    * stricter key column yourself if byte identity matters. Null text
    * fingerprints as the empty document (a present row never reads as
    * absent). Returns (idCol, status, fp_old, fp_new). */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    def fp(df: DataFrame, out: String) = df.select(col(idCol).as("id"),
      TextStats.fingerprint(coalesce(col(textCol), lit(""))).as(out))
    fp(oldDf, "fp_old").join(fp(newDf, "fp_new"), Seq("id"), "full_outer")
      .withColumn("status",
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged"))
      .withColumnRenamed("id", idCol)
  }

  /** Deterministic global training-order shuffle: every (document, epoch)
    * pair gets a reproducible pseudo-random placement — `shuffle_part` (a
    * stable partition in [0, numParts)) and `shuffle_key` (the md5 sort key
    * within the partition) — and the returned frame IS laid out that way
    * (repartitioned on the part, sorted within partitions by the key), so
    * writing it out and reading shards in (part, key) order replays the
    * exact epoch order on any cluster. Different epochs decorrelate (the
    * epoch is folded into the hash), which is the epoch-reshuffle training
    * loops expect; no RNG state anywhere, so the order is auditable and
    * engine-independent — the same determinism-over-RNG trade as
    * [[Corpus.hashSplit]].
    *
    * Scale shape: one hash repartition + per-partition sort (no global
    * sort, no driver state). At 100 TB pick `numParts` to match the
    * target shard count. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   numParts: Int, salt: String = "graft:shuffle"): DataFrame = {
    require(numParts >= 1, s"numParts must be >= 1, got $numParts")
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val key = md5(concat(col(idCol).cast("string"),
      lit(s":$epoch:" + salt)))
    // part from the SAME digest's leading 32 bits — one hash per row
    val part = pmod(conv(substring(key, 1, 8), 16, 10).cast("long"),
      lit(numParts.toLong)).cast("int")
    // repartition HASHES the part value, so a physical partition may hold
    // several logical parts — the sort leads with the part so every
    // logical shard is still one contiguous, key-sorted run
    df.withColumn("shuffle_key", key)
      .withColumn("shuffle_part", part)
      .repartition(numParts, col("shuffle_part"))
      .sortWithinPartitions(col("shuffle_part"), col("shuffle_key"))
  }

  /** Per-source token-length histogram: one row per (source, bucket) with
    * the document count and exact token sum — the length-distribution audit
    * every mixture decision reads (truncation risk at the context limit,
    * short-doc mass per source) without ever ranking the corpus. One
    * groupBy scan, histogram-sized output; buckets are
    * `floor(tokens / bucketWidth)` so the report is integer-exact in both
    * engines. */
  def lengthHistogram(df: DataFrame, textCol: String, sourceCol: String,
                      bucketWidth: Int = 50): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val toks = TextStats.tokenCount(coalesce(col(textCol), lit("")))
    df.select(col(sourceCol).as("source"), toks.as("__tc"))
      .groupBy(col("source"),
        floor(col("__tc") / lit(bucketWidth)).as("len_bucket"))
      .agg(count(lit(1)).as("docs"), sum(col("__tc")).as("tokens"))
      .withColumn("bucket_lo", col("len_bucket") * bucketWidth)
  }
}
