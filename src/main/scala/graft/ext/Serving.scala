package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inference-serving-side corpus preparation — the operations a SERVING
  * fleet (not a trainer) wants answered about a prompt corpus before it
  * arrives. First resident: prefix-cache planning in the vLLM /
  * RadixAttention mold (Kwon et al. 2023's PagedAttention caches KV state
  * in fixed-size token blocks keyed by the hash of the block's full
  * prefix; Zheng et al. 2023's RadixAttention shares those blocks across
  * requests with a radix tree over token prefixes). Given a prompt
  * corpus, [[prefixCacheGroups]] computes exactly the block-granular
  * sharing structure such a cache would discover at runtime — which
  * prompts hit a warm prefix, how deep, and which cache line they share —
  * so a batch scheduler can route same-prefix requests to the same
  * replica and a capacity planner can size the KV pool by UNIQUE blocks
  * rather than total tokens.
  *
  * Reference behavior: flatbread has no serving layer; this follows the
  * public vLLM block-hash convention (a block's key covers its whole
  * prefix, so equal keys mean equal prefixes — no partial-block sharing).
  */
object Serving {

  private def requireFresh(df: DataFrame, op: String, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"$op reserves column name(s) ${clash.mkString(", ")} (would overwrite " +
        s"or drop the existing column); rename the input column(s) first")
  }

  /** PREFIX-CACHE GROUPING — block-granular prefix sharing over a prompt
    * corpus, the batch analogue of what a PagedAttention prefix cache
    * computes online. Each prompt's token stream is cut into
    * `blockSize`-token FULL blocks (the trailing partial block is never
    * cacheable — the vLLM rule: a block is keyed only once it is full);
    * block k's cache key is the chained hash
    * `chain_k = md5(chain_{k-1} || md5(tokens of block k))` with
    * `chain_0 = ""`, so equal keys mean equal ENTIRE prefixes, never just
    * equal k-th blocks. Two prompts share a cache line exactly when their
    * chain keys collide.
    *
    * Output (one row per input row, all input columns kept):
    *  - `n_toks`, `n_blocks` (= n_toks DIV blockSize — full blocks only);
    *  - `shared_blocks`: the DEEPEST k whose chain key occurs in ≥ 2
    *    prompts (0 = no warm prefix anywhere in the corpus);
    *  - `reuse_toks` (= shared_blocks · blockSize): KV tokens a second
    *    arrival reuses from a warm cache — summed over the corpus this is
    *    the prefill compute the cache saves;
    *  - `prefix_group`: the chain key AT that depth (null when 0) — the
    *    cache-affinity routing key: prompts with equal `prefix_group`
    *    share their longest warm prefix, so a scheduler co-locating a
    *    group maximizes hits. `count(distinct chain)` over the exploded
    *    stream (one aggregate away) is the radix tree's node count = the
    *    KV pool's unique-block footprint.
    *
    * Scale shape: the chain build is one aggregate HOF per row (the
    * running fold carries (last chain, list) — O(blocks²) 32-char copies
    * per row, bounded by prompt length, never corpus-global); the only
    * shuffles are the chain-keyed count, the doc-keyed deepest-shared
    * aggregate, and the id equi-join back — all on the (id, k, chain)
    * stream, `tokens/blockSize`-sized, a fraction of the token stream
    * itself. The deepest-shared argmax is one `max(struct(k, chain))`
    * (k is unique per doc, so the struct comparison never reaches the
    * payload; partial map-side combine applies). A corpus-hot chain (a
    * system preamble shared by a large share of prompts) skews the
    * chain-keyed exchanges: the count collapses map-side before the
    * wire, and the count-join is AQE-skew-split eligible — the reason
    * this is a groupBy+join, not a per-chain window. The chain build
    * runs in both branches of that join and the raw input once more for
    * the output join — callers with an expensive upstream materialize it
    * first, the [[Perplexity.perplexityBuckets]] discipline. */
  def prefixCacheGroups(df: DataFrame, idCol: String, toksCol: String,
                        blockSize: Int = 16): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    requireFresh(df, "prefixCacheGroups", "n_toks", "n_blocks",
      "shared_blocks", "reuse_toks", "prefix_group", "__t", "__nb", "__bh",
      "__chains", "__k", "__chain", "__cnt", "__mx")
    val B = blockSize
    val toks = coalesce(col(toksCol),
      expr(s"CAST(array() AS ${df.schema(toksCol).dataType.sql})"))

    // block hashes pinned into their own projection BEFORE the chain fold
    // (HOF lambdas re-evaluate free subtrees per element — the no-CSE rule)
    val chained = df
      .select(col(idCol), toks.as("__t"))
      .withColumn("__nb", expr(s"size(__t) DIV $B").cast("int"))
      .withColumn("__bh",
        when(col("__nb") < 1, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), col("__nb")),
            k => md5(concat_ws("\u001f",
              slice(col("__t"), ((k - lit(1)) * B + lit(1)).cast("int"), lit(B)))))))
      .withColumn("__chains", aggregate(
        col("__bh"),
        struct(lit("").as("c"), array().cast("array<string>").as("l")),
        (acc, x) => {
          // md5 evaluated twice per step (once per field — no CSE inside
          // HOF lambdas); 2 hashes of 64 chars per block, negligible
          val nc = md5(concat(acc.getField("c"), x))
          struct(nc.as("c"), concat(acc.getField("l"), array(nc)).as("l"))
        },
        acc => acc.getField("l")))
      .select(col(idCol), col("__chains"))

    // (id, k, chain) stream — one row per FULL block of every prompt
    val stream = chained
      .select(col(idCol),
        posexplode_outer(col("__chains")).as(Seq("__k0", "__chain")))
      .filter(col("__k0").isNotNull)
      .select(col(idCol), (col("__k0") + 1).cast("int").as("__k"), col("__chain"))

    // prompts sharing chain_k = prompts whose entire first k blocks match
    val cnt = stream.groupBy(col("__chain")).agg(count(lit(1)).as("__cnt"))

    // deepest shared depth + its chain key: k unique per doc, so the
    // struct max is decided by k alone and combines map-side
    val deepest = stream.join(cnt, Seq("__chain"))
      .groupBy(col(idCol))
      .agg(max(when(col("__cnt") >= 2,
        struct(col("__k").as("k"), col("__chain").as("g")))).as("__mx"))

    df.withColumn("n_toks", size(toks))
      .withColumn("n_blocks", expr(s"n_toks DIV $B").cast("int"))
      .join(deepest, Seq(idCol), "left")
      .withColumn("shared_blocks",
        coalesce(col("__mx").getField("k"), lit(0)).cast("int"))
      .withColumn("reuse_toks", (col("shared_blocks") * B).cast("int"))
      .withColumn("prefix_group", col("__mx").getField("g"))
      .drop("__mx")
  }

  /** SPECULATIVE-DECODING ACCEPTANCE audit (Leviathan et al. 2023 /
    * Chen et al. 2023): given per-request DRAFT tokens (the cheap model's
    * proposal) and TARGET tokens (what the big model actually emits —
    * greedy, so acceptance is exact prefix agreement), compute the
    * quantities a serving fleet sizes speculative decoding with:
    *  - `n_draft`, `n_target`: proposal / reference lengths;
    *  - `n_accept`: the longest common PREFIX length — the draft tokens
    *    the target model verifies and keeps in one step;
    *  - `accept_rate` = n_accept / n_draft (one IEEE division; NULL when
    *    the draft is empty) — the published per-token acceptance α;
    *  - `toks_per_step` = min(n_accept + 1, n_target): tokens emitted
    *    per target-model forward pass (the accepted run plus the free
    *    correction token, capped by the reference running out) — the
    *    speedup numerator in the paper's expected-tokens formula.
    * NULL arrays count as empty. Zero shuffle — the prefix scan is
    * `array_position` over the zipped equality stream, pure per-row
    * column algebra; aggregate corpus-level α is one mean away. */
  def specAcceptance(df: DataFrame, idCol: String, draftCol: String,
                     targetCol: String): DataFrame = {
    requireFresh(df, "specAcceptance", "n_draft", "n_target", "n_accept",
      "accept_rate", "toks_per_step", "__mis")
    def toksOf(c: String): Column = coalesce(col(c),
      expr(s"CAST(array() AS ${df.schema(c).dataType.sql})"))
    val d = toksOf(draftCol)
    val t = toksOf(targetCol)
    // equality stream over the common length; first mismatch position is
    // 1-based (0 = no mismatch → the whole common length is accepted)
    val mis = array_position(
      zip_with(slice(d, lit(1), least(size(d), size(t))),
        slice(t, lit(1), least(size(d), size(t))), (a, b) => a === b),
      false)
    df.withColumn("n_draft", size(d))
      .withColumn("n_target", size(t))
      .withColumn("__mis", mis)
      .withColumn("n_accept",
        when(col("__mis") > 0, col("__mis") - 1)
          .otherwise(least(col("n_draft"), col("n_target")).cast("long"))
          .cast("int"))
      .withColumn("accept_rate", when(col("n_draft") > 0,
        col("n_accept").cast("double") / col("n_draft").cast("double")))
      .withColumn("toks_per_step",
        least(col("n_accept") + 1, col("n_target")).cast("int"))
      .drop("__mis")
  }
}
