package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-based text evaluation metrics — the scoring half of a
  * generation pipeline (rejection sampling keeps candidates NEAR a
  * reference; distillation audits a student against teacher outputs;
  * regression suites compare model versions on a frozen set). First
  * resident: BLEU (Papineni et al. 2002) with Lin & Och 2004 add-one
  * smoothing for the higher orders — modified (clipped) n-gram precision,
  * brevity penalty, geometric mean — computed exactly from integer match
  * counts so the oracle replays every count and the final score is one
  * fixed IEEE expression over identical operands (rounded to 6 dp: `ln`/
  * `exp` are libm calls, the one place engines may differ in the last
  * ulp — the q90 discipline).
  *
  * Reference behavior: flatbread has no eval layer; the metric follows
  * the published BLEU definition (single reference; clipping =
  * `min(cand_count, ref_count)` per distinct gram).
  */
object Eval {

  private def requireFresh(df: DataFrame, op: String, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"$op reserves column name(s) ${clash.mkString(", ")} (would overwrite " +
        s"or drop the existing column); rename the input column(s) first")
  }

  /** BLEU-4 per (candidate, reference) row. Input: token arrays in
    * `candCol` / `refCol`. Output adds, per row:
    *  - `c_len`, `r_len`: token counts;
    *  - `m1..m4`: CLIPPED n-gram matches (Σ over distinct cand grams of
    *    `min(cand_count, ref_count)`) — exact integers;
    *  - `t1..t4`: candidate n-gram totals (`max(c_len − n + 1, 0)` —
    *    pure arithmetic, never counted from the stream);
    *  - `bp`: brevity penalty `min(1, exp(1 − r_len/c_len))`, 6 dp;
    *  - `bleu`: `bp · exp(¼·Σₙ ln pₙ)` with `p1 = m1/t1` unsmoothed and
    *    `pₙ = (mₙ+1)/(tₙ+1)` for n ≥ 2 (Lin & Och add-one — a zero at a
    *    higher order dents the score instead of zeroing it), 6 dp.
    * Conventions (documented, asserted by spec): `bleu`/`bp` are NULL
    * when the candidate is empty, the reference is empty, or the
    * candidate is shorter than 4 tokens (t4 = 0 — the order-4 precision
    * is undefined); `bleu = 0` when m1 = 0 (no unigram overlap — the
    * limit of the formula, written explicitly because `ln(0)` is NULL in
    * Spark and −inf in DuckDB). Corpus BLEU is one aggregate away: sum
    * the integer columns, apply the same expression.
    *
    * Scale shape: one tagged-gram explode per side (4·tokens rows, the
    * gram stream), two (id, n, gram) counting aggregates, one equi-join
    * between them (clipping needs only grams the CANDIDATE has — left
    * join, absent ref count = 0), one per-(id, n) sum and one per-id
    * pivot — every shuffle is gram-stream-sized or smaller, nothing
    * corpus-global. The gram arrays are built in their own projection
    * before the explode (generators rebuild their array per emitted row
    * — the no-CSE rule). */
  /** SELF-CONSISTENCY MAJORITY VOTE (Wang et al. 2022): collapse sampled
    * candidate answers per prompt to the modal answer. One row per
    * distinct `idCol`: `n_votes` (non-null answers — a failed extraction
    * is not a vote), `n_null`, `vote_answer` (most frequent; ties break
    * to the LEXICOGRAPHICALLY SMALLEST answer — deterministic, no sample
    * order dependence), `vote_count`, and `vote_frac`
    * (= vote_count / n_votes, an exact IEEE division of the two integers
    * — the agreement score RLHF-style filtering thresholds on). All
    * answers null → null vote columns.
    *
    * Scale shape: one (id, answer) count, one per-id argmax via
    * `min(struct(−count, answer))` — the comparison IS the tie-break, no
    * payload, partial map-side combine — and one per-id totals aggregate
    * joined back. Everything is keyed by id; nothing corpus-global. */
  def majorityVote(df: DataFrame, idCol: String,
                   answerCol: String): DataFrame = {
    requireFresh(df, "majorityVote", "n_votes", "n_null", "vote_answer",
      "vote_count", "vote_frac", "__cnt", "__mx")
    val votes = df.filter(col(answerCol).isNotNull)
      .groupBy(col(idCol), col(answerCol))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("__cnt")).as("nc"),
        col(answerCol).as("a"))).as("__mx"))
    df.groupBy(col(idCol))
      .agg(sum(when(col(answerCol).isNotNull, 1L).otherwise(0L)).as("n_votes"),
        sum(when(col(answerCol).isNull, 1L).otherwise(0L)).as("n_null"))
      .join(votes, Seq(idCol), "left")
      .withColumn("vote_answer", col("__mx").getField("a"))
      .withColumn("vote_count", (-col("__mx").getField("nc")).cast("long"))
      .withColumn("vote_frac",
        col("vote_count").cast("double") / col("n_votes").cast("double"))
      .drop("__mx")
  }

  def bleuScore(df: DataFrame, idCol: String, candCol: String,
                refCol: String): DataFrame = {
    requireFresh(df, "bleuScore", "c_len", "r_len",
      "m1", "m2", "m3", "m4", "t1", "t2", "t3", "t4", "bp", "bleu",
      "__cg", "__rg", "__n", "__g", "__cc", "__rc", "__m")

    def toksOf(c: String): Column = coalesce(col(c),
      expr(s"CAST(array() AS ${df.schema(c).dataType.sql})"))

    // all grams n = 1..4 of one token array, tagged (n, gram) — one
    // array build per row, one explode for all four orders
    def tagged(toks: Column): Column =
      flatten(transform(sequence(lit(1), lit(4)), n =>
        when(size(toks) - n + 1 < 1,
          array().cast("array<struct<n:int,g:string>>"))
          .otherwise(transform(sequence(lit(0), size(toks) - n),
            i => struct(n.cast("int").as("n"),
              concat_ws("\u001f", slice(toks, i + 1, n)).as("g"))))))

    // explode_outer + null-filter on the OUTPUT: an inner explode's
    // synthesized size(arr) > 0 guard is pushable below upstream
    // exchanges and would re-run the gram build in the scan task
    def gramCounts(c: String, cntName: String): DataFrame =
      df.select(col(idCol), tagged(toksOf(c)).as("__tg"))
        .select(col(idCol), explode_outer(col("__tg")).as("__e"))
        .filter(col("__e").isNotNull)
        .select(col(idCol), col("__e").getField("n").as("__n"),
          col("__e").getField("g").as("__g"))
        .groupBy(col(idCol), col("__n"), col("__g"))
        .agg(count(lit(1)).as(cntName))

    // clipped matches: only grams the candidate has can match
    val matches = gramCounts(candCol, "__cc")
      .join(gramCounts(refCol, "__rc"), Seq(idCol, "__n", "__g"), "left")
      .withColumn("__m", least(col("__cc"), coalesce(col("__rc"), lit(0L))))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("__n") === 1, col("__m")).otherwise(0L)).as("m1"),
        sum(when(col("__n") === 2, col("__m")).otherwise(0L)).as("m2"),
        sum(when(col("__n") === 3, col("__m")).otherwise(0L)).as("m3"),
        sum(when(col("__n") === 4, col("__m")).otherwise(0L)).as("m4"))

    val cl = size(toksOf(candCol))
    val rl = size(toksOf(refCol))
    val base = df
      .withColumn("c_len", cl)
      .withColumn("r_len", rl)
      .join(matches, Seq(idCol), "left")
    val withInts = (1 to 4).foldLeft(base) { (d, n) =>
      d.withColumn(s"m$n", coalesce(col(s"m$n"), lit(0L)))
        .withColumn(s"t$n", greatest(col("c_len") - n + 1, lit(0)).cast("long"))
    }

    val c = col("c_len").cast("double")
    val r = col("r_len").cast("double")
    val bpRaw = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - r / c))
    def p(n: Int): Column =
      if (n == 1) col("m1").cast("double") / col("t1").cast("double")
      else (col(s"m$n") + 1L).cast("double") / (col(s"t$n") + 1L).cast("double")
    val logSum = log(p(1)) + log(p(2)) + log(p(3)) + log(p(4))
    val defined = col("c_len") >= 4 && col("r_len") >= 1
    withInts
      .withColumn("bp", when(defined, round(bpRaw, 6)))
      .withColumn("bleu", when(!defined, lit(null).cast("double"))
        .when(col("m1") === 0L, lit(0.0))
        .otherwise(round(bpRaw * exp(lit(0.25) * logSum), 6)))
  }

  /** ROUGE-N (Lin 2004) per (candidate, reference) row — the RECALL-side
    * complement to [[bleuScore]]'s precision (summarization eval weights
    * "did the candidate cover the reference", not the reverse). Single
    * order `n` (ROUGE-1 / ROUGE-2 are the published workhorses):
    *  - `overlap`: clipped n-gram matches, Σ over distinct grams of
    *    `min(cand_count, ref_count)` — exact integers;
    *  - `c_grams` / `r_grams`: candidate / reference n-gram totals
    *    (`max(len − n + 1, 0)`, pure arithmetic);
    *  - `rouge_p` = overlap/c_grams, `rouge_r` = overlap/r_grams — each
    *    ONE IEEE division of exact integers (NULL when the denominator is
    *    0: the side has no n-grams, the metric is undefined);
    *  - `rouge_f` = 2·P·R/(P+R), the fixed left-associated expression the
    *    oracle mirrors; 0 when P+R = 0, NULL when either side is
    *    undefined.
    * No `ln`/`exp`/`pow` anywhere, so nothing needs the 6-dp rounding
    * BLEU's libm calls do — every output is exact or one-division-exact.
    *
    * Scale shape: one gram projection + explode per side (gram-stream
    * rows), two (id, gram) counting aggregates with map-side combine, one
    * equi-join (inner — only grams BOTH sides have contribute to the
    * clipped overlap), one per-id sum, one join back to the input. All
    * shuffles are gram-stream-sized or smaller; nothing corpus-global. */
  def rougeN(df: DataFrame, idCol: String, candCol: String,
             refCol: String, n: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    requireFresh(df, "rougeN", "overlap", "c_grams", "r_grams",
      "rouge_p", "rouge_r", "rouge_f", "__g", "__cc", "__rc")

    def toksOf(c: String): Column = coalesce(col(c),
      expr(s"CAST(array() AS ${df.schema(c).dataType.sql})"))

    def grams(toks: Column): Column =
      when(size(toks) - n + 1 < 1, expr("CAST(array() AS array<string>)"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws("\u001f", slice(toks, i + 1, lit(n)))))

    // gram arrays materialize in their own projection before the explode
    // (generators re-derive their input per output row — the no-CSE rule)
    def gramCounts(c: String, cntName: String): DataFrame =
      df.select(col(idCol), grams(toksOf(c)).as("__ga"))
        .select(col(idCol), explode_outer(col("__ga")).as("__g"))
        .filter(col("__g").isNotNull)
        .groupBy(col(idCol), col("__g"))
        .agg(count(lit(1)).as(cntName))

    val overlap = gramCounts(candCol, "__cc")
      .join(gramCounts(refCol, "__rc"), Seq(idCol, "__g"))
      .groupBy(col(idCol))
      .agg(sum(least(col("__cc"), col("__rc"))).as("overlap"))

    val tc = greatest(size(toksOf(candCol)) - n + 1, lit(0)).cast("long")
    val tr = greatest(size(toksOf(refCol)) - n + 1, lit(0)).cast("long")
    val p = col("rouge_p")
    val r = col("rouge_r")
    df.join(overlap, Seq(idCol), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .withColumn("c_grams", tc)
      .withColumn("r_grams", tr)
      .withColumn("rouge_p", when(col("c_grams") > 0L,
        col("overlap").cast("double") / col("c_grams").cast("double")))
      .withColumn("rouge_r", when(col("r_grams") > 0L,
        col("overlap").cast("double") / col("r_grams").cast("double")))
      .withColumn("rouge_f", when(p.isNotNull && r.isNotNull,
        when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(lit(0.0))))
  }

  /** NEEDLE-IN-A-HAYSTACK context synthesis — the long-context eval prep
    * popularized by the 2023 "needle" retrieval tests: splice a known
    * NEEDLE token sequence into each document at a grid of DEPTH
    * fractions, emitting one evaluation context per (document, depth) so
    * the harness can measure retrieval accuracy as a function of where
    * in the context the fact sits. Insertion position is the exact
    * integer `pos = n_orig · depth_pct DIV 100` (0-based token index the
    * needle starts at — depth 0 prepends, depth 100 appends), so the
    * q203 oracle replays every slice boundary; `ctx_md5` hashes the
    * spliced stream (US-joined) for integrity without shipping it, and
    * the harness reconstructs the context from (doc, needle, pos) alone.
    * Output per row: `depth_pct`, `needle_pos`, `n_toks`
    * (= n_orig + needle length), `ctx_md5`.
    *
    * Scale shape: zero shuffle — the token array materializes once in
    * its own projection (the no-CSE rule), the depth explode multiplies
    * rows by the fixed grid size, and each output row's splice is two
    * slices + a concat. NULL token arrays count as empty. */
  def needleInsert(df: DataFrame, idCol: String, toksCol: String,
                   needle: Seq[String],
                   depthsPct: Seq[Int] = Seq(0, 25, 50, 75, 100)): DataFrame = {
    require(needle.nonEmpty, "needleInsert needs a non-empty needle")
    require(depthsPct.nonEmpty && depthsPct.forall(d => d >= 0 && d <= 100),
      s"depths must be percentages in [0,100]: $depthsPct")
    requireFresh(df, "needleInsert", "depth_pct", "needle_pos", "n_toks",
      "ctx_md5", "__t", "__pos")
    val needleArr = array(needle.map(lit): _*)
    val withT = df.select(col(idCol),
      coalesce(col(toksCol),
        expr(s"CAST(array() AS ${df.schema(toksCol).dataType.sql})")).as("__t"))
    withT
      .select(col(idCol), col("__t"),
        explode(array(depthsPct.map(d => lit(d)): _*)).as("depth_pct"))
      .withColumn("__pos",
        expr("CAST(size(__t) AS BIGINT) * depth_pct DIV 100"))
      .select(col(idCol), col("depth_pct"),
        col("__pos").cast("int").as("needle_pos"),
        (size(col("__t")) + needle.length).as("n_toks"),
        md5(concat_ws("\u001f",
          concat(slice(col("__t"), lit(1), col("__pos").cast("int")),
            needleArr,
            slice(col("__t"), (col("__pos") + 1).cast("int"),
              size(col("__t")) - col("__pos").cast("int")))))
          .as("ctx_md5"))
  }

  /** pass@k (Chen et al. 2021, the Codex estimator) — the unbiased
    * probability that at least one of k draws from a problem's n samples
    * is correct: `pass@k = 1 − C(n−c, k)/C(n, k)` with c = correct
    * samples. Computed EXACTLY: both binomials cancel to falling
    * factorials `Π_{j<k}(n−c−j)` / `Π_{j<k}(n−j)` — integer products
    * (order-free, overflow-safe while n^k < 2⁶³; at the conventional
    * n ≤ 100, k ≤ 10 the products stay under 10²⁰… so the guard requires
    * n ≤ 45 for k = 10; larger panels use smaller k or the float form) —
    * then ONE double division and ONE subtraction, so the q204 oracle
    * replays it bit for bit. `n − c < k` short-circuits to the exact 1
    * (every k-subset contains a correct sample); `k > n` yields NULL
    * (undefined — you cannot draw k from n).
    *
    * Input: one row per (problem, sample) with a boolean/int
    * correctness column. Output: one row per (problem, k) —
    * `n_samples, n_correct, k, pass_at_k`. Scale shape: ONE
    * problem-keyed count aggregate (map-side combine), then a fixed-grid
    * k explode and per-row integer folds — nothing corpus-global. */
  def passAtK(df: DataFrame, problemCol: String, correctCol: String,
              ks: Seq[Int] = Seq(1, 10)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1: $ks")
    requireFresh(df, "passAtK", "n_samples", "n_correct", "k", "pass_at_k",
      "__num", "__den")
    val agg = df.groupBy(col(problemCol)).agg(
      count(lit(1)).as("n_samples"),
      sum(when(col(correctCol).cast("boolean"), 1L).otherwise(0L))
        .as("n_correct"))
    val n = col("n_samples")
    val c = col("n_correct")
    def falling(from: Column): Column =
      aggregate(sequence(lit(0L), col("k").cast("long") - 1L),
        lit(1L), (acc, j) => acc * (from - j))
    agg
      .select(col(problemCol), n, c,
        explode(array(ks.map(k => lit(k)): _*)).as("k"))
      .withColumn("__num",
        when(n - c < col("k"), lit(0L)).otherwise(falling(n - c)))
      .withColumn("__den", falling(n))
      .withColumn("pass_at_k", when(col("k") > n, lit(null).cast("double"))
        .otherwise(lit(1.0) -
          col("__num").cast("double") / col("__den").cast("double")))
      .drop("__num", "__den")
  }

  /** BRADLEY–TERRY arena ratings (the Chatbot-Arena aggregation:
    * pairwise model battles → a strength score per model) via Hunter
    * 2004's MM iteration `p_i ← W_i / Σ_{j≠i} n_ij/(p_i + p_j)`, run a
    * FIXED `iters` rounds from p = 1 — deterministic, no convergence
    * test, no RNG.
    *
    * QUANTIZED for cross-engine bit-reproducibility: strengths live as
    * integer NANO-units (`bt_nano`, 1.0 = 10⁹), each pair term is ONE
    * double expression `floor(n_ij·10⁹ / ((p_i+p_j)/10⁹) + 0.5)`
    * rounded back to an integer, and the per-model denominator is an
    * INTEGER sum — order-free under any aggregation tree, so the q205
    * oracle replays every iteration with unrolled CTEs and unordered
    * SUMs. Clamps make the fixed-point walk total: strengths floor at
    * 10³ nano (10⁻⁶) and cap at 10¹⁵ nano (10⁶) — a model that never
    * wins sits at the floor, an unbeaten one walks to the cap instead
    * of overflowing — and a zero denominator (every term floored to 0
    * against far-stronger opponents) keeps the previous strength.
    * Overflow bound: `t_ij ≤ n_ij·10⁹/(2·10⁻⁶)`, so pair game counts up
    * to ~10⁴ and thousands of opponents stay inside int64. Ratings are
    * UNNORMALIZED (BT is scale-invariant; consumers compare ratios or
    * ln-differences).
    *
    * Input: one row per game — two model columns + the winner column
    * (rows whose winner is neither player, or where a model plays
    * itself, are dropped). Output: one row per model — `model, n_games,
    * n_wins, bt_nano, win_rate`. Scale shape: ONE undirected-pair count
    * aggregate over the game stream (map-side combine), then the MM
    * loop on the collected K²-pair table — driver state is O(models²),
    * the [[graft.ext.Corpus.epochWaterfill]] bounded-collect posture
    * (models number in the dozens-to-thousands; the games stream never
    * leaves the cluster unaggregated). */
  def btRatings(games: DataFrame, modelACol: String, modelBCol: String,
                winnerCol: String, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1,64]: $iters")
    val spark = games.sparkSession
    val g = games
      .select(col(modelACol).cast("string").as("a"),
        col(modelBCol).cast("string").as("b"),
        col(winnerCol).cast("string").as("w"))
      .filter(col("a") =!= col("b") &&
        (col("w") === col("a") || col("w") === col("b")))
    val rows = g
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"),
        when(col("w") === least(col("a"), col("b")), 1L).otherwise(0L)
          .as("wlo"))
      .groupBy("lo", "hi")
      .agg(count(lit(1)).as("n"), sum("wlo").as("wlo"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nPair = scala.collection.mutable.Map.empty[(String, String), Long]
    val wins = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val tot = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    rows.foreach { case (lo, hi, n, wlo) =>
      nPair((lo, hi)) = n
      wins(lo) += wlo; wins(hi) += n - wlo
      tot(lo) += n; tot(hi) += n
    }
    val models = tot.keys.toSeq.sorted
    def nOf(i: String, j: String): Long =
      nPair.getOrElse(if (i < j) (i, j) else (j, i), 0L)
    var p = models.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      p = models.map { i =>
        // integer denominator: each term is one double expression floored
        // back to nano-units — the SQL oracle computes the identical ops
        val s = models.iterator.filter(j => j != i && nOf(i, j) > 0L)
          .map { j =>
            math.floor(nOf(i, j).toDouble * 1.0e9 /
              ((p(i).toDouble + p(j).toDouble) / 1.0e9) + 0.5).toLong
          }.sum
        val pn = if (s == 0L) p(i)
        else math.max(1000L, math.floor(
          math.min(wins(i).toDouble * 1.0e18 / s.toDouble, 1.0e15) + 0.5)
          .toLong)
        i -> pn
      }.toMap
    }
    import spark.implicits._
    models.map { m =>
      (m, tot(m), wins(m), p(m), wins(m).toDouble / tot(m).toDouble)
    }.toDF("model", "n_games", "n_wins", "bt_nano", "win_rate")
  }

  /** DISTINCT-N generation diversity (Li et al. 2016): the share of a
    * token stream's n-grams that are unique — the standard repetition /
    * mode-collapse diagnostic for sampled generations (distinct-1 and
    * distinct-2 are the published pair). Per row: `grams_n` (total
    * n-grams, arithmetic), `uniq_n` (distinct — counted inside the row
    * with `array_distinct`, no shuffle), and `distinct_n` = uniq/total
    * (one IEEE division; NULL when the row has no n-grams). Corpus-level
    * distinct-n (unique grams across ALL rows / total) is the one
    * (gram)-keyed aggregate away — deliberately not fused here, since
    * the per-row metric is the filterable quantity.
    *
    * Zero shuffle: gram array built in its own projection (the no-CSE
    * rule), dedup + counts are per-row array ops. */
  def distinctN(df: DataFrame, toksCol: String, n: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    requireFresh(df, "distinctN", "grams_n", "uniq_n", "distinct_n", "__ga")
    val toks = coalesce(col(toksCol),
      expr(s"CAST(array() AS ${df.schema(toksCol).dataType.sql})"))
    val grams =
      when(size(toks) - n + 1 < 1, expr("CAST(array() AS array<string>)"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws("\u001f", slice(toks, i + 1, lit(n)))))
    df.withColumn("__ga", grams)
      .withColumn("grams_n", size(col("__ga")).cast("long"))
      .withColumn("uniq_n", size(array_distinct(col("__ga"))).cast("long"))
      .withColumn("distinct_n", when(col("grams_n") > 0L,
        col("uniq_n").cast("double") / col("grams_n").cast("double")))
      .drop("__ga")
  }
}
