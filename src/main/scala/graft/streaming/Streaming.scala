package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.core.FlatTable

/** Structured-Streaming layer (SURVEY.md §7 M5 extension): windowed
  * aggregation with watermarks feeding the same tabulation operators, either
  * incrementally (append/update modes) or via `foreachBatch` re-tabulation
  * when margins must stay globally consistent within each emitted batch.
  */
object Streaming {

  /** Tumbling/sliding windowed aggregation with a watermark for state
    * cleanup and late-data handling. Pass `watermark = None` to INHERIT an
    * upstream watermark instead of defining one — required when composing
    * after another stateful stage (e.g. [[dedupExact]]): Spark disallows
    * redefining the watermark downstream of the one already set. */
  def windowedAgg(events: DataFrame, tsCol: String, watermark: Option[String],
                  win: String, slide: Option[String] = None,
                  keys: Seq[String] = Nil, aggs: Seq[Column] = Seq(count(lit(1)).as("n"))
                 ): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), win, s)
      case None    => window(col(tsCol), win)
    }
    val marked = watermark match {
      case Some(w) => events.withWatermark(tsCol, w)
      case None =>
        // None means INHERIT — fail fast if there is nothing to inherit
        // (an unwatermarked stateful aggregation would start fine and then
        // grow window state without bound on an endless feed)
        require(events.queryExecution.analyzed.collectFirst {
          case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
        }.isDefined,
          "watermark = None inherits an upstream watermark, but none is set on the input")
        events
    }
    marked
      .groupBy((w.as("window") +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Per-batch tabulation: run the (margin-producing) tabulation pipeline on
    * every micro-batch output. Margins over an unbounded stream are only
    * consistent within a batch snapshot, so `foreachBatch` is the correct
    * place to compute them — state stays in the upstream windowed agg, and the
    * tabulation layer re-runs on the (small) aggregated result.
    */
  def tabulateForeachBatch(aggregated: DataFrame,
                           tabulate: DataFrame => FlatTable,
                           onBatch: (FlatTable, Long) => Unit,
                           trigger: Trigger = Trigger.AvailableNow()
                          ): DataStreamWriter[Row] =
    aggregated.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) onBatch(tabulate(batch), id)
        ()
      }

  /** Convenience: run a windowed count stream into an in-memory table (used
    * by tests and notebook smoke checks). */
  def toMemorySink(df: DataFrame, name: String, outputMode: String = "complete"
                  ): StreamingQuery =
    df.writeStream.outputMode(outputMode).format("memory").queryName(name).start()

  /** Streaming exact dedup: keep the FIRST event per content fingerprint,
    * with dedup state bounded by the watermark horizon (an unbounded
    * `dropDuplicates` would grow state forever on an endless stream —
    * `dropDuplicatesWithinWatermark` is the formulation that survives a
    * perpetual 100 TB/day feed). */
  def dedupExact(events: DataFrame, textCol: String, tsCol: String,
                 watermark: String): DataFrame =
    events
      .withColumn("__fb_fp", graft.ext.TextStats.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fb_fp")
      .drop("__fb_fp")

  /** Streaming NEAR-dup suppression: keep the first event per content
    * SIGNATURE within the watermark horizon. The batch layer's signature
    * operators are per-document zero-shuffle codegen'd scalars
    * ([[graft.funcs.SimHashSignature]] / [[graft.funcs.MinHashSignature]]) —
    * already streaming-compatible — so online near-dup dedup is their
    * composition with `dropDuplicatesWithinWatermark` on the signature.
    * State is bounded by the watermark, like [[dedupExact]].
    *
    * Semantics: the streaming state store keys on EQUALITY, so this collapses
    * signature-IDENTICAL documents — for the default 64-bit SimHash that is
    * Hamming distance 0, where the near-identical mass of a crawl lands
    * (boilerplate, templated pages, small-whitespace edits; token-level
    * rewrites usually flip a few bits and pass). The full Hamming ≤ 3 /
    * banded-Jaccard pair graphs stay batch operators
    * ([[graft.ext.Dedup.simhashPairs]],
    * [[graft.ext.Dedup.minhashDedupPairs]]): they need a candidate self-join,
    * which has no bounded-state streaming formulation. Use this as the online
    * first-pass filter feeding the periodic batch dedup terminal
    * ([[graft.ext.Dedup.removeNearDups]]).
    *
    * The token/shingle arrays are materialized in their own projections (not
    * inlined) for the same CSE reason as the batch signature operators —
    * see [[graft.ext.Dedup.minhashSignatures]]. */
  def dedupNear(events: DataFrame, textCol: String, tsCol: String,
                watermark: String, k: Int = 4,
                hasher: graft.ext.Dedup.Hasher = graft.ext.Dedup.Hasher.Xx): DataFrame = {
    graft.funcs.VectorFunctions.register(events.sparkSession)
    events
      .withColumn("__fb_t",
        graft.ext.TextStats.tokens(coalesce(col(textCol), lit(""))))
      .withColumn("__fb_g", graft.ext.Dedup.shinglesOfTokens(col("__fb_t"), k))
      .withColumn("__fb_sig", graft.funcs.VectorFunctions.simhashSig(
        col("__fb_g"), useMd5 = hasher == graft.ext.Dedup.Hasher.Md5))
      .drop("__fb_t", "__fb_g")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fb_sig")
      .drop("__fb_sig")
  }

  /** Continuous-ingestion dedup — the epoch-loop composition of
    * [[graft.ext.Dedup.incrementalExact]]: every micro-batch is probed
    * against a driver-held Bloom filter over the seen-document fingerprints
    * (codegen'd prefilter; only the might-be-seen fraction pays the exact
    * confirm join against the live history), surviving rows go to `onFresh`
    * (typically: append to the history store). The filter is REBUILT from
    * the full history every `refreshEveryBatches` batches — one
    * tree-aggregated history scan per epoch, amortized over the epoch's
    * batches — and auto-sized from the measured history count plus
    * `headroom` (size headroom to the docs you expect to ingest per epoch;
    * the achieved fpp degrades gradually past capacity and resets at the
    * next refresh — a perf dial, never correctness).
    *
    * BETWEEN refreshes the epoch state would go stale as `onFresh` grows
    * the history — a stale Bloom filter is not conservative (a fingerprint
    * missing from it takes the definitely-fresh shortcut past the confirm
    * join) — so after each batch the accepted fingerprints are folded into
    * BOTH halves of the state: into the frozen filter via a SAME-SHAPE
    * distributed Bloom build (`mergeInPlace`; the driver receives filter
    * bits, never rows), and into the confirm join's fingerprint set as a
    * materialized delta block. Cross-batch duplicates therefore drop even
    * mid-epoch, and — critically for the amortization claim — non-refresh
    * batches touch NO history at all: the confirm join reads the
    * epoch-start checkpointed fingerprint set plus the small accepted
    * deltas, so the full history is scanned exactly once per epoch.
    * `history()` only needs to reflect `onFresh`'s writes by the next
    * refresh, not per batch. Duplicates WITHIN one micro-batch are
    * [[graft.ext.Dedup.exact]]'s job, same contract as the batch operator.
    *
    * State is bounded: the driver holds one Bloom filter (~1.2 MB per
    * million docs at 1% fpp); the executor-side fingerprint blocks are the
    * epoch-start set (materialized once) plus one small block per batch,
    * all dropped at the next refresh.
    *
    * This loop dedups on EXACT content fingerprints. For near-dup
    * ingestion (drop arrivals whose SimHash signature matches history),
    * call [[graft.ext.Dedup.incrementalNear]] from your own `foreachBatch`
    * — signature equality is already the online near-dup scope
    * ([[dedupNear]]), and the batch operator carries the same
    * Bloom-prefiltered shape (its filter is over the 64-bit signatures
    * themselves, q64's oracle pins it). */
  def dedupIncremental(events: DataFrame, history: () => DataFrame,
                       idCol: String, textCol: String,
                       onFresh: (DataFrame, Long) => Unit,
                       refreshEveryBatches: Int = 10,
                       headroom: Long = 100000L,
                       fpp: Double = 0.01,
                       trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] = {
    require(refreshEveryBatches > 0,
      s"refreshEveryBatches must be positive, got $refreshEveryBatches")
    import graft.ext.{Dedup, TextStats}
    // driver-held epoch state, touched only inside foreachBatch (micro-batch
    // execution is serial per query, so no synchronization is needed)
    var filter: org.apache.spark.util.sketch.BloomFilter = null
    var capacity = 0L
    var batchesSinceRefresh = 0
    var epochFp: DataFrame = null // epoch-start fp set, ONE materialized block
    var deltaFp: DataFrame = null // accepted since refresh, compacted periodically
    events.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (filter == null || batchesSinceRefresh >= refreshEveryBatches) {
          // epoch boundary: the ONE history scan of the epoch builds both
          // the filter and the confirm join's materialized fingerprint set
          epochFp = history()
            .select(TextStats.fingerprint(col(textCol)).as("__fp")).distinct()
            .localCheckpoint(true)
          deltaFp = null
          capacity = math.max(1L, epochFp.count()) + math.max(0L, headroom)
          filter = Dedup.buildSeenBloom(epochFp, Some(capacity), fpp)
          batchesSinceRefresh = 0
        }
        val seenFp =
          if (deltaFp == null) epochFp else epochFp.unionByName(deltaFp)
        val fresh = Dedup.probeAndConfirm(batch, seenFp,
          Dedup.serializedBloom(filter), idCol, textCol)
          // onFresh AND the state folds below all consume it; without this
          // the probe pipeline would re-execute per consumer
          .localCheckpoint(true)
        onFresh(fresh, id)
        // fold the batch's accepted fingerprints into BOTH halves of the
        // epoch state so later batches this epoch can't duplicate them:
        // a small materialized delta block for the confirm join, and a
        // same-(capacity, fpp)-shape Bloom merged into the frozen filter
        // (the sentinel row keeps the aggregate off its empty-input NPE,
        // same as buildSeenBloom)
        val acceptedFp = fresh
          .select(TextStats.fingerprint(col(textCol)).as("__fp")).distinct()
          .localCheckpoint(true)
        filter.mergeInPlace(acceptedFp
          .select(xxhash64(col("__fp")).as("__h"))
          .unionByName(batch.sparkSession.range(1).select(lit(0L).as("__h")))
          .stat.bloomFilter("__h", capacity, fpp))
        deltaFp =
          if (deltaFp == null) acceptedFp else deltaFp.unionByName(acceptedFp)
        // compact the DELTA union periodically so neither the plan's leaf
        // count nor the pinned block count grows with refreshEveryBatches —
        // only the small accepted rows are rewritten, never the epoch set
        // (a long epoch is the whole point of the amortization)
        if (batchesSinceRefresh % 16 == 15)
          deltaFp = deltaFp.localCheckpoint(true)
        batchesSinceRefresh += 1
        ()
      }
  }

  // ---- custom state: gap-based sessionization ---------------------------

  case class SessionEvent(key: String, ts: java.sql.Timestamp)

  /** Per-key open-session state kept by the state store between batches. */
  case class SessionState(start: Long, last: Long, n: Long)

  /** One closed session, emitted when the inactivity gap elapses (within a
    * batch, or via event-time timeout once the watermark passes). */
  case class Session(key: String, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long)

  /** Gap-based sessionization with CUSTOM state via `flatMapGroupsWithState`
    * (the brief's mapGroupsWithState surface): events group by key, each
    * group folds its (batch-sorted) events into an open-session state, a
    * session closes when the gap between consecutive events exceeds
    * `gapMs` or when the event-time timeout fires after the watermark moves
    * past `last + gap`. State is per-key and bounded (one open session), so
    * the state store scales with distinct active keys, not event volume —
    * the streaming analogue of the batch lag-based q24 sessionization.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapMs: Long, watermark: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    events
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[SessionEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, batch, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(key, ts(s.start), ts(s.last), s.n))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(key, ts(s.start), ts(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // a batch containing only events older than the watermark would
              // otherwise set a timeout before the watermark, which Spark
              // rejects (IllegalArgumentException fails the whole query)
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverse.iterator
          }
      }
  }
}
