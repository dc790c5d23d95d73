package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins: backward as-of join and
  * point-in-interval range join. Both are re-expressed as ONE key-shuffle
  * plus window/equi-join algebra — never a `BroadcastNestedLoopJoin` theta
  * join, which is what a naive `l.join(r, l("t") >= r("t"))` plans and
  * which is quadratic at corpus scale.
  *
  * The reference (flatbread) has no temporal-join surface; these follow
  * the public kdb/pandas `merge_asof` semantics and the interval-binning
  * scheme every distributed range-join implementation uses (bucketize the
  * interval, replicate to covered buckets, equi-join on the bucket key).
  */
object Joins {

  /** Backward as-of join: for every left row, the LATEST right row whose
    * `rightTime` <= the left row's `leftTime`, matched within equal `keys`
    * (pandas `merge_asof` / kdb `aj` semantics, inclusive at equality).
    *
    * Plan shape: tag both sides, union, ONE shuffle on `keys`, and a
    * running `last(payload, ignoreNulls)` over (time, side) order — the
    * carry-forward trick. No range predicate ever reaches a join operator,
    * so Catalyst cannot fall back to a nested-loop plan; cost is
    * O((|L|+|R|) log) within each key partition, and keys distribute the
    * work evenly across executors.
    *
    * Determinism: right rows sort before left rows at equal timestamps
    * (inclusive match), and ties among right rows at the same timestamp
    * resolve by the payload struct's field order — a total order, so the
    * matched row never depends on partitioning.
    *
    * Output: every left column, then `<rightTime>_matched` plus the
    * requested `payload` columns (null when no right row precedes, or when
    * the match is older than `toleranceSeconds`).
    *
    * `direction` completes the pandas `merge_asof` surface:
    *   - `"backward"` (default) — latest right at-or-before the left time;
    *   - `"forward"` — earliest right at-or-after (right rows sort AFTER
    *     left rows at equal timestamps so equality still matches, and the
    *     carry runs over the forward frame);
    *   - `"nearest"` — whichever of the two is closer in seconds, the
    *     backward match winning exact-distance ties (both carries ride the
    *     same single shuffle; only the in-partition sort runs twice).
    * `toleranceSeconds` bounds |leftTime − match| in every direction.
    *
    * SKEW: the carry window partitions by `keys` alone, so ONE pathological
    * key (a null-heavy instrument, a default user id) serializes its whole
    * timeline into a single task. `timeBucketSeconds = Some(w)` is the
    * documented hot-key fallback: rows additionally partition by their
    * epoch bucket `floor(t / w)` — per-task work drops from rows-per-key to
    * rows-per-(key, bucket) — and matches that cross a bucket boundary come
    * from a BUCKET-LEVEL carry relation (one row per (key, bucket): the
    * latest/earliest right payload, running-carried across buckets within
    * the key — a window over bucket-count-sized data, never row-level).
    * Results are IDENTICAL to the unbucketed plan for any width
    * (spec-asserted): a right row in an earlier bucket always has a
    * strictly smaller time, so `coalesce(in-bucket carry, boundary carry)`
    * reproduces the global carry exactly. Pick `w` near the typical match
    * gap; timestamps must be non-null in bucketed mode (a null time cannot
    * be assigned a bucket).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, payload: Seq[String],
               toleranceSeconds: Option[Long] = None,
               direction: String = "backward",
               timeBucketSeconds: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equality key")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(timeBucketSeconds.forall(_ > 0),
      s"timeBucketSeconds must be positive, got $timeBucketSeconds")
    val matchedTs = s"${rightTime}_matched"

    // side ordering places right rows INSIDE the relevant frame at equal
    // timestamps: before left (0 < 1) for the backward carry, after left
    // (2 > 1) for the forward carry
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__sb"), lit(2).as("__sf"),
        struct(col(rightTime).as(matchedTs) +: payload.map(col): _*).as("__p")): _*)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__sb", lit(1)).withColumn("__sf", lit(1))
    // unionByName fills each side's missing columns (left's payload struct,
    // right's left-only columns) with nulls — one relation, one shuffle.
    val u0 = l.unionByName(r, allowMissingColumns = true)

    // partition spec: keys alone, or keys + epoch bucket in hot-key mode
    val u = timeBucketSeconds.foldLeft(u0)((d, w) =>
      d.withColumn("__bk", floor(col("__t").cast("long") / w)))
    val pSpec = keys.map(col) ++ timeBucketSeconds.map(_ => col("__bk"))
    val wB = Window.partitionBy(pSpec: _*)
      .orderBy(col("__t"), col("__sb"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(pSpec: _*)
      .orderBy(col("__t"), col("__sf"), col("__p"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pType = u.schema("__p").dataType
    def inBucket(d: DataFrame) = direction match {
      case "backward" =>
        d.withColumn("__mb", last(col("__p"), ignoreNulls = true).over(wB))
          .withColumn("__mf", lit(null).cast(pType))
      case "forward" =>
        d.withColumn("__mb", lit(null).cast(pType))
          .withColumn("__mf", first(col("__p"), ignoreNulls = true).over(wF))
      case _ =>
        d.withColumn("__mb", last(col("__p"), ignoreNulls = true).over(wB))
          .withColumn("__mf", first(col("__p"), ignoreNulls = true).over(wF))
    }
    val carried = timeBucketSeconds match {
      case None => inBucket(u)
      case Some(_) =>
        // bucket-level boundary carry: one row per (keys, bucket) holding
        // that bucket's latest/earliest RIGHT payload (struct max/min over
        // (__t, __p) — lexicographic, the same total order the window's
        // (__t, side, __p) sort gives among right rows), then running
        // last/first non-null across buckets WITHIN the key. The window
        // here runs over bucket-count-sized rows, not corpus rows.
        val bl = u.groupBy((keys.map(col) :+ col("__bk")): _*)
          .agg(
            max(when(col("__sb") === 0, struct(col("__t"), col("__p"))))
              .as("__mx"),
            min(when(col("__sf") === 2, struct(col("__t"), col("__p"))))
              .as("__mn"))
        val wPrev = Window.partitionBy(keys.map(col): _*).orderBy(col("__bk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wNext = Window.partitionBy(keys.map(col): _*).orderBy(col("__bk"))
          .rowsBetween(1, Window.unboundedFollowing)
        val carry = bl.select((keys.map(col) :+ col("__bk") :+
          last(col("__mx"), ignoreNulls = true).over(wPrev)
            .getField("__p").as("__cb") :+
          first(col("__mn"), ignoreNulls = true).over(wNext)
            .getField("__p").as("__cf")): _*)
        // a right row in an earlier bucket has a strictly smaller time than
        // anything in this bucket, so the in-bucket match always wins when
        // present — coalesce reproduces the global carry exactly. The
        // lookup is NULL-SAFE on the keys: a null key is the canonical hot
        // key (the whole reason bucketed mode exists) and a plain equi-join
        // would silently drop its rows.
        val cond = (keys :+ "__bk")
          .map(k => col(s"__u.$k") <=> col(s"__c.$k")).reduce(_ && _)
        val joined = u.alias("__u")
          .join(carry.select((keys.map(c => col(c)) :+ col("__bk") :+
              col("__cb") :+ col("__cf")): _*).alias("__c"), cond)
          .select(col("__u.*"), col("__c.__cb"), col("__c.__cf"))
        inBucket(joined)
          .withColumn("__mb", coalesce(col("__mb"), col("__cb")))
          .withColumn("__mf", coalesce(col("__mf"), col("__cf")))
    }

    def dist(m: Column): Column =
      abs(col("__t").cast("long") - m.getField(matchedTs).cast("long"))
    def within(m: Column): Column = toleranceSeconds match {
      case Some(tol) => m.isNotNull && dist(m) <= tol
      case None => m.isNotNull
    }
    val mb = when(within(col("__mb")), col("__mb"))
    val mf = when(within(col("__mf")), col("__mf"))
    // nearest: closest in seconds; exact ties and one-sided misses fall to
    // the surviving side (backward wins ties — the documented convention)
    val matched = direction match {
      case "backward" => mb
      case "forward" => mf
      case _ => when(mb.isNotNull && mf.isNotNull,
          when(dist(col("__mf")) < dist(col("__mb")), mf).otherwise(mb))
        .otherwise(coalesce(mb, mf))
    }
    carried.where(col("__sb") === 1)
      .select(left.columns.map(col) ++
        (matchedTs +: payload).map(f => matched.getField(f).as(f)): _*)
  }

  /** Point-in-interval range join: rows of `points` whose `pointTime` falls
    * in `[startCol, endCol]` (inclusive) of an `intervals` row with equal
    * `keys`. Returns the matched pairs: every `points` column plus every
    * `intervals` column not already claimed by the points side.
    *
    * Plan shape: intervals explode to the epoch buckets of width
    * `bucketSeconds` they cover, points map to their single bucket, and the
    * match is an EQUI-join on (keys, bucket) + an exact residual predicate
    * — the standard distributed range-join scheme. Replication factor is
    * `interval span / bucketSeconds + 1`, so pick the bucket near the
    * typical span: the join stays a hash join at any scale and skew is
    * bounded by events-per-(key, bucket), not events-per-key.
    *
    * A point meets each interval in exactly one bucket (its own), so no
    * pair-level dedup pass is needed. Degenerate intervals (end < start)
    * match nothing and are dropped before the explode.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                pointTime: String, startCol: String, endCol: String,
                bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val w = lit(bucketSeconds)
    val iCols = intervals.columns.filterNot(points.columns.contains)
    val p = points
      .withColumn("__b", floor(col(pointTime).cast("long") / w))
      .alias("__pt")
    val i = intervals
      .where(col(endCol) >= col(startCol))
      .withColumn("__b",
        explode(sequence(floor(col(startCol).cast("long") / w),
          floor(col(endCol).cast("long") / w))))
      .alias("__iv")
    val cond = (keys.map(k => col(s"__pt.$k") === col(s"__iv.$k")) :+
      (col("__pt.__b") === col("__iv.__b")) :+
      (col(s"__pt.$pointTime") >= col(s"__iv.$startCol")) :+
      (col(s"__pt.$pointTime") <= col(s"__iv.$endCol"))).reduce(_ && _)
    p.join(i, cond)
      .select(points.columns.map(c => col(s"__pt.$c")) ++
        iCols.map(c => col(s"__iv.$c")): _*)
  }
}
