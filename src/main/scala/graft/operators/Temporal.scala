package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/ordered joins Spark's relational core does not ship as
  * operators: as-of (latest-state-at-time) and interval range joins.
  * Both are built to the library's scale contract — no candidate
  * explosion, no BroadcastNestedLoopJoin/CartesianProduct anywhere
  * (swept by PlanCheckSuite), costs bounded by a single key shuffle.
  *
  * The reference delegates point-in-time lookups to its warehouse
  * engines; these are the Spark-native equivalents a training-data
  * pipeline needs for feature/state attachment (e.g. "the model version
  * live when this example was logged").
  */
object Temporal {

  /** As-of join: for every left row, attach the single right row with
    * the LARGEST `tsCol` ≤ the left row's (direction="backward"; the
    * SMALLEST ≥ for "forward"), matching on `keyCol`. Ties on the
    * timestamp itself are inclusive; among equal right timestamps the
    * highest `tieCol` wins (deterministic output).
    *
    * Implementation is a union + running `last` over a (key, ts)
    * window, NOT a join: both sides shuffle ONCE on the key, sort by
    * (ts, side), and the right payload propagates forward as a single
    * packed struct (one `last(ignoreNulls)` — per-column lasts could
    * mix fields from different right rows when payloads contain nulls).
    * Cost is exactly a SortMergeJoin's shuffle+sort without any
    * candidate pairs, so it scales to corpus-sized both sides; a hot
    * key concentrates on one partition (same bound as any windowed
    * aggregation). AQE's skew-join split does NOT apply — this plan has
    * no join node, only a window, and the r16 `aqe_skew` ledger
    * (BASELINE.md) measures flat walls across AQE configs on a 50%-hot
    * 10M-row key — so [[asofJoinSkew]]'s time-chunking (via
    * [[asofJoinAuto]]) is the ONLY hot-key lever for this family.
    *
    * `rightCols` are the right-side columns to attach (prefixed
    * `asof_`); `tolerance` (in the unit of `unix_micros`) drops matches
    * further back/ahead than the bound. Unmatched (or out-of-tolerance)
    * left rows keep null `asof_*` columns — filter `asof_<tie>` IS NOT
    * NULL for inner semantics (DuckDB's ASOF JOIN default). */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String,
               rightCols: Seq[String], tieCol: String,
               direction: String = "backward",
               toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    require(!rightCols.contains(tsCol) && !rightCols.contains(tieCol),
      s"rightCols must not repeat '$tsCol'/'$tieCol' — they are attached " +
        s"as asof_$tsCol/asof_$tieCol already")
    require(!left.columns.exists(_.startsWith("__")),
      "left columns starting with __ collide with asofJoin internals")
    require(!rightCols.exists(_.startsWith("__")) &&
      !tieCol.startsWith("__") && !tsCol.startsWith("__"),
      "rightCols/ts/tie starting with __ collide with asofJoin internals " +
        "(a rightCol named __rts would silently shadow the match timestamp)")
    val leftCols = left.columns.toSeq
    // one packed payload struct per right row: ts + tie + user columns
    val pay = struct(
      (Seq(col(tsCol).as("__rts"), col(tieCol).as("__rtie")) ++
        rightCols.map(c => col(c).as(c))): _*)
    val r = right
      // a null-ts right row would sort nulls-first and its NON-null
      // payload struct would propagate as a phantom match (asof_ts null
      // but payload populated — surviving the documented IS NOT NULL
      // inner filter); the broadcast path drops such rows via its null
      // comparison, so drop them here too for identical semantics
      .where(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(tieCol).as("__rtie"),
        pay.as("__rpay"))
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__rtie", lit(null).cast(r.schema("__rtie").dataType))
      .withColumn("__rpay", lit(null).cast(r.schema("__rpay").dataType))
      .withColumn("__side", lit(1))
    val unioned = l.select((Seq(col(keyCol), col(tsCol), col("__rtie"),
        col("__rpay"), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => col(c))): _*)
      .unionByName(r, allowMissingColumns = true)
    // backward: ascending ts, right rows (side 0) sort before left at
    // equal ts so the running last is INCLUSIVE of ties; among equal
    // right ts the larger tie sorts later and wins. forward mirrors.
    // Null-ts LEFT rows must sort FIRST in both directions: desc's
    // default nulls-LAST would place them after every right row and the
    // running last would attach the smallest right-ts payload as a
    // phantom match (asofJoinBroadcast's null comparison yields no
    // candidates — both paths must agree: null ts ⇒ no match).
    val ord: Seq[Column] =
      if (direction == "backward")
        Seq(col(tsCol).asc_nulls_first, col("__side").asc,
          col("__rtie").asc_nulls_first)
      else
        Seq(col(tsCol).desc_nulls_first, col("__side").asc,
          col("__rtie").asc_nulls_first)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPay = unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val bounded = toleranceMicros match {
      case Some(tol) =>
        // tolerance unit follows the ts type: micros for timestamps, the
        // column's own unit for numeric timelines
        val asLong = tsToLong(left.schema(tsCol).dataType) _
        val gap =
          if (direction == "backward")
            asLong(col(tsCol)) - asLong(col("__match.__rts"))
          else asLong(col("__match.__rts")) - asLong(col(tsCol))
        withPay.withColumn("__match",
          when(col("__match").isNotNull && gap <= tol, col("__match")))
      case None => withPay
    }
    bounded.select(
      (leftCols.map(c => col(c)) :+
        col("__match.__rts").as(s"asof_$tsCol") :+
        col("__match.__rtie").as(s"asof_$tieCol")) ++
        rightCols.map(c => col(s"__match.$c").as(s"asof_$c")): _*)
  }

  /** Broadcast as-of join — the zero-shuffle fast path of [[asofJoin]]
    * for the common "attach state history" shape: the right side is a
    * dimension-scale table (model-version history, price changes,
    * config rollouts), so it packs into one time-sorted array per key,
    * broadcasts, and the LEFT SIDE NEVER SHUFFLES — at corpus scale
    * that is the whole cost of the operator. Match selection is pure
    * codegen'd Column ops (array filter + element_at), no UDF, no
    * window, no sort of the left.
    *
    * Semantics are identical to [[asofJoin]] (inclusive ties, max-tie
    * among equal timestamps, backward/forward, tolerance) — pinned by
    * the suite on random data and by the q40 gate row against the same
    * DuckDB ASOF JOIN oracle as q36. The right side must fit a
    * broadcast (each key's full history lives in one array cell);
    * past that, use the shuffle-based [[asofJoin]]. */
  def asofJoinBroadcast(left: DataFrame, right: DataFrame,
                        keyCol: String, tsCol: String,
                        rightCols: Seq[String], tieCol: String,
                        direction: String = "backward",
                        toleranceMicros: Option[Long] = None,
                        broadcastLimitRows: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    // Loud fit guard (r13): the whole right history is collect_list'ed
    // into per-key arrays and broadcast — overflowing that surfaces as
    // an executor OOM deep inside the aggregation, minutes in. Fail
    // fast instead, with the fix in the message. The pre-count is one
    // cheap job when the right side fits (the only legal use), and far
    // cheaper than the OOM when it doesn't. Limit override order:
    // explicit param > session conf > default.
    val limit = broadcastLimitRows.getOrElse(
      right.sparkSession.conf
        .get("graft.asof.broadcastLimitRows", "10000000").toLong)
    val rRows = right.count()
    require(rRows <= limit,
      s"asofJoinBroadcast: right side has $rRows rows, over " +
        s"broadcastLimitRows=$limit — its full history is packed into " +
        "per-key arrays and broadcast to every task. Use asofJoin " +
        "(shuffle) or asofJoinSkew/asofJoinAuto for a right side this " +
        "large, or raise the limit (param or session conf " +
        "graft.asof.broadcastLimitRows) if it genuinely fits memory.")
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    require(!rightCols.contains(tsCol) && !rightCols.contains(tieCol),
      s"rightCols must not repeat '$tsCol'/'$tieCol'")
    require(!(rightCols :+ tsCol :+ tieCol).exists(_.startsWith("__")),
      "column names starting with __ collide with asofJoin internals")
    require(!left.columns.exists(_.startsWith("__")),
      "left columns starting with __ collide with asofJoinBroadcast " +
        "internals (__hist/__cand/__match)")
    val asLong = tsToLong(left.schema(tsCol).dataType) _
    // __rts leads the struct so sort_array orders by (ts, tie) ascending
    val pay = struct(
      (Seq(col(tsCol).as("__rts"), col(tieCol).as("__rtie")) ++
        rightCols.map(c => col(c).as(c))): _*)
    val packed = right.where(col(tsCol).isNotNull).groupBy(keyCol)
      .agg(sort_array(collect_list(pay)).as("__hist"))
    val lts = asLong(col(tsCol))
    def cts(x: Column): Column = left.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(x.getField("__rts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => x.getField("__rts").cast("long")
    }
    val inDir: Column => Column =
      if (direction == "backward") x => cts(x) <= lts else x => cts(x) >= lts
    val inTol: Column => Column = toleranceMicros match {
      case Some(tol) =>
        if (direction == "backward") x => lts - cts(x) <= tol
        else x => cts(x) - lts <= tol
      case None => _ => lit(true)
    }
    val joined = left.join(broadcast(packed), Seq(keyCol), "left")
      .withColumn("__cand", filter(col("__hist"), x => inDir(x) && inTol(x)))
    // backward: greatest (ts, tie) = last candidate. forward: smallest
    // ts but max tie among its equals = last element sharing the first
    // candidate's ts.
    // try_element_at: an empty candidate array means "no match" (null),
    // not an ANSI index error
    val matched =
      if (direction == "backward")
        joined.withColumn("__match", try_element_at(col("__cand"), lit(-1)))
      else
        joined.withColumn("__match", try_element_at(
          filter(col("__cand"), x =>
            x.getField("__rts") <=> try_element_at(col("__cand"), lit(1))
              .getField("__rts")), lit(-1)))
    matched.select(
      (left.columns.toSeq.map(c => col(c)) :+
        col("__match.__rts").as(s"asof_$tsCol") :+
        col("__match.__rtie").as(s"asof_$tieCol")) ++
        rightCols.map(c => col(s"__match.$c").as(s"asof_$c")): _*)
  }

  private def tsToLong(dt: org.apache.spark.sql.types.DataType)(c: Column): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
      case _ => c.cast("long")
    }

  /** Floor division of a LONG column: `c - pmod(c, w)` is an exact
    * multiple of `w` (pmod is non-negative), so the quotient is the
    * floor at any sign. Exact while |c| < 2^53 (double-lossless —
    * epoch micros stay below that until year 2255). */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Pick a chunk width for the skew variants: the key's time span split
    * into `targetChunks` pieces (one cheap global min/max aggregation).
    * Width is in the unit of [[asofJoin]]'s timeline (micros for
    * timestamp columns, the column's own unit otherwise). */
  def chunkWidthFor(df: DataFrame, tsCol: String,
                    targetChunks: Int = 256): Long = {
    require(targetChunks > 0, "targetChunks must be positive")
    val t = tsToLong(df.schema(tsCol).dataType)(col(tsCol))
    val row = df.agg(min(t).as("mn"), max(t).as("mx")).collect()(0)
    if (row.isNullAt(0)) 1L
    else math.max(1L, (row.getLong(1) - row.getLong(0)) / targetChunks + 1)
  }

  /** Skew-robust [[asofJoin]]: identical semantics (inclusive ties,
    * max-tie, backward/forward, tolerance — equality suite-pinned on
    * random data), but each key's timeline is PRE-SPLIT into fixed-width
    * time chunks so a hot key (one bot account holding 10% of a
    * clickstream) spreads over `span/chunkWidth` window partitions
    * instead of stalling a whole stage on one straggler task.
    *
    * Boundary state rides a tiny side table, never a replicated row set:
    * per (key, chunk) the winning right row is pre-aggregated
    * (map-side combinable `max_by` — the hot key combines inside every
    * task), then — because chunks partition time — the state entering a
    * chunk is exactly the nearest prior (for forward: later) non-empty
    * chunk's winner, computed with one window over the per-chunk
    * summary (|keys × non-empty chunks| rows) and injected as a
    * null-ts carry row that sorts first inside its chunk. The main
    * window then partitions by (key, chunk).
    *
    * Cost: one extra aggregation + one small-window pass over the
    * summary vs [[asofJoin]]'s single window; same one shuffle of each
    * side (now on (key, chunk)). Use when key skew is real; for
    * uniform keys [[asofJoin]] is marginally cheaper. Pick `chunkWidth`
    * (timeline units — micros for timestamps) so a hot key's span
    * yields 100–10000 chunks; [[chunkWidthFor]] derives one from the
    * data's global span. */
  def asofJoinSkew(left: DataFrame, right: DataFrame,
                   keyCol: String, tsCol: String,
                   rightCols: Seq[String], tieCol: String,
                   chunkWidth: Long,
                   direction: String = "backward",
                   toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    require(!rightCols.contains(tsCol) && !rightCols.contains(tieCol),
      s"rightCols must not repeat '$tsCol'/'$tieCol'")
    require(!left.columns.exists(_.startsWith("__")),
      "left columns starting with __ collide with asofJoinSkew internals")
    require(!(rightCols :+ tsCol :+ tieCol).exists(_.startsWith("__")),
      "column names starting with __ collide with asofJoinSkew internals")
    require(chunkWidth > 0, "chunkWidth must be positive")
    val leftCols = left.columns.toSeq
    val tsType = left.schema(tsCol).dataType
    val toL = tsToLong(tsType) _
    def chunkOf(c: Column): Column = floorDiv(toL(c), chunkWidth)
    // null-ts left rows never match on either base path — bypass the
    // machinery entirely (inside it they would sort with the carry rows
    // and pick up a phantom payload)
    val lNull = left.where(col(tsCol).isNull)
    val lOk = left.where(col(tsCol).isNotNull)
    val pay = struct(
      (Seq(col(tsCol).as("__rts"), col(tieCol).as("__rtie")) ++
        rightCols.map(c => col(c).as(c))): _*)
    val r = right.where(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(tieCol).as("__rtie"),
        pay.as("__rpay"))
      .withColumn("__chunk", chunkOf(col(tsCol)))
      .withColumn("__side", lit(0))
    // per-(key, chunk) winner: backward = max (ts, tie); forward = min
    // ts with max tie among its equals — encoded as max (-ts, tie)
    val ordKey =
      if (direction == "backward") struct(toL(col(tsCol)), col("__rtie"))
      else struct(-toL(col(tsCol)), col("__rtie"))
    val perChunkBest = r.groupBy(col(keyCol), col("__chunk"))
      .agg(max_by(col("__rpay"), ordKey).as("__best"))
    // chunk axis = every (key, chunk) on either side, so carry-in
    // reaches chunks holding only left rows; ONE distinct over the
    // union (a pre-union distinct would just add an exchange — the
    // union's dedup covers both sides)
    val axis = lOk
      .select(col(keyCol), chunkOf(col(tsCol)).as("__chunk"))
      .unionByName(perChunkBest.select(col(keyCol), col("__chunk")))
      .distinct()
    // chunks partition time ⇒ the best over ALL prior (later) chunks is
    // the nearest prior (later) non-empty chunk's winner
    val byChunkAsc = Window.partitionBy(keyCol).orderBy(col("__chunk").asc)
    val (carryW, carryFn) =
      if (direction == "backward")
        (byChunkAsc.rowsBetween(Window.unboundedPreceding, -1),
          last(col("__best"), ignoreNulls = true))
      else
        (byChunkAsc.rowsBetween(1, Window.unboundedFollowing),
          first(col("__best"), ignoreNulls = true))
    val carry = axis.join(perChunkBest, Seq(keyCol, "__chunk"), "left")
      .withColumn("__carry", carryFn.over(carryW))
      .where(col("__carry").isNotNull)
      .select(col(keyCol),
        lit(null).cast(tsType).as(tsCol),
        lit(null).cast(r.schema("__rtie").dataType).as("__rtie"),
        col("__carry").as("__rpay"),
        col("__chunk"), lit(0).as("__side"))
    val l = lOk
      .withColumn("__rtie", lit(null).cast(r.schema("__rtie").dataType))
      .withColumn("__rpay", lit(null).cast(r.schema("__rpay").dataType))
      .withColumn("__chunk", chunkOf(col(tsCol)))
      .withColumn("__side", lit(1))
    val unioned = l.select((Seq(col(keyCol), col(tsCol), col("__rtie"),
        col("__rpay"), col("__chunk"), col("__side")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => col(c))): _*)
      .unionByName(r, allowMissingColumns = true)
      .unionByName(carry, allowMissingColumns = true)
    // same per-chunk ordering as asofJoin's per-key one; the carry row's
    // null ts sorts FIRST in both directions (incoming state precedes
    // every in-chunk row)
    val ord: Seq[Column] =
      if (direction == "backward")
        Seq(col(tsCol).asc_nulls_first, col("__side").asc,
          col("__rtie").asc_nulls_first)
      else
        Seq(col(tsCol).desc_nulls_first, col("__side").asc,
          col("__rtie").asc_nulls_first)
    val w = Window.partitionBy(col(keyCol), col("__chunk")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPay = unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val bounded = toleranceMicros match {
      case Some(tol) =>
        val gap =
          if (direction == "backward")
            toL(col(tsCol)) - toL(col("__match.__rts"))
          else toL(col("__match.__rts")) - toL(col(tsCol))
        withPay.withColumn("__match",
          when(col("__match").isNotNull && gap <= tol, col("__match")))
      case None => withPay
    }
    val matchedOut = bounded.select(
      (leftCols.map(c => col(c)) :+
        col("__match.__rts").as(s"asof_$tsCol") :+
        col("__match.__rtie").as(s"asof_$tieCol")) ++
        rightCols.map(c => col(s"__match.$c").as(s"asof_$c")): _*)
    val nullOut = lNull.select(
      (leftCols.map(c => col(c)) :+
        lit(null).cast(tsType).as(s"asof_$tsCol") :+
        lit(null).cast(right.schema(tieCol).dataType).as(s"asof_$tieCol")) ++
        rightCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)
    matchedOut.unionByName(nullOut)
  }

  /** Hot-key probe shared by the auto operators: max per-key row count
    * and total rows of `df` (one map-side-combinable aggregation —
    * tiny next to the operator itself). Returns (maxKeyCount, total);
    * (0, 0) for an empty frame. */
  private def keyProfile(df: DataFrame, keyCol: String): (Long, Long) = {
    val r = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
      .agg(max(col("__c")), sum(col("__c"))).collect().head
    if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
  }

  /** Sample floor below which the sampled profile is not trusted to
    * judge skew: under ~10k sampled rows the true total is small enough
    * that the exact pass costs nothing anyway. */
  private val MinSampledProfileRows = 10000L

  /** The auto operators' hot-key decision. By DEFAULT the profile runs
    * on a Bernoulli `profileFraction` sample: at 100 TB a full per-key
    * count before every auto call is an extra full scan of the input,
    * and the decision inequality (max > skewFactor × total/partitions)
    * is scale-invariant — both sides shrink by the same fraction, so it
    * evaluates directly on sampled counts with no rescaling. Samples
    * too small to judge fall back to the exact pass (cheap at that
    * size); `profileFraction >= 1` opts into the exact pass
    * explicitly. Fixed seed: the physical-plan choice must not flap
    * between runs on the same data. */
  private[graft] def profileIsHot(df: DataFrame, keyCol: String,
                                      skewFactor: Double,
                                      profileFraction: Double): Boolean = {
    require(profileFraction > 0, "profileFraction must be positive")
    val (mx, tot) =
      if (profileFraction >= 1.0) keyProfile(df, keyCol)
      else {
        val s = keyProfile(
          df.sample(withReplacement = false, profileFraction, seed = 421L),
          keyCol)
        if (s._2 < MinSampledProfileRows) keyProfile(df, keyCol) else s
      }
    tot > 0 && mx > skewFactor * tot.toDouble / shufflePartitionsOf(df)
  }

  private def shufflePartitionsOf(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt

  /** [[asofJoin]] with AUTOMATIC hot-key handling: one cheap profile of
    * the left side picks the plain operator for uniform keys and
    * [[asofJoinSkew]] (width from [[chunkWidthFor]]) when the largest
    * key holds more than `skewFactor`× the mean shuffle-partition's
    * rows — the regime where the unsalted window serializes onto a
    * straggler task (measured crossover in BASELINE.md r12). Semantics
    * are identical on both paths (suite-pinned), so the choice is
    * purely physical. */
  def asofJoinAuto(left: DataFrame, right: DataFrame,
                   keyCol: String, tsCol: String,
                   rightCols: Seq[String], tieCol: String,
                   direction: String = "backward",
                   toleranceMicros: Option[Long] = None,
                   skewFactor: Double = 4.0,
                   targetChunks: Int = 256,
                   profileFraction: Double = 0.01): DataFrame = {
    val hot = profileIsHot(left, keyCol, skewFactor, profileFraction)
    if (hot)
      asofJoinSkew(left, right, keyCol, tsCol, rightCols, tieCol,
        chunkWidth = chunkWidthFor(left, tsCol, targetChunks),
        direction = direction, toleranceMicros = toleranceMicros)
    else asofJoin(left, right, keyCol, tsCol, rightCols, tieCol,
      direction, toleranceMicros)
  }

  /** [[sessionize]] with the same automatic hot-key pre-split as
    * [[asofJoinAuto]]. */
  def sessionizeAuto(df: DataFrame, keyCol: String, tsCol: String,
                     gapMicros: Long, skewFactor: Double = 4.0,
                     targetChunks: Int = 256,
                     profileFraction: Double = 0.01): DataFrame = {
    val hot = profileIsHot(df, keyCol, skewFactor, profileFraction)
    if (hot)
      sessionizeSkew(df, keyCol, tsCol, gapMicros,
        chunkWidth = chunkWidthFor(df, tsCol, targetChunks))
    else sessionize(df, keyCol, tsCol, gapMicros)
  }

  /** Sessionize: tag every row with a per-key session ordinal
    * (`session_seq`, 1-based in time order) — a new session starts when
    * the gap to the key's previous event exceeds `gapMicros` (timestamp
    * columns compare in micros; plain numeric timelines in their own
    * unit). The row-tagging form a training pipeline needs to attach
    * session context to examples; aggregate on (key, session_seq) for
    * per-session stats (the q38 gate row does exactly that).
    *
    * One shuffle on the key; the lag and the running sum share the same
    * (key, ts) sort, so the second window reuses the first's order. Ties
    * on ts are gap-0 by definition and always co-session, so the output
    * is deterministic even with duplicate timestamps.
    *
    * Rows with a null `tsCol` have no timeline position: they are KEPT
    * with a null `session_seq` and do not perturb the other rows'
    * ordinals — the same contract as [[sessionizeSkew]] and
    * [[sessionizeAuto]], so the physical path never changes the
    * result. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapMicros: Long): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    val tsAsLong = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => col(tsCol).cast("long")
    }
    // order by the POST-CAST timeline value, nulls first: null-ts rows
    // sort ahead of every real instant, their __new is forced to 0 so
    // they don't inflate the running ordinal, and their session_seq
    // nulls at the end. Ordering by the raw column instead would sort a
    // numeric-STRING timeline lexicographically ("100" < "9") while the
    // arithmetic casts — splitting sessions the cast timeline says are
    // contiguous, and disagreeing with the skew path, which keys its
    // chunks on the cast value. (Unparseable strings throw at the ANSI
    // cast — loudly, on every path alike.)
    val byTime = Window.partitionBy(keyCol).orderBy(tsAsLong.asc_nulls_first)
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(tsAsLong, 1).over(byTime))
      .withColumn("__new",
        when(tsAsLong.isNull, 0L)
          .when(col("__prev").isNull ||
            tsAsLong - col("__prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_seq",
        when(tsAsLong.isNull, lit(null).cast("long"))
          .otherwise(sum(col("__new")).over(running)))
      .drop("__prev", "__new")
  }

  /** Skew-robust [[sessionize]]: identical output (equality
    * suite-pinned), but the per-key sort is split into fixed-width time
    * chunks so one hot key never serializes on a single task.
    *
    * Two phases: (1) rows sessionize WITHIN their (key, chunk) window —
    * the hot key's sort spreads over its chunks; (2) a per-chunk
    * summary (first/last event, local session count — |keys ×
    * non-empty chunks| rows) is walked once per key in chunk order:
    * a chunk whose first event is within `gapMicros` of the previous
    * non-empty chunk's last event MERGES its first session into that
    * chunk's last, and each chunk's session-ordinal offset is the
    * running sum of prior chunks' (local sessions − merge). The final
    * ordinal is `offset + local − merge`. The join back to the rows is
    * on (key, chunk) — the same partitioning the phase-1 window
    * produced, so no extra row-scale shuffle.
    *
    * Rows with a null `tsCol` are KEPT with a null `session_seq` (a
    * null timeline position has no session) — the same contract as
    * [[sessionize]], so [[sessionizeAuto]]'s physical choice never
    * changes row counts. They bypass the chunk machinery entirely: an
    * IsNull-filtered side scan (parquet row-group stats skip it when
    * the column has no nulls) unioned back at the end.
    * Pick `chunkWidth` as for [[asofJoinSkew]]. */
  def sessionizeSkew(df: DataFrame, keyCol: String, tsCol: String,
                     gapMicros: Long, chunkWidth: Long): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    require(chunkWidth > 0, "chunkWidth must be positive")
    require(!df.columns.exists(_.startsWith("__")),
      "columns starting with __ collide with sessionizeSkew internals")
    val toL = tsToLong(df.schema(tsCol).dataType) _
    // null membership and chunk/order keys are the POST-CAST value (the
    // [[sessionize]] contract): identical ordering on numeric-string
    // timelines, identical null-row routing
    val base = df.where(toL(col(tsCol)).isNotNull)
      .withColumn("__tsl", toL(col(tsCol)))
      .withColumn("__chunk", floorDiv(col("__tsl"), chunkWidth))
    val byChunk = Window.partitionBy(col(keyCol), col("__chunk"))
      .orderBy(col("__tsl"))
    val runningC = byChunk.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val tagged = base
      .withColumn("__prev", lag(col("__tsl"), 1).over(byChunk))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__tsl") - col("__prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("__lseq", sum(col("__new")).over(runningC))
    val summary = tagged.groupBy(col(keyCol), col("__chunk"))
      .agg(min(col("__tsl")).as("__first"), max(col("__tsl")).as("__last"),
        max(col("__lseq")).as("__nloc"))
    val byKey = Window.partitionBy(keyCol).orderBy(col("__chunk").asc)
    val offsets = summary
      .withColumn("__prevLast", lag(col("__last"), 1).over(byKey))
      .withColumn("__merge",
        when(col("__prevLast").isNotNull &&
          col("__first") - col("__prevLast") <= gapMicros, 1L)
          .otherwise(0L))
      .withColumn("__off", coalesce(
        sum(col("__nloc") - col("__merge"))
          .over(byKey.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(keyCol), col("__chunk"), col("__merge"), col("__off"))
    val sessioned = tagged.join(offsets, Seq(keyCol, "__chunk"))
      .withColumn("session_seq",
        col("__off") + col("__lseq") - col("__merge"))
      .select(df.columns.map(col).toSeq :+ col("session_seq"): _*)
    val nullRows = df.where(toL(col(tsCol)).isNull)
      .withColumn("session_seq", lit(null).cast("long"))
    sessioned.unionByName(nullRows)
  }

  /** Interval OVERLAP join: pairs every `a` interval with every `b`
    * interval of the same key whose `[bStart, bEnd]` overlaps
    * `[aStart, aEnd]` (inclusive ends; LONG timelines). Same bucketized
    * shape as [[rangeJoin]], replicating BOTH sides; the dedup rule is
    * positional, not a distinct pass: a qualifying pair coexists in
    * every bucket of the overlap region, so it is emitted only from the
    * FIRST such bucket — max(firstBucket(a), firstBucket(b)) — which
    * each pair has exactly one of. Malformed intervals (end < start)
    * drop before the fan-out (Spark's sequence descends rather than
    * emptying), and over-wide intervals fail loudly via the same
    * sequence-bound guard as rangeJoin. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, keyCol: String,
                          aStart: String, aEnd: String,
                          bStart: String, bEnd: String,
                          bucketWidth: Long,
                          maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(Set(aStart, aEnd).intersect(Set(bStart, bEnd)).isEmpty,
      "a and b interval column names must differ — alias one side")
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame = {
      val sb = floor(col(s) / bucketWidth).cast("long")
      val eb = floor(col(e) / bucketWidth).cast("long")
      val ebGuarded = when(eb - sb < maxBucketsPerInterval, eb)
        .otherwise(raise_error(concat(
          lit(s"intervalOverlapJoin: interval spans more than " +
            s"$maxBucketsPerInterval buckets at width $bucketWidth — " +
            "raise bucketWidth ("), eb - sb + 1, lit(" buckets needed)"))))
      df.where(col(e) >= col(s))
        .withColumn("__bucket", explode(sequence(sb, ebGuarded)))
    }
    explodeBuckets(a, aStart, aEnd)
      .join(explodeBuckets(b, bStart, bEnd), Seq(keyCol, "__bucket"))
      .where(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__bucket") === greatest(
          floor(col(aStart) / bucketWidth).cast("long"),
          floor(col(bStart) / bucketWidth).cast("long")))
      .drop("__bucket")
  }

  /** Range (interval-containment) join: pairs every point row with every
    * interval row of the same `keyCol` whose `[startCol, endCol]` range
    * contains the point's `ptCol` (inclusive both ends; all three are
    * LONG — epoch micros for time semantics).
    *
    * Implementation: intervals replicate to the fixed-width buckets they
    * span (`sequence` + explode — bounded by `maxBucketsPerInterval`),
    * points land in exactly ONE bucket, and the sides meet on an
    * EQUI-join of (key, bucket) followed by the exact containment
    * filter. Each qualifying (interval, point) pair meets exactly once
    * (the point's single bucket), so there is no dedup pass; the plan
    * is shuffle-on-(key,bucket) + filter — no inequality-join fallback
    * to BroadcastNestedLoopJoin. Choose `bucketWidth` near the typical
    * interval span: too small replicates intervals, too large degrades
    * the bucket filter toward per-key all-pairs. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                keyCol: String, ptCol: String,
                startCol: String, endCol: String,
                bucketWidth: Long,
                maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val startB = floor(col(startCol) / bucketWidth).cast("long")
    val endB = floor(col(endCol) / bucketWidth).cast("long")
    // the guard lives INSIDE the sequence bound (an over-wide interval
    // fails loudly instead of exploding) — a separate guard column would
    // be pruned away by the optimizer and never evaluate. Malformed
    // intervals (end < start) are dropped BEFORE the explode: Spark's
    // sequence(a, b) with a > b DESCENDS rather than yielding empty, so
    // without the filter they would replicate to phantom buckets (the
    // containment filter still rejects them, but only after paying the
    // fan-out).
    val endGuarded = when(endB - startB < maxBucketsPerInterval, endB)
      .otherwise(raise_error(concat(
        lit(s"rangeJoin: interval spans more than $maxBucketsPerInterval " +
          s"buckets at width $bucketWidth — raise bucketWidth ("),
        endB - startB + 1, lit(" buckets needed)"))))
    val guarded = intervals
      .where(col(endCol) >= col(startCol))
      .withColumn("__bucket", explode(sequence(startB, endGuarded)))
    val pt = points.withColumn("__bucket",
      floor(col(ptCol) / bucketWidth).cast("long"))
    pt.join(guarded, Seq(keyCol, "__bucket"))
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
