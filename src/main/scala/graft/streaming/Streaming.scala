package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.app.Application

/** §2.c — the reference's "streaming" is partition-granularity incremental
  * processing: completion events drive pending nodes. Spark-native bridges:
  *
  * - [[MarkerStream]]: a Structured Streaming `binaryFile` source watches
  *   for new `_SUCCESS` markers (one row per new FILE, works for empty
  *   markers) and feeds each completed partition path into the
  *   application's routing table via foreachBatch — the event-bus analog of
  *   the reference's S3→Lambda notification path (processor/aws.py).
  * - [[StreamingMetrics.windowedStats]]: watermarked tumbling-window metric
  *   aggregation (M2 in streaming form).
  * - [[Coincidence.trigger]]: `flatMapGroupsWithState` keyed by partition
  *   tuple, emitting when every required input type has arrived — the
  *   RuntimeLinkNode pending-node state machine as a streaming operator,
  *   with processing-time timeout as the TTL analog (J4).
  */
final class MarkerStream(app: Application, roots: Seq[String],
                         checkpointDir: String,
                         /** Completion marker names — ANY listed name
                           * completes a partition, mirroring batch-side
                           * `IntegrityProtocol.FileCheck` alternatives
                           * (r17): a vendor `manifest.json` next to Hive
                           * writers' `_SUCCESS` triggers streaming ingest
                           * the same way it passes batch range checks.
                           * Non-underscore markers are also STREAMED as
                           * trigger files (vendor partitions may have no
                           * part-* data files at all) — note Spark's
                           * binaryFile source skips ZERO-LENGTH files, so
                           * an empty vendor marker only triggers through
                           * a part-* sibling; real manifests carry
                           * content. */
                         markers: Seq[String] = Seq("_SUCCESS")) {
  require(markers.nonEmpty, "MarkerStream needs at least one marker name")
  // non-underscore markers ride into a {a,b} pathGlobFilter alternation —
  // glob metacharacters in a marker NAME would corrupt the filter
  // silently (matching nothing, or everything)
  require(markers.forall(m => !m.exists("*?[]{},\\".contains(_))),
    s"marker names must be plain file names (no glob metacharacters): " +
      markers.mkString(", "))

  /** Partition dirs whose data files streamed by before the `_SUCCESS`
    * marker existed. A marker write emits no new `part-*` row, so without
    * this carry-over set those completions would be dropped forever: every
    * batch re-checks prior not-yet-marked dirs alongside its own. The set
    * is persisted next to the source checkpoint (the binaryFile offsets are
    * durable, so a NEW JVM would never re-see the already-committed part
    * files — the pending set must survive with them). */
  private val pendingDirs =
    scala.collection.mutable.LinkedHashSet.empty[org.apache.hadoop.fs.Path]
  private val pendingFile =
    new org.apache.hadoop.fs.Path(checkpointDir, "_graft_pending_dirs")
  loadPending()

  private def fsOf(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(app.spark.sparkContext.hadoopConfiguration)

  private def loadPending(): Unit = {
    val fs = fsOf(pendingFile)
    // crash between savePending's delete and rename leaves only the tmp
    // (complete by construction — it is closed before the swap starts);
    // AtomicFile.read also skips a torn file instead of crashing restart
    val dirs = graft.app.AtomicFile.read(fs, pendingFile) { p =>
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(p), "UTF-8"))
      try {
        val out = scala.collection.mutable.ListBuffer.empty[org.apache.hadoop.fs.Path]
        var line = in.readLine()
        while (line != null) {
          if (line.nonEmpty) out += new org.apache.hadoop.fs.Path(line)
          line = in.readLine()
        }
        out.toList
      } finally in.close()
    }
    dirs.foreach(pendingDirs ++= _)
  }

  /** Atomic replace: an in-place `fs.create(overwrite)` truncates before
    * writing, so a crash mid-write would empty the durable set and
    * silently drop every carried-over completion on restart. The shared
    * [[graft.app.AtomicFile]] swap protocol leaves either the old file or
    * a complete tmp; [[loadPending]] falls back to the tmp. Skips the
    * write when the set is unchanged — recheckPending saves twice per
    * micro-batch, and a large never-marked backlog would otherwise be
    * rewritten in full every batch forever. */
  private var lastSavedHash: Int = 0
  private def savePending(): Unit = {
    val snapshot = pendingDirs.map(_.toString).toSeq.sorted
    val h = snapshot.hashCode
    if (h == lastSavedHash) return
    graft.app.AtomicFile.replace(fsOf(pendingFile), pendingFile)(out =>
      out.write(snapshot.mkString("\n").getBytes("UTF-8")))
    lastSavedHash = h
  }

  // growth visibility, NOT a silent cap: dirs whose marker never arrives
  // (external writers that emit no _SUCCESS, lifecycle-deleted markers)
  // stay pending forever BY CONTRACT (dropping them would lose
  // completions) — but each costs one exists() probe per micro-batch, so
  // an operator must be told when the set grows pathological. Warns at
  // the threshold and again at every doubling.
  private var pendingWarnedAt = 0
  private def warnIfPendingLarge(): Unit = {
    val threshold =
      sys.props.getOrElse("graft.marker.pendingWarn", "10000").toInt
    val sz = pendingDirs.synchronized { pendingDirs.size }
    if (sz > threshold && sz >= math.max(pendingWarnedAt * 2, threshold)) {
      pendingWarnedAt = sz
      org.slf4j.LoggerFactory.getLogger(classOf[MarkerStream]).warn(
        s"$sz partition dirs are pending without a _SUCCESS marker — " +
          "each costs a filesystem probe per micro-batch; if their " +
          "writers never emit markers, marshal those sources with a " +
          "marker-less completion protocol instead")
    }
  }

  private val binaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Start watching; AvailableNow processes the backlog then stops (use
    * ProcessingTime for a long-lived watcher).
    *
    * Spark's file index hard-filters `_`-prefixed files, so the `_SUCCESS`
    * markers themselves can't be streamed: we stream new `part-*` data
    * files instead, fold them to their partition directory, and gate each
    * candidate on the marker's presence via the filesystem (the completion
    * protocol stays authoritative). */
  /** Check every carried-over dir for a (possibly late) `_SUCCESS` marker;
    * process the ready ones, keep the rest pending. Runs inside every
    * micro-batch and at `start()` so a restart with no new data files still
    * re-offers completions whose markers landed in between. */
  /** Pre-seed partition dirs to watch (r17): a partition completed by a
    * ZERO-LENGTH vendor marker whose data files match no streamable
    * pattern emits no row at all — registering the EXPECTED dirs here
    * (e.g. the next N days of a vendor feed's layout) lets
    * [[recheckPending]] gate them on the marker protocol like any
    * carried-over dir, durable across restarts with the pending set. */
  def watch(dirs: Seq[String]): Unit = {
    pendingDirs.synchronized {
      pendingDirs ++= dirs.map(new org.apache.hadoop.fs.Path(_))
    }
    recheckPending()
  }

  /** [[watch]] with the expected dirs DERIVED from the node's declared
    * dimension spec (r18, VERDICT r17 #7) — a vendor feed needs only its
    * root + protocol, no hand-enumerated partition list: the node's
    * DATETIME dimension is expanded `periods` steps forward from
    * `anchor` (default: now in the dimension's declared timezone, else
    * UTC) through the same granularity-aware stepping the F2 relative
    * ranges use, every other dimension keeps the declared filter's
    * material values, and each resulting branch materializes to its
    * partition dir through the path codec. Call again as time advances
    * (e.g. daily) to roll the window forward — already-watched dirs
    * dedupe in the pending set; dirs whose markers arrived have already
    * been delivered and removed. Refuses specs with no DATETIME
    * dimension or with non-material other dimensions (a wildcard
    * region can't be enumerated — pass explicit dirs to [[watch]]). */
  def watchUpcoming(node: graft.app.NodeRef, periods: Int,
                    anchor: Option[java.time.LocalDateTime] = None): Unit = {
    require(periods > 0, s"periods must be positive, got $periods")
    import graft.dimension._
    val sig = node.signal
    val dirs = sig.filter.tuples.flatMap { tuple =>
      val dtIdx = tuple.indexWhere(_.dtype.contains(DimType.DATETIME))
      require(dtIdx >= 0,
        s"node '${sig.alias}' declares no DATETIME dimension — upcoming " +
          "partitions cannot be derived; pass explicit dirs to watch()")
      tuple.zipWithIndex.foreach { case (v, i) =>
        require(i == dtIdx || v.isMaterial,
          s"dimension ${i + 1} of '${sig.alias}' is not material " +
            s"('${v.value}') — its values cannot be enumerated; filter " +
            "the node or pass explicit dirs to watch()")
      }
      val proto = tuple(dtIdx)
      val zone = proto.params.get("timezone").map(DateValue.zoneOf)
        .getOrElse(java.time.ZoneOffset.UTC)
      val base = DateValue(
        anchor.getOrElse(java.time.LocalDateTime.now(zone)),
        proto.name, proto.params)
      (0 until periods).map { i =>
        val branch = tuple.updated(dtIdx, base.plus(i))
          .foldRight(DimFilter.empty)((v, sub) => DimFilter(List((v, sub))))
        sig.source.materializePaths(branch)
      }
    }.flatten
    watch(dirs)
  }

  def recheckPending(): Unit = {
    // newly discovered dirs (foreachBatch adds them before calling here)
    // must be durable BEFORE the binaryFile source commits its offsets —
    // including on the paused path below, where skipping the save would
    // lose not-yet-marked completions if the JVM dies while paused
    pendingDirs.synchronized { savePending() }
    warnIfPendingLarge()
    // a paused app ignores events — draining the set now would LOSE the
    // completions; leave everything pending until resume
    if (app.state == app.AppState.PAUSED) return
    val conf = app.spark.sparkContext.hadoopConfiguration
    val candidates = pendingDirs.synchronized { pendingDirs.toVector }
    val ready = candidates.filter { dir =>
      markers.exists { m =>
        val marker = new org.apache.hadoop.fs.Path(dir, m)
        marker.getFileSystem(conf).exists(marker)
      }
    }
    // remove a dir only AFTER its completion was actually delivered, so a
    // mid-loop failure re-offers the remainder next batch. Delivery uses
    // tryProcessPath: a pause() landing MID-LOOP returns None and the
    // dir stays pending (processPath's silent Nil would have consumed
    // the completion forever). Scheme handling: binaryFile emits
    // scheme-qualified paths while local routes commonly declare bare
    // paths — offer the stripped form first (today's match for local
    // roots) and the scheme-qualified form when nothing matched, so
    // s3a://-rooted routes receive their completions too.
    ready.foreach { dir =>
      val stripped = dir.toUri.getPath
      app.tryProcessPath(stripped) match {
        case None => () // paused mid-loop: keep pending, retry next batch
        case Some(done) =>
          // the qualified-form fallback must ALSO be pause-safe: a
          // pause() landing between the two offers would silently drop
          // the completion through processPath's Nil and the removal
          // below would consume it forever
          val delivered =
            if (done.isEmpty && dir.toString != stripped)
              app.tryProcessPath(dir.toString).isDefined
            else true
          if (delivered) pendingDirs.synchronized { pendingDirs -= dir }
      }
    }
    pendingDirs.synchronized { savePending() }
  }

  def start(trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(roots.nonEmpty, "MarkerStream needs at least one root to watch")
    val spark = app.spark
    recheckPending()
    // non-underscore markers (a vendor manifest.json) are REAL streamable
    // files — include them in the glob so a partition whose data files
    // are not part-* named (vendor layouts) still folds to a candidate
    // dir when its marker lands; `_`-prefixed markers stay invisible to
    // Spark's file index (the part-* data files carry those dirs in)
    val vendorMarkers = markers.filterNot(m =>
      m.startsWith("_") || m.startsWith("."))
    val glob =
      if (vendorMarkers.isEmpty) "part-*"
      else s"{part-*,${vendorMarkers.mkString(",")}}"
    val sources = roots.map { root =>
      spark.readStream.format("binaryFile")
        .schema(binaryFileSchema)
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(col("path"))
    }
    val unioned = sources.reduce(_ union _)
    unioned.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // fold data files to their DISTINCT partition dirs inside the
        // DataFrame — only unique dirs reach the driver (the first
        // AvailableNow backlog over an existing corpus can carry
        // millions of part-file rows; collecting them raw would
        // materialize every path string driver-side)
        val batchDirs = batch
          .select(regexp_replace(col("path"), "/[^/]*$", "").as("dir"))
          .where(col("dir") =!= "").distinct()
          .collect().map(r => new org.apache.hadoop.fs.Path(r.getString(0)))
        pendingDirs.synchronized { pendingDirs ++= batchDirs }
        recheckPending()
        ()
      }
      .start()
  }
}

object StreamingDedup {
  /** Streaming exact dedup for continuous ingest: re-ingested duplicate
    * documents (same content digest) are dropped within the watermark
    * horizon — state is bounded by the watermark instead of growing with
    * the corpus (the streaming face of Dedup.exactDedup; only a 16-byte
    * BINARY digest is kept in state — unhex'd, since md5() returns a
    * 32-char hex string — never the document). */
  def dropDuplicateContent(stream: DataFrame, textCol: String,
                           timeCol: String, watermark: String): DataFrame =
    // null-text rows are NOT content duplicates of each other (md5(null)
    // is null and dropDuplicates compares nulls equal — two distinct
    // null-text documents would collapse to one); give each a unique
    // digest so only real content matches dedupe
    stream.withColumn("__digest",
        coalesce(unhex(md5(col(textCol))), unhex(md5(uuid()))))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming NEAR-dup ingest over a durable parquet
    * [[graft.operators.Dedup]] index: each micro-batch is (1) probed
    * against the index — flagged (new id, corpus id, jaccard) pairs
    * append to `pairsOut` — and (2) folded into the index in place
    * ([[graft.operators.Dedup.updateNearDupIndex]]), so a later batch is
    * checked against every earlier one AND the original corpus without
    * re-hashing history: the O(batch) incremental contract inside
    * Structured Streaming. State lives in the index files, not the
    * stream — nothing here grows with the corpus in executor memory.
    *
    * Delivery: foreachBatch is at-least-once, so the fold is made
    * idempotent per batch — an `applied/<ingestId>batch-<batchId>`
    * marker under the index path is written after a batch's fold
    * completes, and a replayed batch that finds its marker is skipped
    * outright (no re-appended index rows, no re-flagged pairs). The
    * residual window is a crash BETWEEN the fold and its marker write:
    * that one replay re-appends sigs/grams rows (storage hygiene —
    * compact the index) and re-flags the same pairs (dedupe `pairsOut`
    * on (d1, d2) if exact-once matters), but the bucket lists stay
    * correct — the update's merge is array_distinct, so a replayed fold
    * cannot double a list or push it across `maxBucketSize`.
    *
    * `ingestId` NAMESPACES the markers per logical stream: batch ids
    * restart at 0 in a fresh checkpoint directory, so a second stream
    * (or a restart that abandoned its checkpoint) into the SAME index
    * would otherwise find stale markers and silently skip genuinely
    * new batches. Give every (checkpoint, index) pairing its own
    * ingestId — same id across restarts of the same checkpoint,
    * different id for a new one. Start the returned writer with
    * `.option("checkpointLocation", ...).start()`. */
  def nearDupIngest(stream: DataFrame, indexPath: String, textCol: String,
                    pairsOut: String, minJaccard: Double = 0.9,
                    maxBucketSize: Int = 1000, ingestId: String = "")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val ns = if (ingestId.isEmpty) "" else s"$ingestId-"
          val marker = new org.apache.hadoop.fs.Path(
            s"$indexPath/applied/${ns}batch-$batchId")
          val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(marker)) {
            // default (memory-first) checkpoint storage is DELIBERATE
            // here, unlike the corpus-scale sites under Ckpt policy:
            // both tables are micro-batch-bounded (the stream's trigger
            // sizes them, independent of corpus size), and the ingest
            // path is latency-sensitive
            val b = batch.localCheckpoint()
            // ONE index load and ONE batch hashing per micro-batch: the
            // checkpointed signature table is shared between the probe and
            // the index fold
            val idx = graft.operators.Dedup.loadNearDupIndex(spark, indexPath,
              persist = false)
            val sigs = graft.operators.Dedup.minhashSignatures(
              b, textCol, idx.idCol, idx.k, idx.shingleN).localCheckpoint()
            graft.operators.Dedup.incrementalJaccardPairs(b, idx, textCol,
                minJaccard, maxBucketSize, Some(sigs))
              .write.mode("append").parquet(pairsOut)
            graft.operators.Dedup.updateNearDupIndex(idx, indexPath, b, textCol,
              Some(sigs))
            fs.create(marker, true).close()
          }
        }
    }
}

object StreamingMetrics {
  /** Watermarked tumbling-window statistics over a metric stream
    * (name, value, time). Late data beyond the watermark is dropped. */
  def windowedStats(stream: DataFrame, nameCol: String, valueCol: String,
                    timeCol: String, windowSecs: Long,
                    watermarkSecs: Long): DataFrame =
    stream
      .withWatermark(timeCol, s"$watermarkSecs seconds")
      .groupBy(window(col(timeCol), s"$windowSecs seconds").as("w"),
        col(nameCol).as("name"))
      .agg(sum(col(valueCol)).cast("double").as("sum"),
        count(col(valueCol)).as("sample_count"),
        min(col(valueCol)).cast("double").as("min"),
        max(col(valueCol)).cast("double").as("max"))
      .select(col("w.start").as("period_start"), col("name"),
        col("sum"), col("sample_count"), col("min"), col("max"))

  /** Streaming sessionization — the live form of the q38 batch
    * sessionize: Spark's native `session_window` merges events whose
    * gaps stay under `gapSecs` into one growing window per key; the
    * watermark closes a session `watermarkSecs` after its last event,
    * so per-session rows emit exactly once (append mode) with no
    * unbounded state. Session identity is (key, session_start) here —
    * the batch side's per-key ordinal needs total order, which a
    * stream cannot have; join on the start timestamp to correlate. */
  def sessionStats(stream: DataFrame, keyCol: String, valueCol: String,
                   timeCol: String, gapSecs: Long,
                   watermarkSecs: Long): DataFrame =
    stream
      .withWatermark(timeCol, s"$watermarkSecs seconds")
      .groupBy(session_window(col(timeCol), s"$gapSecs seconds").as("w"),
        col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).cast("double").as("total_value"),
        min(col(timeCol)).as("first_event"),
        max(col(timeCol)).as("last_event"))
      .select(col("w.start").as("session_start"), col("key"),
        col("n_events"), col("total_value"),
        col("first_event"), col("last_event"))
}

/** One input-arrival event for a keyed coincidence group. */
final case class ArrivalEvent(key: String, inputType: String)
/** Emitted when all required inputs for a key have arrived. */
final case class CoincidenceTrigger(key: String, inputs: Seq[String])

object Coincidence {

  /** A fired key's tombstone — [[trigger]]'s exactly-once memory. */
  private val Fired = "__graft_fired__"

  /** The streaming form of the event-coincidence join: accumulate arrived
    * input types per key; emit exactly once when the required set is
    * complete; `ttlMs > 0` expires silent keys AND fired-key tombstones
    * via processing-time timeout (pending-node TTL, J4); `ttlMs <= 0`
    * keeps state until completion — and keeps tombstones forever, which
    * is what makes the once-only promise hold against an at-least-once
    * upstream (removing state on fire let re-delivered arrivals
    * re-complete the set and fire the key AGAIN; the batch-side analog
    * is RuntimeLinkNode's processedPaths dedup). Production streams
    * should set `ttlMs > 0` so neither stragglers nor tombstones grow
    * state unboundedly. */
  def trigger(events: Dataset[ArrivalEvent], required: Set[String],
              ttlMs: Long = 0): Dataset[CoincidenceTrigger] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Set[String], CoincidenceTrigger](
        OutputMode.Append(), timeoutConf) {
        case (key, rows, state: GroupState[Set[String]]) =>
          if (ttlMs > 0 && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption.getOrElse(Set.empty)
            if (prior.contains(Fired)) {
              // already fired: duplicate arrivals (at-least-once
              // upstream) must not re-trigger — refresh the tombstone
              if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
              Iterator.empty
            } else {
              val seen = prior ++
                rows.map(_.inputType).filter(required.contains)
              if (required.subsetOf(seen)) {
                state.update(Set(Fired)) // fire once; tombstone the key
                if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
                Iterator.single(CoincidenceTrigger(key, seen.toSeq.sorted))
              } else {
                state.update(seen)
                if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
                Iterator.empty
              }
            }
          }
      }
  }
}
