package graft.compute

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.signal.Signal

/** APPEND-partition compaction: every append lands its own part files,
  * so a long-lived APPEND partition accumulates files without bound —
  * at 100 TB the small-file problem (NameNode pressure, per-file open
  * cost, tiny row groups) dominates long before query cost does. The
  * reference's sink has no rewrite path at all
  * (glueetl_default_ABI.py:380-446); this is a deliberate improvement.
  *
  * Protocol (honors the `_SUCCESS`/`_SCHEMA.spark.json` completion
  * contract, crash-healable at every step):
  *
  *  1. heal any interrupted previous swap (rollback — see below);
  *  2. read the partition's committed part files, rewrite them into
  *     `<data>/.compact-tmp/` at ~`targetFileBytes` per file (file count
  *     from ACTUAL on-disk bytes, not an estimate);
  *  3. swap under a manifest: write `.compact-manifest` (old + new file
  *     name lists), remove the partition-root `_SUCCESS` (integrity
  *     probes gate on it, so no NEW read starts mid-swap), move old
  *     files to `<data>/.compact-old/`, move new files in, restore
  *     `_SUCCESS`, then clear manifest + temp dirs.
  *
  * Readers: Spark's file index ignores `.`/`_`-prefixed paths, so the
  * tmp/old dirs are invisible; per-file rename is atomic on
  * local/HDFS, and a reader that already opened old handles keeps
  * reading them (POSIX/HDFS unlink semantics). New readers are held off
  * by the missing `_SUCCESS`. Stores without atomic rename should point
  * compaction at a quiet window; appends to the SAME partition must be
  * serialized with compaction by the caller (route executions already
  * serialize per partition).
  *
  * Healing is ROLLBACK-only and deterministic from the manifest: delete
  * any moved-in NEW file, move every `.compact-old` file back, restore
  * `_SUCCESS`, drop manifest + temp dirs. The old file set is a complete
  * committed state at every step, so rollback never loses data;
  * compaction work is simply redone. Files NOT in the manifest (a
  * concurrent append that slipped in) are never touched.
  */
object Compaction {

  final case class CompactStats(filesBefore: Int, filesAfter: Int,
                                bytes: Long, healed: Boolean,
                                skipped: Boolean)

  private val TmpDir = ".compact-tmp"
  private val OldDir = ".compact-old"
  private val Manifest = ".compact-manifest"

  private def log = org.slf4j.LoggerFactory.getLogger(Compaction.getClass)

  /** Fold a completed (non-skipped) rewrite into [[MaintenanceMetrics]]
    * — one call per swap, shared by all four compaction variants (and
    * Pq.compactIvfPq). `t0` = nanoTime at rewrite start. */
  private[graft] def recordCompaction(filesBefore: Int, filesAfter: Int,
                                      bytes: Long, t0: Long): Unit = {
    MaintenanceMetrics.add("maintenance.compaction.swaps")
    MaintenanceMetrics.add("maintenance.compaction.filesCollapsed",
      math.max(0L, (filesBefore - filesAfter).toLong))
    MaintenanceMetrics.add("maintenance.compaction.bytesRewritten", bytes)
    MaintenanceMetrics.add("maintenance.compaction.wallMs",
      (System.nanoTime() - t0) / 1000000L)
  }

  /** Committed data files of a partition: skip `_` markers, `.` work
    * dirs/hidden files — the same rule Spark's own file index applies. */
  private def dataFiles(fs: FileSystem, dir: Path): Seq[(String, Long)] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.getName, s.getLen))

  /** Compact one materialized partition of `output` (tip path). No-op
    * (skipped=true) when the partition is already at or below the file
    * count its byte size warrants. `failpoint` is a test seam: invoked
    * with a step label right AFTER that step completes. */
  def compactPartition(spark: SparkSession, output: Signal,
                       targetFileBytes: Long,
                       failpoint: String => Unit = _ => ()): CompactStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val attrs = output.source.attrs
    val root = new Path(output.materializedPaths.head)
    val dataPath = attrs.dataFolder
      .map(d => new Path(root, d)).getOrElse(root)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)

    val healed = healPartition(spark, output)

    require(fs.exists(new Path(root, "_SUCCESS")),
      s"refusing to compact incomplete partition $root (no _SUCCESS)")
    require(!output.source.attrs.versioned &&
        !fs.listStatus(dataPath).exists(
          _.getPath.getName.startsWith(OutputWriter.DataPtrPrefix)),
      s"partition $root uses the versioned REPLACE layout — every " +
        "versioned write is already a full rewrite; recompact by " +
        "re-writing the node (in-place file swaps would bypass the " +
        "pointer commit)")
    val files = dataFiles(fs, dataPath)
    val total = files.map(_._2).sum
    val wanted = math.min(65536L,
      math.max(1L, (total + targetFileBytes - 1) / targetFileBytes))
    if (files.size <= wanted) {
      MaintenanceMetrics.add("maintenance.compaction.skipped")
      return CompactStats(files.size, files.size, total, healed, skipped = true)
    }
    val t0 = System.nanoTime()

    // rewrite: reading N small files gives ~N input partitions; coalesce
    // is narrow (no shuffle) and the target count is exact
    val tmp = new Path(dataPath, TmpDir)
    fs.delete(tmp, true)
    var reader = spark.read.format(attrs.format)
    if (attrs.format.equalsIgnoreCase("csv"))
      reader = reader.option("header", attrs.header.toString)
        .option("sep", attrs.delimiter)
    // APPEND partitions can hold batches whose schemas evolved (managed
    // appends are path-based and re-stamp _SCHEMA.spark.json per batch);
    // without mergeSchema the rewrite would take ONE arbitrary footer's
    // schema and silently drop columns present only in other files —
    // row counts still match, so it would read as a clean compaction.
    // The union schema keeps every column; pre-evolution rows read NULL.
    if (attrs.format.equalsIgnoreCase("parquet") ||
        attrs.format.equalsIgnoreCase("orc"))
      reader = reader.option("mergeSchema", "true")
    val df = reader.load(files.map { case (n, _) =>
      new Path(dataPath, n).toString }: _*)
    var writer = df.coalesce(wanted.toInt).write
      .format(attrs.format).mode("overwrite")
    if (attrs.format.equalsIgnoreCase("csv"))
      writer = writer.option("header", attrs.header.toString)
        .option("sep", attrs.delimiter)
    attrs.compression.foreach(c => writer = writer.option("compression", c))
    writer.save(tmp.toString)
    val newFiles = dataFiles(fs, tmp).map(_._1)
    failpoint("rewritten")

    // ---- the manifest-guarded swap ----
    val manifest = new Path(dataPath, Manifest)
    val body = (files.map { case (n, _) => s"old\t$n" } ++
      newFiles.map(n => s"new\t$n")).mkString("", "\n", "\n")
    val out = fs.create(manifest, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    failpoint("manifest-written")

    fs.delete(new Path(root, "_SUCCESS"), false)
    failpoint("success-removed")

    val old = new Path(dataPath, OldDir)
    fs.mkdirs(old)
    files.foreach { case (n, _) =>
      if (!fs.rename(new Path(dataPath, n), new Path(old, n)))
        throw new java.io.IOException(s"compaction: cannot move $n aside")
    }
    failpoint("old-moved")

    newFiles.foreach { n =>
      if (!fs.rename(new Path(tmp, n), new Path(dataPath, n)))
        throw new java.io.IOException(s"compaction: cannot move $n in")
    }
    failpoint("new-moved")

    fs.create(new Path(root, "_SUCCESS"), true).close()
    failpoint("committed")

    // manifest deletion is the HEALING COMMIT POINT and must come FIRST:
    // healing rolls back whenever a manifest exists, so deleting the
    // old dir before the manifest would leave a window where heal
    // deletes the new files with nothing left to restore
    fs.delete(manifest, false)
    fs.delete(old, true)
    fs.delete(tmp, true)
    log.info(s"compacted $dataPath: ${files.size} files / $total bytes " +
      s"-> ${newFiles.size} files")
    recordCompaction(files.size, newFiles.size, total, t0)
    CompactStats(files.size, newFiles.size, total, healed, skipped = false)
  }

  /** Roll back an interrupted swap on `output`'s tip partition. Returns
    * true when there was one to heal. Deterministic from the manifest:
    * after healing, the partition holds exactly its pre-compaction
    * committed state (plus any concurrently-appended files, untouched).
    * Idempotent — healing a healed or untouched partition is a no-op. */
  def healPartition(spark: SparkSession, output: Signal): Boolean = {
    val attrs = output.source.attrs
    val root = new Path(output.materializedPaths.head)
    val dataPath = attrs.dataFolder
      .map(d => new Path(root, d)).getOrElse(root)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(dataPath, Manifest)
    if (!fs.exists(manifest)) {
      // no swap in flight. Clear stale work dirs: a tmp dir from a
      // crash BEFORE the manifest was written (old state fully intact),
      // or tmp/old dirs from a crash AFTER the post-commit manifest
      // delete (new state fully committed — the old dir only ever
      // exists alongside a manifest or after commit)
      fs.delete(new Path(dataPath, TmpDir), true)
      fs.delete(new Path(dataPath, OldDir), true)
      return false
    }
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(manifest), "UTF-8"))
    val (oldNames, newNames) = {
      val o = List.newBuilder[String]; val n = List.newBuilder[String]
      try {
        var line = in.readLine()
        while (line != null) {
          line.split('\t') match {
            case Array("old", f) => o += f
            case Array("new", f) => n += f
            case _ => ()
          }
          line = in.readLine()
        }
      } finally in.close()
      (o.result(), n.result())
    }
    // 1. moved-in new files go (they are reproducible; old is canonical)
    newNames.foreach(n => fs.delete(new Path(dataPath, n), false))
    // 2. aside-moved old files come back
    val old = new Path(dataPath, OldDir)
    oldNames.foreach { n =>
      val aside = new Path(old, n)
      if (fs.exists(aside) && !fs.rename(aside, new Path(dataPath, n)))
        throw new java.io.IOException(s"heal: cannot restore $n")
    }
    // 3. completion marker back, work dirs gone
    fs.create(new Path(root, "_SUCCESS"), true).close()
    fs.delete(old, true)
    fs.delete(new Path(dataPath, TmpDir), true)
    fs.delete(manifest, false)
    log.warn(s"healed interrupted compaction swap at $dataPath " +
      s"(${oldNames.size} committed files restored)")
    MaintenanceMetrics.add("maintenance.heal.rolledBack")
    true
  }

  // ================= object-store-safe variant =================
  //
  // `compactPartition` above assumes atomic per-file rename (local/HDFS).
  // On S3-class stores rename is copy+delete and not atomic, so the
  // rollback-only heal could observe half-moved state it cannot undo.
  // This variant performs ZERO renames on the swap path and keeps its
  // manifest in a [[graft.routing.ConditionalKv]] (the same primitive
  // the lease/WAL stack uses — S3 `If-None-Match: *`):
  //
  //  1. rewrite into `.compact-tmp` (on a real object store, run the
  //     rewrite with a zero-rename committer; the SWAP below is what
  //     this variant makes rename-free);
  //  2. CLAIM the swap: conditional PUT of a manifest recording old and
  //     new file names WITH LENGTHS — two concurrent compactors cannot
  //     both claim (the loser aborts loudly);
  //  3. remove `_SUCCESS` (single object delete — new readers held off);
  //  4. COPY new files tmp -> data dir (a PUT per file; object PUTs are
  //     all-or-nothing, and lengths in the manifest let heal detect a
  //     partial local-FS copy);
  //  5. only once ALL new files are fully present, delete the old files
  //     — "all new present at recorded lengths" IS the commit point;
  //  6. restore `_SUCCESS`, drop the manifest, clear tmp.
  //
  // Healing is decided from the manifest alone: all new files present at
  // their recorded lengths -> ROLL FORWARD (finish deleting old, restore
  // marker); anything less -> ROLL BACK (delete copied-in new files —
  // the invariant "no old file deleted before every new file is in"
  // guarantees the old set is complete). Both directions are idempotent.
  // Files not listed in the manifest (a concurrent append) are never
  // touched in either direction.

  /** Rename-free compaction of `output`'s tip partition, manifest-guarded
    * through `kv`. Semantics and stats match [[compactPartition]].
    *
    * Concurrency (r15): the manifest carries a unique claim token +
    * timestamp, and the claim is RE-VERIFIED immediately before the
    * destructive step (the old-file delete). If another actor healed or
    * re-claimed the swap in the meantime — e.g. a second compactor whose
    * entry heal rolled this one back mid-copy — this compactor aborts
    * loudly instead of deleting files that a restored `_SUCCESS` now
    * presents as committed. `healMinClaimAgeMs` > 0 additionally makes
    * the ENTRY heal refuse manifests younger than that lease-style TTL
    * (a fresh claim is likely a live claimant). The DEFAULT is
    * [[FsClaim.DefaultTtlMs]] — the safe side: a direct caller cannot
    * accidentally roll back a live overlapping compactor mid-copy
    * (r15-ADVICE race). Pass 0 ONLY where compactors provably never
    * overlap (single-driver crash recovery that must heal immediately
    * rather than wait out the TTL). */
  def compactPartitionKv(spark: SparkSession, output: Signal,
                         targetFileBytes: Long,
                         kv: graft.routing.ConditionalKv,
                         failpoint: String => Unit = _ => (),
                         healMinClaimAgeMs: Long = FsClaim.DefaultTtlMs)
      : CompactStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val attrs = output.source.attrs
    val root = new Path(output.materializedPaths.head)
    val dataPath = attrs.dataFolder
      .map(d => new Path(root, d)).getOrElse(root)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)

    val healed = healPartitionKv(spark, output, kv, healMinClaimAgeMs)

    require(fs.exists(new Path(root, "_SUCCESS")),
      s"refusing to compact incomplete partition $root (no _SUCCESS)")
    require(!output.source.attrs.versioned &&
        !fs.listStatus(dataPath).exists(
          _.getPath.getName.startsWith(OutputWriter.DataPtrPrefix)),
      s"partition $root uses the versioned REPLACE layout — every " +
        "versioned write is already a full rewrite; recompact by " +
        "re-writing the node (in-place file swaps would bypass the " +
        "pointer commit)")
    val files = dataFiles(fs, dataPath)
    val total = files.map(_._2).sum
    val wanted = math.min(65536L,
      math.max(1L, (total + targetFileBytes - 1) / targetFileBytes))
    if (files.size <= wanted) {
      MaintenanceMetrics.add("maintenance.compaction.skipped")
      return CompactStats(files.size, files.size, total, healed, skipped = true)
    }
    val t0 = System.nanoTime()

    val tmp = new Path(dataPath, TmpDir)
    fs.delete(tmp, true)
    var reader = spark.read.format(attrs.format)
    if (attrs.format.equalsIgnoreCase("csv"))
      reader = reader.option("header", attrs.header.toString)
        .option("sep", attrs.delimiter)
    if (attrs.format.equalsIgnoreCase("parquet") ||
        attrs.format.equalsIgnoreCase("orc"))
      reader = reader.option("mergeSchema", "true")
    val df = reader.load(files.map { case (n, _) =>
      new Path(dataPath, n).toString }: _*)
    var writer = df.coalesce(wanted.toInt).write
      .format(attrs.format).mode("overwrite")
    if (attrs.format.equalsIgnoreCase("csv"))
      writer = writer.option("header", attrs.header.toString)
        .option("sep", attrs.delimiter)
    attrs.compression.foreach(c => writer = writer.option("compression", c))
    writer.save(tmp.toString)
    val newFiles = dataFiles(fs, tmp)
    failpoint("rewritten")
    kvSwapCore(fs, conf, dataPath, Some(new Path(root, "_SUCCESS")),
      files, newFiles, tmp, kv, failpoint)
    log.info(s"compacted (kv) $dataPath: ${files.size} files / $total " +
      s"bytes -> ${newFiles.size} files")
    recordCompaction(files.size, newFiles.size, total, t0)
    CompactStats(files.size, newFiles.size, total, healed, skipped = false)
  }

  /** The rename-free KV-guarded swap shared by [[compactPartitionKv]]
    * (marker = the partition's `_SUCCESS`) and [[compactDirKv]]
    * (markerless flat table): claim (conditional PUT — a second
    * claimant loses loudly) -> marker off -> COPY new files in -> RE-
    * VERIFY the claim (the destructive-step guard: a swap healed or
    * re-claimed mid-copy aborts here, before any old file dies) ->
    * delete old -> marker on -> conditional manifest drop. "All new
    * present at recorded lengths" is the commit point [[healKvSwap]]
    * decides direction from. */
  private def kvSwapCore(fs: FileSystem,
                         conf: org.apache.hadoop.conf.Configuration,
                         dataPath: Path, marker: Option[Path],
                         files: Seq[(String, Long)],
                         newFiles: Seq[(String, Long)], tmp: Path,
                         kv: graft.routing.ConditionalKv,
                         failpoint: String => Unit): Unit = {
    // the conditional claim: a second compactor (or a zombie of this
    // one) must not start a concurrent swap on the same target. The
    // claim line's token makes this compactor's manifest distinguishable
    // from any later re-claim, and its timestamp feeds the heal TTL.
    val key = manifestKey(dataPath)
    val claim = s"claim\t${java.util.UUID.randomUUID()}\t" +
      s"${System.currentTimeMillis()}"
    val body = (claim +: (files.map { case (n, l) => s"old\t$n\t$l" } ++
      newFiles.map { case (n, l) => s"new\t$n\t$l" })).mkString("\n")
    if (!kv.putIfNoneMatch(key, body))
      throw new java.io.IOException(
        s"compaction: swap already claimed for $dataPath (manifest key " +
          s"$key exists) — heal or let the claimant finish first")
    failpoint("manifest-claimed")

    marker.foreach(m => fs.delete(m, false))
    failpoint("success-removed")

    newFiles.foreach { case (n, _) =>
      copyFile(fs, conf, new Path(tmp, n), new Path(dataPath, n))
    }
    failpoint("new-copied")

    // DESTRUCTIVE-STEP GUARD: re-read the manifest and require it still
    // holds THIS compactor's exact body. A second compactor whose entry
    // heal ran mid-copy has rolled this swap back (deleting the copied
    // new files and restoring the marker) and may have re-claimed the
    // key; deleting the old files now would destroy the state that
    // restored marker presents as committed. Abort loudly instead —
    // nothing destructive has happened yet and the current claimant (or
    // a heal) owns the target.
    if (!kv.get(key).contains(body))
      throw new java.io.IOException(
        s"compaction: claim lost for $dataPath (manifest at $key changed " +
          "or vanished mid-swap — another compactor healed or re-claimed " +
          "it); aborting before the old-file delete")
    failpoint("claim-verified")

    // all new files are in at their recorded lengths — the commit point;
    // old deletion may now begin
    files.foreach { case (n, _) =>
      fs.delete(new Path(dataPath, n), false)
    }
    failpoint("old-deleted")

    marker.foreach(m => fs.create(m, true).close())
    failpoint("committed")

    // conditional cleanup: only drop the manifest if it is still OURS —
    // an unconditional (or get-then-delete) cleanup could destroy a
    // successor's freshly-claimed manifest; deleteIfValue is atomic on
    // stores that support conditional delete (CAS / S3 If-Match)
    kv.deleteIfValue(key, body)
    fs.delete(tmp, true)
  }

  /** Heal an interrupted KV-guarded swap on `output`'s tip partition:
    * roll FORWARD when every manifest-listed new file is present at its
    * recorded length, roll BACK otherwise. Idempotent; returns true when
    * there was a swap to heal. `minClaimAgeMs` > 0 REFUSES (throws) when
    * the manifest's claim is younger than that — a fresh claim is likely
    * a LIVE compactor mid-copy, and healing it would yank the partition
    * out from under it (its own destructive step is guarded by the
    * claim re-verify, but its work is wasted and the window reopens). */
  def healPartitionKv(spark: SparkSession, output: Signal,
                      kv: graft.routing.ConditionalKv,
                      minClaimAgeMs: Long = 0L): Boolean = {
    val attrs = output.source.attrs
    val root = new Path(output.materializedPaths.head)
    val dataPath = attrs.dataFolder
      .map(d => new Path(root, d)).getOrElse(root)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    healKvSwap(fs, dataPath, Some(new Path(root, "_SUCCESS")), kv,
      minClaimAgeMs)
  }

  /** [[healKvSwap]] shared by the partition and flat-dir variants. */
  private def healKvSwap(fs: FileSystem, dataPath: Path,
                         marker: Option[Path],
                         kv: graft.routing.ConditionalKv,
                         minClaimAgeMs: Long): Boolean = {
    val key = manifestKey(dataPath)
    kv.get(key) match {
      case None =>
        fs.delete(new Path(dataPath, TmpDir), true)
        false
      case Some(body) =>
        val olds = List.newBuilder[(String, Long)]
        val news = List.newBuilder[(String, Long)]
        var claimedAt = -1L
        body.split('\n').foreach(_.split('\t') match {
          case Array("old", n, l) => olds += ((n, l.toLong))
          case Array("new", n, l) => news += ((n, l.toLong))
          case Array("claim", _, ts) => claimedAt = ts.toLongOption.getOrElse(-1L)
          case _ => ()
        })
        if (minClaimAgeMs > 0 && claimedAt > 0) {
          val age = System.currentTimeMillis() - claimedAt
          if (age < minClaimAgeMs)
            throw new java.io.IOException(
              s"heal: swap at $dataPath was claimed ${age}ms ago " +
                s"(< $minClaimAgeMs ms TTL) — the claimant may be live; " +
                "refusing to heal (retry after the TTL)")
        }
        val (oldFiles, newFiles) = (olds.result(), news.result())
        def presentAt(n: String, len: Long): Boolean = {
          val p = new Path(dataPath, n)
          fs.exists(p) && fs.getFileStatus(p).getLen == len
        }
        val committed = newFiles.forall { case (n, l) => presentAt(n, l) }
        if (committed) {
          // ROLL FORWARD: the swap reached its commit point — finish it
          oldFiles.foreach { case (n, _) =>
            fs.delete(new Path(dataPath, n), false) }
          log.warn(s"healed interrupted kv compaction at $dataPath: " +
            s"rolled FORWARD (${newFiles.size} new files committed)")
          MaintenanceMetrics.add("maintenance.heal.rolledForward")
        } else {
          // ROLL BACK: the ordering invariant says the old set is
          // complete — but VERIFY that before destroying the new copies
          // (the only other recoverable state). If the invariant was
          // ever violated (bug, manual intervention, inconsistent
          // listing), failing here leaves BOTH sides on disk for a
          // human; deleting new first would have left neither.
          oldFiles.foreach { case (n, l) =>
            if (!presentAt(n, l))
              throw new java.io.IOException(
                s"heal: committed file $n missing or wrong length during " +
                  s"rollback at $dataPath — ordering invariant violated; " +
                  "leaving all files in place for manual recovery")
          }
          newFiles.foreach { case (n, _) =>
            fs.delete(new Path(dataPath, n), false) }
          log.warn(s"healed interrupted kv compaction at $dataPath: " +
            s"rolled BACK (${oldFiles.size} committed files intact)")
          MaintenanceMetrics.add("maintenance.heal.rolledBack")
        }
        marker.foreach(m => fs.create(m, true).close())
        fs.delete(new Path(dataPath, TmpDir), true)
        kv.delete(key)
        true
    }
  }

  /** Rename-free KV-guarded compaction of one FLAT parquet table
    * directory — [[compactDir]]'s semantics with [[compactPartitionKv]]'s
    * zero-rename swap, for index row tables living on object stores
    * (near-dup sigs/grams). No completion-marker choreography (flat
    * tables have none); readers are held off by their own claim/
    * manifest checks (loadNearDupIndex refuses or heals). */
  /** Advisory in-flight marker a [[compactDirKv]] swap leaves in the
    * table dir: the KV manifest is invisible to plain-FS readers, so a
    * reader that only has the filesystem (loadNearDupIndex) can still
    * detect a crashed KV swap and refuse loudly instead of silently
    * reading duplicate (pre-commit) or partial (post-commit) rows.
    * Healed KV swaps remove it; it carries no swap state itself. */
  val DirKvInflight = ".compact-kv-inflight"

  def compactDirKv(spark: SparkSession, dir: String, targetFileBytes: Long,
                   kv: graft.routing.ConditionalKv,
                   failpoint: String => Unit = _ => (),
                   healMinClaimAgeMs: Long = FsClaim.DefaultTtlMs)
      : DirCompactStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val dataPath = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dataPath.getFileSystem(conf)
    // the same versioned-REPLACE refusal compactPartition/-Kv apply:
    // `dir` may be a data_v<N> dir INSIDE a versioned partition (pointer
    // files live in the PARENT) or a partition root carrying pointers
    // itself — an in-place swap there mutates a version a reader may
    // hold, bypassing the pointer commit
    def hasPtrs(p: Path): Boolean =
      try fs.listStatus(p).exists(
        _.getPath.getName.startsWith(OutputWriter.DataPtrPrefix))
      catch { case _: java.io.FileNotFoundException => false }
    require(!hasPtrs(dataPath) &&
        !Option(dataPath.getParent).exists(hasPtrs),
      s"$dir is (inside) a versioned REPLACE layout — every versioned " +
        "write is already a full rewrite; recompact by re-writing the " +
        "node (in-place file swaps would bypass the pointer commit)")
    val healed = healDirKv(spark, dir, kv, healMinClaimAgeMs)
    val files = dataFiles(fs, dataPath)
    val total = files.map(_._2).sum
    val wanted = math.min(65536L,
      math.max(1L, (total + targetFileBytes - 1) / targetFileBytes))
    if (files.size <= wanted) {
      MaintenanceMetrics.add("maintenance.compaction.skipped")
      return DirCompactStats(files.size, files.size, total, healed,
        skipped = true)
    }
    val t0 = System.nanoTime()
    val tmp = new Path(dataPath, TmpDir)
    fs.delete(tmp, true)
    spark.read.option("mergeSchema", "true")
      .parquet(files.map { case (n, _) => new Path(dataPath, n).toString }: _*)
      .coalesce(wanted.toInt)
      .write.mode("overwrite").parquet(tmp.toString)
    val newFiles = dataFiles(fs, tmp)
    failpoint("rewritten")
    // advisory marker BEFORE the claim: any crash window inside the KV
    // swap is covered (a marker with no KV manifest heals to a no-op)
    fs.create(new Path(dataPath, DirKvInflight), true).close()
    try kvSwapCore(fs, conf, dataPath, None, files, newFiles, tmp, kv,
      failpoint)
    catch {
      case e: Throwable =>
        // CONTROLLED failure (r16): when no KV manifest stands for this
        // dir — we lost the putIfNoneMatch race before writing one, or
        // the claim-verify abort saw ours already healed away — nothing
        // destructive happened and leaving the marker would make every
        // plain-FS load refuse ("interrupted OBJECT-STORE swap") until a
        // manual healDirKv. A manifest that IS present may be ours
        // (crash state — heal needed, marker must stay) or a live
        // successor's (they created their own marker and will clear it);
        // either way the marker stays. Cleanup is best-effort: a failure
        // here must not mask the swap's own exception.
        try {
          if (kv.get(manifestKey(dataPath)).isEmpty)
            fs.delete(new Path(dataPath, DirKvInflight), false)
        } catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
    fs.delete(new Path(dataPath, DirKvInflight), false)
    log.info(s"compacted (kv) $dataPath: ${files.size} files / $total " +
      s"bytes -> ${newFiles.size} files")
    recordCompaction(files.size, newFiles.size, total, t0)
    DirCompactStats(files.size, newFiles.size, total, healed,
      skipped = false)
  }

  /** Heal an interrupted [[compactDirKv]] swap: forward/back decided
    * from the manifest's recorded lengths, exactly [[healPartitionKv]]
    * without the marker restore. */
  def healDirKv(spark: SparkSession, dir: String,
                kv: graft.routing.ConditionalKv,
                minClaimAgeMs: Long = 0L): Boolean = {
    val dataPath = new Path(dir)
    val fs = dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val acted = healKvSwap(fs, dataPath, None, kv, minClaimAgeMs)
    fs.delete(new Path(dataPath, DirKvInflight), false)
    acted
  }

  // ================= flat table-directory variant =================
  //
  // Durable-index row tables (near-dup sigs/grams — parquet-APPENDed
  // per ingest batch, Dedup.updateNearDupIndex) accumulate ~1 file per
  // batch per table with no completion-marker contract and no partition
  // tree: a year of daily updates is ~730 files per table, the same
  // small-file debt compactIvfPq closes for the PQ index. This is the
  // compactPartition swap minus the `_SUCCESS` choreography: rewrite to
  // `.compact-tmp`, manifest, move old aside, move new in, drop
  // manifest (the healing commit point), clear work dirs. Healing is
  // rollback-only from the manifest, identical to [[healPartition]].
  // Callers serialize with concurrent updates of the same table (the
  // updateNearDupIndex crash contract already requires an outer
  // snapshot/serialize discipline across its three sub-tables).

  final case class DirCompactStats(filesBefore: Int, filesAfter: Int,
                                   bytes: Long, healed: Boolean,
                                   skipped: Boolean)

  /** Compact one flat parquet table directory to ~`targetFileBytes`
    * per file. No-op (skipped=true) at or below the warranted count. */
  def compactDir(spark: SparkSession, dir: String, targetFileBytes: Long,
                 failpoint: String => Unit = _ => ()): DirCompactStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val dataPath = new Path(dir)
    val fs = dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val healed = healDir(spark, dir)
    val files = dataFiles(fs, dataPath)
    val total = files.map(_._2).sum
    val wanted = math.min(65536L,
      math.max(1L, (total + targetFileBytes - 1) / targetFileBytes))
    if (files.size <= wanted) {
      MaintenanceMetrics.add("maintenance.compaction.skipped")
      return DirCompactStats(files.size, files.size, total, healed,
        skipped = true)
    }
    val t0 = System.nanoTime()

    val tmp = new Path(dataPath, TmpDir)
    fs.delete(tmp, true)
    spark.read.option("mergeSchema", "true")
      .parquet(files.map { case (n, _) => new Path(dataPath, n).toString }: _*)
      .coalesce(wanted.toInt)
      .write.mode("overwrite").parquet(tmp.toString)
    val newFiles = dataFiles(fs, tmp).map(_._1)
    failpoint("rewritten")

    val manifest = new Path(dataPath, Manifest)
    val body = (files.map { case (n, _) => s"old\t$n" } ++
      newFiles.map(n => s"new\t$n")).mkString("", "\n", "\n")
    val out = fs.create(manifest, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    failpoint("manifest-written")

    val old = new Path(dataPath, OldDir)
    fs.mkdirs(old)
    files.foreach { case (n, _) =>
      if (!fs.rename(new Path(dataPath, n), new Path(old, n)))
        throw new java.io.IOException(s"compactDir: cannot move $n aside")
    }
    failpoint("old-moved")
    newFiles.foreach { n =>
      if (!fs.rename(new Path(tmp, n), new Path(dataPath, n)))
        throw new java.io.IOException(s"compactDir: cannot move $n in")
    }
    failpoint("new-moved")

    // manifest deletion is the healing commit point — first, as above
    fs.delete(manifest, false)
    failpoint("committed")
    fs.delete(old, true)
    fs.delete(tmp, true)
    log.info(s"compacted $dataPath: ${files.size} files / $total bytes " +
      s"-> ${newFiles.size} files")
    recordCompaction(files.size, newFiles.size, total, t0)
    DirCompactStats(files.size, newFiles.size, total, healed,
      skipped = false)
  }

  /** Roll back an interrupted [[compactDir]] swap; true when there was
    * one. Identical discipline to [[healPartition]]: the old set is a
    * complete committed state at every pre-commit step, unlisted files
    * are never touched, healing is idempotent. */
  def healDir(spark: SparkSession, dir: String): Boolean = {
    val dataPath = new Path(dir)
    val fs = dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(dataPath, Manifest)
    if (!fs.exists(manifest)) {
      fs.delete(new Path(dataPath, TmpDir), true)
      fs.delete(new Path(dataPath, OldDir), true)
      return false
    }
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(manifest), "UTF-8"))
    val (oldNames, newNames) = {
      val o = List.newBuilder[String]; val n = List.newBuilder[String]
      try {
        var line = in.readLine()
        while (line != null) {
          line.split('\t') match {
            case Array("old", f) => o += f
            case Array("new", f) => n += f
            case _ => ()
          }
          line = in.readLine()
        }
      } finally in.close()
      (o.result(), n.result())
    }
    newNames.foreach(n => fs.delete(new Path(dataPath, n), false))
    val old = new Path(dataPath, OldDir)
    oldNames.foreach { n =>
      val aside = new Path(old, n)
      if (fs.exists(aside) && !fs.rename(aside, new Path(dataPath, n)))
        throw new java.io.IOException(s"healDir: cannot restore $n")
    }
    fs.delete(old, true)
    fs.delete(new Path(dataPath, TmpDir), true)
    fs.delete(manifest, false)
    log.warn(s"healed interrupted compactDir swap at $dataPath " +
      s"(${oldNames.size} committed files restored)")
    MaintenanceMetrics.add("maintenance.heal.rolledBack")
    true
  }

  private def manifestKey(dataPath: Path): String =
    s"compact/${dataPath.toString}"

  /** Versioned-directory layout with immutable pointer-file commits
    * (r15): a table lives in `<dirPrefix><N>/` directories; the
    * committed one is named by the highest-seq VALID pointer file
    * `<ptrPrefix><N>` (content = the directory name). Commit = ONE
    * small PUT of a fresh pointer — atomic on object stores, and
    * crash-safe everywhere because readers SKIP invalid pointers: torn
    * content (crash mid-PUT on a local FS) or a target directory
    * without `_SUCCESS` falls back to the previous version. Writers
    * never rename; a crash between the data write and the pointer PUT
    * leaves an orphan directory the retry overwrites (same seq is
    * recomputed). The public-engineering precedent is the metadata-
    * pointer commit of table formats (Iceberg/Delta-style).
    *
    * Retention: [[gc]] keeps the committed version plus its
    * predecessor. A reader resolves the pointer ONCE per load, so a
    * lazy scan held across TWO subsequent commits can lose its files
    * (the table-format VACUUM contract) — long-lived consumers should
    * re-load per probe batch; the index load paths here do. */
  object VersionedDir {

    /** Leading seq of a version DIR name: `<prefix><int>` or
      * `<prefix><int>-<suffix>` (unique-per-attempt dirs, r17). Plain
      * int names parse identically, so existing layouts are untouched. */
    private def seqOf(name: String, dirPrefix: String): Option[Int] = {
      val digits = name.stripPrefix(dirPrefix).takeWhile(_.isDigit)
      val rest = name.stripPrefix(dirPrefix).drop(digits.length)
      if (digits.nonEmpty && (rest.isEmpty || rest.startsWith("-")))
        digits.toIntOption
      else None
    }

    /** Newest valid (seq, dirName); None = no versioned layout here. */
    def newest(fs: FileSystem, root: Path,
               ptrPrefix: String): Option[(Int, String)] = {
      if (!fs.exists(root)) return None
      val ptrs = fs.listStatus(root).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith(ptrPrefix))
        .flatMap(n => n.stripPrefix(ptrPrefix).toIntOption.map(_ -> n))
        .sortBy(-_._1)
      ptrs.iterator.flatMap { case (seq, name) =>
        val target = try {
          val in = fs.open(new Path(root, name))
          val s = try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString.trim finally in.close()
          if (s.nonEmpty && !s.contains('/') && !s.contains('\n')) Some(s)
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
        target.filter(t => fs.exists(new Path(root, s"$t/_SUCCESS")))
          .map(seq -> _)
      }.nextOption()
    }

    /** Commit `dirName` as version `seq` — one immutable pointer PUT.
      * create-if-absent: a seq collision means a concurrent writer
      * violated the serialize-maintenance contract; fail loudly (the
      * other writer's pointer stays committed). */
    def commit(fs: FileSystem, root: Path, ptrPrefix: String, seq: Int,
               dirName: String): Unit = {
      val out = fs.create(new Path(root, s"$ptrPrefix$seq"), false)
      try out.write(dirName.getBytes("UTF-8")) finally out.close()
    }

    /** Remove EVERY pointer and version directory — the full-rebuild
      * (save) path must call this before laying a fresh table down:
      * without it a re-save onto a path whose versioned layout had
      * advanced to seq N would either lose to the surviving
      * higher-seq pointer (fresh data invisible, stale table served
      * with the NEW row tables — silent inconsistency) or collide on
      * the create-if-absent pointer write. Saves are full-rebuild
      * exclusive by contract, so clearing first is safe. */
    def clear(fs: FileSystem, root: Path, ptrPrefix: String,
              dirPrefix: String): Unit = {
      if (!fs.exists(root)) return
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        val ptr = n.startsWith(ptrPrefix) &&
          n.stripPrefix(ptrPrefix).toIntOption.isDefined
        val dir = !ptr && n.startsWith(dirPrefix) &&
          seqOf(n, dirPrefix).isDefined
        if (ptr) fs.delete(st.getPath, false)
        else if (dir) fs.delete(st.getPath, true)
      }
    }

    /** Drop versions older than `keepMinSeq` (typically the previous
      * committed seq — current + one fallback survive). Pointers go
      * before directories, so no surviving pointer targets a missing
      * dir; readers resolve NEWEST-first, so dropping older ones never
      * changes what they see. */
    def gc(fs: FileSystem, root: Path, ptrPrefix: String,
           dirPrefix: String, keepMinSeq: Int): Unit =
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        val stalePtr = n.startsWith(ptrPrefix) &&
          n.stripPrefix(ptrPrefix).toIntOption.exists(_ < keepMinSeq)
        val staleDir = !stalePtr && n.startsWith(dirPrefix) &&
          seqOf(n, dirPrefix).exists(_ < keepMinSeq)
        if (stalePtr) fs.delete(st.getPath, false)
        else if (staleDir) fs.delete(st.getPath, true)
      }
  }

  /** Lease-style claim-file mutual exclusion for index/table maintenance
    * (r15): a maintenance pass (compaction) takes a claim file with
    * create-if-absent (atomic on local/HDFS), mutators check it and fail
    * LOUDLY instead of appending into a tree mid-rewrite, and a crashed
    * claimant's claim goes stale after a TTL. The same semantics as
    * [[compactPartitionKv]]'s conditional-PUT claim, expressed on a
    * filesystem. Claim body: `<uuid>\t<createdMs>` (mtime fallback).
    *
    * Atomicity: create-if-absent is atomic on local/HDFS. On object
    * stores whose connector lacks conditional-PUT create semantics the
    * claim is ADVISORY interop (updates/loads still see and honor it);
    * the HARD fence there is the KV manifest inside [[compactDirKv]]/
    * [[compactPartitionKv]]'s swap — its claim re-verify before the
    * destructive step holds regardless of who won the file claim. */
  object FsClaim {

    /** Default lease TTL: long enough for any realistic rewrite, short
      * enough that a crashed claimant clears without an operator. */
    val DefaultTtlMs: Long = 15L * 60 * 1000

    /** Parse a claim file's `<uuid>\t<createdMs>` body; None when the
      * file is absent or unreadable (racing delete, torn write). */
    private def readClaim(fs: FileSystem,
                          claim: Path): Option[(String, Long)] =
      readClaimState(fs, claim) match {
        case ClaimHeld(u, ts) => Some(u -> ts)
        case _ => None
      }

    /** Three-way claim read for paths that must distinguish "the claim is
      * GONE" from "the claim exists but the read FAILED" (r16): acquire's
      * read-back and release would otherwise treat a transient store
      * error (503, socket reset) as a foreign claimant and orphan a
      * live claim for the full TTL. */
    private sealed trait ClaimState
    private case class ClaimHeld(uuid: String, createdMs: Long)
      extends ClaimState
    private case object ClaimAbsent extends ClaimState
    private case object ClaimUnreadable extends ClaimState

    private def readClaimState(fs: FileSystem, claim: Path): ClaimState =
      try {
        val in = fs.open(claim)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        s.split('\t') match {
          case Array(u, ts) => ts.trim.toLongOption
            .map(ClaimHeld(u, _)).getOrElse(ClaimUnreadable)
          case _ => ClaimUnreadable
        }
      } catch {
        case _: java.io.FileNotFoundException => ClaimAbsent
        case scala.util.control.NonFatal(_) =>
          if (try !fs.exists(claim) catch {
            case scala.util.control.NonFatal(_) => false
          }) ClaimAbsent else ClaimUnreadable
      }

    /** Retry transient read failures before declaring a claim
      * unreadable: one bad round-trip must not decide ownership. */
    private def readClaimRetry(fs: FileSystem, claim: Path,
                               attempts: Int = 3): ClaimState = {
      var last: ClaimState = ClaimUnreadable
      var i = 0
      while (i < attempts) {
        last = readClaimState(fs, claim)
        if (last != ClaimUnreadable) return last
        i += 1
        if (i < attempts) Thread.sleep(200L * i)
      }
      last
    }

    /** Throw while a FRESH claim exists (a live claimant owns the
      * target); clear a STALE one (the claimant died — the caller's
      * entry heal handles whatever swap state it left).
      *
      * The stale-clear is a RENAME to a uuid-named tombstone, not a
      * blind delete (r16): two entrants that both observed the same
      * stale claim would otherwise interleave so that the slower one's
      * delete lands AFTER a third party re-acquired — killing a live
      * claim. Rename is atomic on local/HDFS, so exactly one clearer
      * wins; the loser re-checks and defers to whatever claim now
      * stands. On stores without atomic rename the claim is advisory
      * anyway (the KV swap manifest is the hard fence) and the rename
      * failure falls back to the old delete, logged. */
    def ensureUnclaimed(fs: FileSystem, claim: Path, ttlMs: Long,
                        ctx: String): Unit = {
      if (!fs.exists(claim)) return
      def ageOf: Option[Long] = {
        if (!fs.exists(claim)) return None
        val createdMs = readClaim(fs, claim).map(_._2).getOrElse(
          try fs.getFileStatus(claim).getModificationTime
          catch { case _: java.io.FileNotFoundException => return None })
        Some(System.currentTimeMillis() - createdMs)
      }
      val age = ageOf.getOrElse(return)
      if (age < ttlMs) {
        MaintenanceMetrics.add("maintenance.claim.contention")
        throw new IllegalStateException(
          s"$ctx: compaction in progress at ${claim.getParent} (claim is " +
            s"${age}ms old, TTL ${ttlMs}ms) — retry after it finishes; a " +
            "crashed claimant's claim clears once the TTL passes")
      }
      val tomb = new Path(claim.getParent,
        s".claim-tombstone-${java.util.UUID.randomUUID()}")
      val won = try fs.rename(claim, tomb)
        catch { case _: java.io.IOException => false }
      if (won) {
        log.warn(s"$ctx: cleared STALE maintenance claim at $claim " +
          s"(${age}ms old > ${ttlMs}ms TTL — the claimant died)")
        MaintenanceMetrics.add("maintenance.claim.staleCleared")
        fs.delete(tomb, false)
        ()
      } else ageOf match {
        // someone else cleared it (gone) — proceed to the acquire race
        case None => ()
        // a successor already re-acquired: a FRESH claim stands — defer
        case Some(a) if a < ttlMs =>
          MaintenanceMetrics.add("maintenance.claim.contention")
          throw new IllegalStateException(
            s"$ctx: compaction in progress at ${claim.getParent} (claim " +
              s"re-acquired ${a}ms ago while clearing a stale one) — " +
              "retry after it finishes")
        // still stale and rename unsupported (object store): advisory
        // mode — fall back to the non-atomic delete, logged
        case Some(a) =>
          log.warn(s"$ctx: clearing STALE claim at $claim via delete " +
            s"(${a}ms old; rename-to-tombstone unsupported here — " +
            "advisory mode, the KV manifest is the hard fence)")
          MaintenanceMetrics.add("maintenance.claim.staleCleared")
          fs.delete(claim, false)
          ()
      }
    }

    /** Atomic create-if-absent; loses loudly to a concurrent claimant.
      * Returns the claim's UUID — callers pass it to [[startHeartbeat]]
      * and [[release]] so every later rewrite/delete is ownership-
      * checked. The post-create READ-BACK narrows the ensureUnclaimed/
      * acquire interleave: if a racing stale-clear deleted this claim
      * right after the create (letting a third party re-acquire), the
      * read-back sees a foreign UUID and this claimant aborts before
      * touching the target. */
    def acquire(fs: FileSystem, claim: Path, ctx: String): String = {
      val uuid = java.util.UUID.randomUUID().toString
      try {
        val out = fs.create(claim, false)
        try out.write((s"$uuid\t${System.currentTimeMillis()}")
          .getBytes("UTF-8"))
        finally out.close()
      } catch {
        case e: java.io.IOException =>
          if (fs.exists(claim)) {
            MaintenanceMetrics.add("maintenance.claim.contention")
            throw new IllegalStateException(
              s"$ctx: lost the claim race on ${claim.getParent} — another " +
                "claimant took it concurrently; retry later", e)
          } else throw e
      }
      readClaimRetry(fs, claim) match {
        case ClaimHeld(u, _) if u == uuid => // verified ours
        case ClaimHeld(_, _) =>
          // a racing stale-clear deleted our create and a third party
          // re-acquired: their claim stands, we abort touching nothing.
          MaintenanceMetrics.add("maintenance.claim.contention")
          throw new IllegalStateException(
            s"$ctx: claim at $claim was overwritten immediately after " +
              "acquire (raced a concurrent stale-clear + re-acquire) — " +
              "the target is owned by another claimant; retry later")
        case ClaimAbsent =>
          // our claim was cleared between create and read-back; nothing
          // of ours is left to clean up.
          MaintenanceMetrics.add("maintenance.claim.contention")
          throw new IllegalStateException(
            s"$ctx: claim at $claim vanished immediately after acquire " +
              "(raced a concurrent stale-clear) — retry later")
        case ClaimUnreadable =>
          // persistent read failure right after OUR successful create:
          // overwhelmingly our own claim behind a flaky read path.
          // Remove it OWNERSHIP-SAFELY rather than orphan the index for
          // the full TTL with a claim nobody holds (the caller never
          // gets the uuid, so nothing could release it). removeIfOwn's
          // tombstone rename keeps a racer's live claim intact even
          // when only OUR read path is the flaky one.
          removeIfOwn(fs, claim, uuid,
            deleteWhenUnreadable = true, ctx = s"$ctx acquire-verify")
          throw new IllegalStateException(
            s"$ctx: claim at $claim unreadable immediately after acquire " +
              "(transient store failure) — own claim removed best-effort; " +
              "retry later")
      }
      uuid
    }

    /** Remove the claim only if it turns out to be OURS, without ever
      * trusting a failing read to decide: atomically RENAME the claim to
      * a private tombstone (no other claimant can acquire a renamed-away
      * file), read the tombstone at leisure (it is exclusively ours), and
      * either delete it (ours) or rename it BACK (a foreign live claim —
      * restored intact; the sub-second gap where it is off-path is the
      * documented advisory-mode caveat, the KV manifest stays the hard
      * fence). Where rename is unsupported (pure object store), fall
      * back to delete-if-readably-ours, or — only when
      * `deleteWhenUnreadable` — a logged blind delete. */
    private def removeIfOwn(fs: FileSystem, claim: Path, uuid: String,
                            deleteWhenUnreadable: Boolean,
                            ctx: String): Unit = {
      val tomb = new Path(claim.getParent,
        s".claim-tombstone-${java.util.UUID.randomUUID()}")
      val renamed = try fs.rename(claim, tomb)
        catch { case scala.util.control.NonFatal(_) => false }
      if (renamed) {
        readClaimRetry(fs, tomb, attempts = 5) match {
          case ClaimHeld(u, _) if u == uuid =>
            fs.delete(tomb, false); ()
          case ClaimHeld(_, _) =>
            // a foreign LIVE claim — put it back where its owner and
            // every checker expects it
            if (!fs.rename(tomb, claim)) {
              log.warn(s"$ctx: could not restore a foreign claim from " +
                s"$tomb back to $claim — leaving the tombstone for audit")
            }
          case ClaimAbsent => // tombstone vanished?! nothing to do
          case ClaimUnreadable =>
            // even exclusive reads fail: the store's read path is down.
            // Ours-vs-foreign is undecidable; keep the conservative side
            // unless the caller KNOWS it should be ours.
            if (deleteWhenUnreadable) {
              // the one path that can kill a FOREIGN live claim (a racing
              // stale-clear replaced ours and the store's read path is
              // down): surface it as an alarmable metric so operators see
              // when the advisory-mode caveat actually fired
              MaintenanceMetrics.add("maintenance.claim.blindDelete")
              fs.delete(tomb, false); ()
            }
            else if (!fs.rename(tomb, claim)) {
              log.warn(s"$ctx: claim unreadable and un-restorable at " +
                s"$tomb — leaving the tombstone for audit")
            }
        }
      } else readClaim(fs, claim) match {
        // rename unsupported (advisory object-store mode): best effort
        case Some((u, _)) if u == uuid => fs.delete(claim, false); ()
        case None if deleteWhenUnreadable &&
            (try fs.exists(claim)
             catch { case scala.util.control.NonFatal(_) => false }) =>
          log.warn(s"$ctx: deleting unreadable claim at $claim without " +
            "rename support (should be ours; leaving it would block " +
            "maintenance for the full TTL)")
          MaintenanceMetrics.add("maintenance.claim.blindDelete")
          fs.delete(claim, false); ()
        case _ => ()
      }
    }

    /** Delete the claim only while it is still OURS: if a bystander
      * stale-cleared it and a successor re-acquired, an unconditional
      * delete here would kill the successor's live claim. Read-then-
      * delete is not atomic, but the window is a single claim-file
      * round-trip (vs the whole compaction for the unconditional form)
      * and the KV manifest stays the hard fence regardless. */
    def release(fs: FileSystem, claim: Path, uuid: String): Unit =
      readClaimRetry(fs, claim) match {
        case ClaimHeld(u, _) if u == uuid => fs.delete(claim, false); ()
        case ClaimHeld(_, _) | ClaimAbsent => // not ours to delete / gone
        case ClaimUnreadable =>
          // persistent read failure at release time: the file is
          // overwhelmingly our own (we held the claim until this call);
          // skipping the delete would orphan the index for the TTL.
          // removeIfOwn's tombstone rename decides ownership on an
          // exclusive read where rename is supported, restoring a
          // foreign live claim intact; only a store whose reads are
          // down entirely gets the logged blind delete.
          log.warn(s"release: claim at $claim unreadable after retries — " +
            "removing via ownership-safe tombstone (it should be ours; " +
            "leaving it would block maintenance for the full TTL)")
          try removeIfOwn(fs, claim, uuid,
            deleteWhenUnreadable = true, ctx = "release")
          catch { case scala.util.control.NonFatal(_) => () }
      }

    /** Keep a held claim FRESH while a long rewrite runs: without this,
      * a compaction outlasting the TTL would read as a dead claimant
      * and a bystander's stale-clear would let a second compactor
      * interleave an unguarded swap. The daemon rewrites the claim
      * (new timestamp, SAME uuid) every `ttlMs / 3`; close() stops it.
      * A refresh failure is logged and retried on the next tick — the
      * claim then ages like an unheartbeaten one, no worse.
      *
      * Ownership-checked (r16): each tick re-reads the claim first and
      * STOPS — never rewrites — when the claim is gone (released, or a
      * bystander cleared it) or carries a foreign UUID (a successor
      * legitimately re-acquired after a stale-clear); the old blind
      * `create(overwrite=true)` could resurrect a released claim and
      * block the index for a full TTL, or overwrite a successor's live
      * one. A final in-memory `stopped` check sits immediately before
      * the create so a close() racing an in-flight tick cannot recreate
      * the claim after release. */
    def startHeartbeat(fs: FileSystem, claim: Path, ttlMs: Long,
                       uuid: String): AutoCloseable = {
      val period = math.max(1000L, ttlMs / 3)
      val stop = new java.util.concurrent.CountDownLatch(1)
      val stopped = new java.util.concurrent.atomic.AtomicBoolean(false)
      val t = new Thread(() => {
        var own = true
        while (own &&
            !stop.await(period, java.util.concurrent.TimeUnit.MILLISECONDS)) {
          try {
            // RETRYING read: one transient store failure must not read
            // as "ownership lost" and kill the heartbeat mid-compaction
            // — the claim would then age past TTL while the rewrite
            // still runs, exactly the unguarded-second-compactor window
            // the heartbeat exists to close.
            readClaimRetry(fs, claim) match {
              case ClaimHeld(u, _) if u == uuid =>
                if (!stopped.get()) {
                  val out = fs.create(claim, true)
                  try out.write((s"$uuid\t${System.currentTimeMillis()}")
                    .getBytes("UTF-8"))
                  finally out.close()
                  // close() only joins 5 s: a create that BLOCKED past
                  // that (hung store call) completes here AFTER release
                  // already deleted the claim — a resurrected claim with
                  // no owner. Undo our own late rewrite ownership-safely
                  // (tombstone rename; a foreign claim is restored; an
                  // unreadable one is deleted — we JUST wrote it).
                  if (stopped.get()) {
                    log.warn(s"claim heartbeat at $claim: rewrite landed " +
                      "after release — removing own resurrected claim")
                    removeIfOwn(fs, claim, uuid,
                      deleteWhenUnreadable = true, ctx = "heartbeat-undo")
                  }
                }
              case ClaimUnreadable =>
                // read path down even after retries: keep ticking — the
                // claim ages like an unheartbeaten one until reads heal,
                // no worse, and ownership is NOT decided on bad reads.
                log.warn(s"claim heartbeat at $claim: claim unreadable " +
                  "after retries — skipping this refresh, will retry")
              case other =>
                // gone or foreign: ownership lost — stop silently
                // refreshing what is no longer ours. The claimant's own
                // destructive steps stay guarded by the KV manifest.
                if (!stopped.get()) {
                  MaintenanceMetrics.add(
                    "maintenance.claim.heartbeatOwnershipLost")
                  log.warn(s"claim heartbeat at $claim stopping: claim " +
                    (if (other == ClaimAbsent)
                       "vanished (released or cleared)"
                     else "re-acquired by another claimant"))
                }
                own = false
            }
          } catch { case scala.util.control.NonFatal(e) =>
            log.warn(s"claim heartbeat at $claim failed (will retry): " +
              s"${e.getMessage}")
          }
        }
      }, s"graft-claim-heartbeat-${claim.getName}")
      t.setDaemon(true); t.start()
      () => { stopped.set(true); stop.countDown(); t.join(5000) }
    }
  }
  /** Stream copy, no rename: the object-store write primitive (a PUT). */
  private def copyFile(fs: FileSystem, conf: org.apache.hadoop.conf.Configuration,
                       src: Path, dst: Path): Unit = {
    if (!org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst,
        false /* keep src */, true /* overwrite */, conf))
      throw new java.io.IOException(s"compaction: cannot copy $src -> $dst")
  }
}
