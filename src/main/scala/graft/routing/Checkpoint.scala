package graft.routing

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path}

/** Durable routing state (reference RouteRecord persistence,
  * constructs.py:3293-3433 + drivers/routing/aws.py — per-record DynamoDB
  * writes there, a write-ahead log here). The routing table is a
  * deterministic function of its event log, so the checkpoint persists
  * RECEIVED EVENTS (+ completed paths) and recovery REPLAYS them: pending
  * nodes are reconstructed by the exact code path that built them
  * originally, keeping the persisted format independent of in-memory class
  * shapes.
  *
  * Layout: a directory of WAL segments — each driver process appends to its
  * OWN segment (created at first write, so no filesystem append support is
  * needed; Hadoop local FS does not append), one flushed line per record.
  * O(1) per event with a single open stream — a rewritten state file would
  * make the nth event cost O(n), and per-record files cap at the
  * filesystem's create rate (~300/s measured locally). Lines are
  * `hflush`ed: durable on syncable filesystems (HDFS), OS-buffered
  * locally. Replay order = (segment name, line order); segment names are
  * timestamped so restarts sort after their predecessors.
  */
/** The write-ahead-log surface [[RoutingTable]] persists through — the
  * single-driver [[RoutingCheckpoint]] and the multi-driver
  * [[EpochWal]] (per-shard, fencing-epoch-named segments) both fold the
  * same record stream. */
trait RoutingWal {
  def appendEvent(p: String, blocked: Boolean): Unit
  def appendCompleted(p: String): Unit
  def compact(events: Seq[(String, Boolean)], completed: Seq[String]): Unit
  def load(): Option[(List[(String, Boolean)], List[String])]
  /** Block until every appended record is durably handed to the store —
    * a no-op for synchronous backends; the group-committing
    * [[KvEpochWal]] drains its batch buffer here. */
  def flush(): Unit = ()
  /** Close the open stream — the WAL stays usable (compaction closes the
    * open segment, then keeps writing through the same instance). */
  def close(): Unit
  /** End-of-life: close the stream AND release owned resources (the
    * PRIVATE uncached FileSystem, which the JVM cache does not own — on
    * HDFS/s3a each leaked instance holds a client with sockets and
    * threads). After dispose the WAL must not be used again. */
  def dispose(): Unit = close()
}

/** Shared WAL line codec + filesystem plumbing. */
private[routing] object WalCodec {
  // \r escapes too: BufferedReader-style line handling (and CRLF-
  // contaminated payload values) would otherwise split one record into
  // two — the first parsing as a truncated path, the second dropped
  def esc(s: String): String =
    s.replace("%", "%25").replace("\t", "%09")
      .replace("\n", "%0A").replace("\r", "%0D")
  def unesc(s: String): String =
    s.replace("%0A", "\n").replace("%0D", "\r")
      .replace("%09", "\t").replace("%25", "%")

  /** A PRIVATE (uncached) FileSystem instance with write checksums off:
    * setWriteChecksum on the JVM-shared cached instance would silently
    * disable CRC writing for every other component in the process, and
    * the checksummed local FS buffers flushes until a full 512B chunk —
    * a restart would lose the tail of the log; raw streams flush
    * through. */
  def uncachedFs(dir: Path, conf: Configuration): org.apache.hadoop.fs.FileSystem = {
    val privateConf = new org.apache.hadoop.conf.Configuration(conf)
    val scheme = Option(dir.toUri.getScheme).getOrElse(
      org.apache.hadoop.fs.FileSystem.getDefaultUri(conf).getScheme)
    privateConf.setBoolean(s"fs.$scheme.impl.disable.cache", true)
    val f = dir.getFileSystem(privateConf)
    f.setWriteChecksum(false)
    f
  }

  /** Parse one WAL line into the (kind, payload) fold `load()` applies.
    * Unknown/torn records are ignored (forward compatibility). */
  def foldLine(line: String,
               events: scala.collection.mutable.ListBuffer[(String, Boolean)],
               completed: scala.collection.mutable.ListBuffer[String]): Unit =
    line.split('\t') match {
      case Array("e", p) => events += ((unesc(p), false))
      case Array("eb", p) => events += ((unesc(p), true))
      case Array("c", p) => completed += unesc(p)
      case _ => ()
    }

  /** Fold every line of one log/inbox file — the ONE read loop shared by
    * checkpoint load, shard-WAL replay, and inbox draining.
    *
    * Only newline-TERMINATED lines count as committed records: every
    * appender writes `record + "\n"` in one call, so an unterminated
    * tail is a torn mid-write crash remnant — and a torn PREFIX of a
    * valid record still parses (a truncated path would replay as a
    * phantom event), which is why readLine's accept-the-last-line
    * behavior was unsafe here. Segments are compaction-bounded, so the
    * full read is small. */
  def foldFile(fs: org.apache.hadoop.fs.FileSystem, p: Path,
               events: scala.collection.mutable.ListBuffer[(String, Boolean)],
               completed: scala.collection.mutable.ListBuffer[String]): Unit = {
    val in = fs.open(p)
    val bytes =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val committed = s.lastIndexOf('\n')
    if (committed >= 0)
      s.substring(0, committed).split('\n')
        .foreach(foldLine(_, events, completed))
  }

  /** The compaction law, in ONE place: replay needs only the LAST
    * occurrence per event path (duplicates are node-level deduped; the
    * last blocked flag wins), original order otherwise preserved. */
  def lastPerPath(events: Seq[(String, Boolean)]): Seq[(String, Boolean)] =
    events.zipWithIndex
      .groupBy(_._1._1).map { case (_, occ) => occ.last }
      .toSeq.sortBy(_._2).map(_._1)

  /** The snapshot BODY, in one place (shared by [[RoutingCheckpoint]]
    * and the sharded EpochWal — a line-format or durability fix must
    * not have to land twice): last event per path + distinct completed
    * set, in WAL line format. */
  def writeState(out: java.io.OutputStream, events: Seq[(String, Boolean)],
                 completed: Seq[String]): Unit = {
    lastPerPath(events).foreach { case (p, b) =>
      out.write(s"${if (b) "eb" else "e"}\t${esc(p)}\n".getBytes("UTF-8")) }
    completed.distinct.foreach(p =>
      out.write(s"c\t${esc(p)}\n".getBytes("UTF-8")))
  }
}

final class RoutingCheckpoint(path: String, conf: Configuration)
    extends RoutingWal {

  private val dir = new Path(path + ".d")
  private lazy val fs = WalCodec.uncachedFs(dir, conf)

  private var wal: FSDataOutputStream = _

  /** Strictly-increasing floor for new segment timestamps: a new live
    * segment must sort AFTER the latest snapshot/segment even when the
    * clock lands on the same millisecond (or regressed across a
    * restart) — replay order is the name sort. 0 = not yet initialised
    * (first creation lists the dir once). */
  private var minNextTs: Long = 0L

  /** 13-digit millisecond field of a segment/snapshot name (position 1),
    * 0 for legacy/unparseable names — used only for max() floors, where
    * "sorts first anyway" is the right degenerate value. */
  private def tsOf(n: String): Long =
    n.split('-').lift(1).filter(f => f.length == 13 && f.forall(_.isDigit))
      .map(_.toLong).getOrElse(0L)

  private def esc(s: String): String = WalCodec.esc(s)

  /** kinds: "e" event, "eb" blocked event, "c" completed path */
  private def record(kind: String, payload: String): Unit = synchronized {
    if (wal == null) {
      if (!fs.exists(dir)) fs.mkdirs(dir)
      if (minNextTs == 0L)
        minNextTs = fs.listStatus(dir).map(s => tsOf(s.getPath.getName))
          .foldLeft(0L)(math.max) + 1
      val ts = math.max(System.currentTimeMillis(), minNextTs)
      minNextTs = ts + 1
      val name = f"wal-$ts%013d-${
        java.util.UUID.randomUUID().toString.take(8)}.log"
      wal = fs.create(new Path(dir, name), true)
    }
    wal.write(s"$kind\t${esc(payload)}\n".getBytes("UTF-8"))
    wal.hflush()
  }

  def appendEvent(p: String, blocked: Boolean): Unit =
    record(if (blocked) "eb" else "e", p)

  def appendCompleted(p: String): Unit = record("c", p)

  def close(): Unit = synchronized {
    if (wal != null) { wal.close(); wal = null }
  }

  override def dispose(): Unit = synchronized {
    close()
    // the uncached FileSystem is OWNED by this checkpoint (the JVM cache
    // deliberately does not hold it) — on HDFS/s3a an undisposed
    // instance leaks a client with sockets/threads per app lifecycle
    try fs.close() catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Compact the log into one snapshot segment and drop the older ones.
    * Replay only needs the LAST occurrence per event path (duplicate
    * re-publishes are node-level deduped; the last blocked flag wins) and
    * the distinct completed set — so re-published partitions stop growing
    * the log. Called after a successful recovery replay. */
  def compact(events: Seq[(String, Boolean)], completed: Seq[String]): Unit =
    synchronized {
      if (!fs.exists(dir)) return
      val old = fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("wal-"))
      close() // the snapshot becomes the new open segment's predecessor
      // The snapshot must sort AFTER every segment it subsumes (so a
      // survivor of a partial deletion folds first and is overridden by
      // the snapshot's last-per-path state) and BEFORE every future live
      // segment (record()'s minNextTs floor guarantees new segments get
      // ts > tsMax even on a same-millisecond clock). "zzzzzzzz" sorts
      // after any same-ts hex-uuid segment; the trailing wall-clock +
      // uuid keep repeated same-tsMax snapshots ordered and unique.
      val tsMax = old.map(p => tsOf(p.getName)).foldLeft(0L)(math.max)
      val name = f"wal-$tsMax%013d-zzzzzzzz-${System.currentTimeMillis()}%013d-${
        java.util.UUID.randomUUID().toString.take(8)}.log"
      val snap = new Path(dir, name)
      val out = fs.create(snap, true)
      try WalCodec.writeState(out, events, completed) finally out.close()
      minNextTs = math.max(minNextTs, tsMax + 1)
      val survived = old.filter(f => !fs.delete(f, false) && fs.exists(f))
      if (survived.nonEmpty) {
        // KEEP the snapshot: once any old segment was deleted it holds
        // the only durable copy of that segment's events (withdrawing it
        // here would lose them — the pre-r13 defect). Survivors are
        // harmless — they sort before the snapshot, so its state wins
        // the fold — and are re-deleted on the next compaction.
        org.slf4j.LoggerFactory.getLogger(classOf[RoutingCheckpoint]).warn(
          s"checkpoint $dir: could not delete segment(s) " +
            s"${survived.map(_.getName).mkString(", ")}; snapshot kept " +
            "(subsumes them on replay), deletion retried next compaction")
      }
    }

  /** Replay-ordered state: (events with blocked flag, completed paths).
    * None when no checkpoint exists yet. */
  def load(): Option[(List[(String, Boolean)], List[String])] = {
    if (!fs.exists(dir)) return None
    val segments = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("wal-")).sortBy(_.getName)
    val events = scala.collection.mutable.ListBuffer.empty[(String, Boolean)]
    val completed = scala.collection.mutable.ListBuffer.empty[String]
    segments.foreach(f => WalCodec.foldFile(fs, f, events, completed))
    Some((events.toList, completed.toList))
  }
}
