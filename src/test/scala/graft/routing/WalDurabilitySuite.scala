package graft.routing

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** r13 durability pins: a compaction that only PARTIALLY deleted its old
  * segments must never lose state. The snapshot is the only durable copy
  * of the deleted segments' events, so it is kept — survivors are
  * subsumed at replay (they sort/filter before the snapshot) and
  * re-deleted next compaction. Plus the lease-renewal fencing fix for
  * pruned epoch files. */
class WalDurabilitySuite extends AnyFunSuite {

  private val conf = new Configuration()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeFile(dir: String, name: String, content: String): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, name), content.getBytes("UTF-8"))

  private def listNames(dir: String): Seq[String] =
    java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .toSeq.sorted

  test("checkpoint: snapshot subsumes a surviving pre-compaction segment") {
    val root = tmp("graft_wal_d1")
    val cp = new RoutingCheckpoint(s"$root/state", conf)
    cp.appendEvent("/data/p/2026-08-10", blocked = true)
    cp.compact(Seq(("/data/p/2026-08-10", true)), Nil)
    val walDir = s"$root/state.d"
    val snap = listNames(walDir).find(_.contains("zzzzzzzz")).get
    val tsMax = snap.split('-')(1)
    // simulate a segment the compaction failed to delete: same max ts,
    // hex uuid (sorts BEFORE the snapshot's zzzzzzzz), stale blocked flag
    writeFile(walDir, s"wal-$tsMax-00000000.log", "e\t/data/p/2026-08-10\n")
    val st = cp.load().get
    assert(WalCodec.lastPerPath(st._1) == Seq(("/data/p/2026-08-10", true)),
      s"snapshot state must win over the stale survivor, got ${st._1}")
    // post-compaction appends still fold after the snapshot
    cp.appendEvent("/data/q/2026-08-11", blocked = false)
    val st2 = cp.load().get
    assert(WalCodec.lastPerPath(st2._1).last == ("/data/q/2026-08-11", false))
    // the next compaction sweeps the survivor
    cp.compact(WalCodec.lastPerPath(st2._1), st2._2)
    assert(listNames(walDir).size == 1, listNames(walDir).mkString(", "))
    assert(WalCodec.lastPerPath(cp.load().get._1).toSet ==
      Set(("/data/p/2026-08-10", true), ("/data/q/2026-08-11", false)))
    cp.close()
  }

  test("epoch WAL: same-epoch survivor with ts <= snapshot is filtered at load") {
    val root = tmp("graft_wal_d2")
    val dir = s"$root/wal"
    val w = new EpochWal(dir, conf, 2)
    w.appendEvent("/data/a/2026-08-10", blocked = false)
    val st = w.load().get
    w.compact(st._1, st._2)
    val snap = listNames(dir).find(_.startsWith("snap-")).get
    val snapTs = snap.stripSuffix(".log").split('-')(2).toLong
    // a survivor of the partial deletion: same epoch, ts < snapshot ts,
    // carrying stale state — must be skipped (subsumed by the snapshot)
    writeFile(dir, f"wal-${2L}%09d-${snapTs - 1}%013d-deadbeef.log",
      "e\t/data/STALE/1\n")
    // a legitimate post-snapshot segment: same epoch, ts > snapshot ts
    writeFile(dir, f"wal-${2L}%09d-${snapTs + 5}%013d-deadbeef.log",
      "e\t/data/b/2026-08-11\n")
    val replayed = w.load().get._1
    assert(!replayed.exists(_._1.contains("STALE")),
      s"pre-snapshot survivor must not replay, got $replayed")
    assert(replayed.map(_._1) ==
      List("/data/a/2026-08-10", "/data/b/2026-08-11"))
    // next compaction deletes the survivor too
    w.compact(replayed, Nil)
    assert(listNames(dir).count(_.startsWith("wal-")) == 0)
    w.close()
  }

  test("epoch WAL: post-compaction appends sort after the snapshot (same ms)") {
    val root = tmp("graft_wal_d3")
    val dir = s"$root/wal"
    val w = new EpochWal(dir, conf, 1)
    w.appendEvent("/data/a/1", blocked = true)
    val st = w.load().get
    w.compact(st._1, st._2)
    // immediately append (same wall-clock ms as the snapshot is likely):
    // the nextTs floor must give the new segment a strictly larger ts
    w.appendEvent("/data/a/1", blocked = false)
    val snapTs = listNames(dir).find(_.startsWith("snap-")).get
      .stripSuffix(".log").split('-')(2).toLong
    val segTs = listNames(dir).find(_.startsWith("wal-")).get
      .split('-')(2).toLong
    assert(segTs > snapTs, s"segment ts $segTs must exceed snapshot ts $snapTs")
    assert(WalCodec.lastPerPath(w.load().get._1) == Seq(("/data/a/1", false)))
    w.close()
  }

  test("lease renew: pruned epoch file + higher epoch = fenced, not transient") {
    val root = tmp("graft_lease_d1")
    var now = 0L
    val lx = new ShardLease(root, 0, "X", conf, 1000, () => now)
    assert(lx.tryAcquire().contains(1L))
    now = 2000 // X's heartbeat expires; Y takes over at epoch 2
    val ly = new ShardLease(root, 0, "Y", conf, 1000, () => now)
    assert(ly.tryAcquire().contains(2L))
    // simulate claim()'s namespace pruning having removed X's epoch file
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$root/leases/shard-0/epoch-000000001"))
    lx.renew()
    assert(lx.heldEpoch == -1L,
      "a pruned epoch file with a higher epoch present means fenced — " +
        "renew must abdicate, not heartbeat the dead epoch forever")
    assert(ly.isCurrent)
  }

  test("lease renew: unreadable epoch file with NO higher epoch stays held") {
    val root = tmp("graft_lease_d2")
    var now = 0L
    val lx = new ShardLease(root, 0, "X", conf, 1000, () => now)
    assert(lx.tryAcquire().contains(1L))
    // transient store failure: the epoch file is unreadable but no
    // successor exists — renewal must keep the shard (abdicating here
    // dropped a live shard on a single swallowed IOException)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$root/leases/shard-0/epoch-000000001"))
    now = 100
    lx.renew()
    assert(lx.heldEpoch == 1L, "no higher epoch => treat as transient")
  }
}
