package graft.routing

import org.scalatest.funsuite.AnyFunSuite
import graft.dimension._
import graft.signal._

/** The §7.5 multi-driver sharding proof on one box: two driver instances
  * over a shared filesystem splitting a route set — lease-expiry
  * failover with WAL replay, fencing-epoch rejection of stale writers,
  * and cross-shard feed-back through the at-least-once inbox. */
class MultiDriverSuite extends AnyFunSuite {

  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  private def extSignal(alias: String, root: String): Signal =
    Signal(alias, SignalSource.external(root), daySpec,
      DimFilter.loadRaw(daySpec, DimFilter.RawFilter(
        List(("*": Any) -> DimFilter.RawFilter.empty))))

  private val allExists = new PathProbe { def exists(p: String) = true }

  private def outputFor(node: SignalLinkNode, id: String): Signal =
    Signal(id, SignalSource.internal("/app", id), daySpec,
      node.deriveOutputFilter(daySpec, Nil))

  // ids placed on OPPOSITE shards of a 2-shard ring, found against the
  // same consistent hash every driver uses
  private val upId = (0 to 50).map(i => s"stage_up_$i")
    .find(c => Sharding.shardOf(c, 2) == 0).get
  private val downId = (0 to 50).map(i => s"stage_down_$i")
    .find(c => Sharding.shardOf(c, 2) == 1).get

  /** upstream: /data/a → internal output; downstream consumes it. */
  private def mkUp(): Route = {
    val node = SignalLinkNode(List(extSignal("a", "/data/a"))).withAutoLinks
    new Route(upId, node, outputFor(node, upId), Nil)
  }
  private def mkDown(): Route = {
    val upOut = Signal(upId, SignalSource.internal("/app", upId), daySpec,
      DimFilter.allPassFor(daySpec))
    val node = SignalLinkNode(List(upOut)).withAutoLinks
    new Route(downId, node, outputFor(node, downId), Nil)
  }
  /** two-input coincidence join, pinned to shard 1. */
  private def mkJoin(id: String): Route = {
    val node = SignalLinkNode(List(
      extSignal("ja", "/data/ja"), extSignal("jb", "/data/jb"))).withAutoLinks
    new Route(id, node, outputFor(node, id), Nil)
  }

  private def conf = new org.apache.hadoop.conf.Configuration()

  test("two drivers split the route set; feed-back crosses shards via the inbox") {
    val root = java.nio.file.Files.createTempDirectory("graft_md1").toString
    var now = 0L
    val clock = () => now
    def mkDriver(id: String) = {
      val d = new ShardedDriver(root, id, 2, allExists, conf,
        leaseTimeoutMillis = 1000, clock = clock)
      d.add(() => mkUp()); d.add(() => mkDown()); d
    }
    val dx = mkDriver("X")
    val dy = mkDriver("Y")
    assert(dx.tryAcquireShard(0).contains(Nil))
    assert(dy.tryAcquireShard(1).contains(Nil))
    // a held, heartbeating lease cannot be stolen
    assert(dy.tryAcquireShard(0).isEmpty)
    assert(dx.ownedShards == Set(0) && dy.ownedShards == Set(1))

    // event lands on X (owner of the upstream shard) and triggers
    val ctxs = dx.receivePath("/data/a/2026-08-12")
    assert(ctxs.map(_.routeId) == List(upId))
    val outPath = ctxs.head.output.materializedPaths.head
    // completion on X: downstream's shard is unowned here → inbox message
    assert(dx.complete(outPath).isEmpty)
    // Y folds its inbox and the downstream route fires with the right day
    val downCtxs = dy.pollInboxes()
    assert(downCtxs.map(_.routeId) == List(downId))
    assert(downCtxs.head.output.tip.map(_.value) == List("2026-08-12"))
    // the message was consumed — a second poll folds nothing
    assert(dy.pollInboxes().isEmpty)

    // an event received by the WRONG driver still reaches the owner
    assert(dy.receivePath("/data/a/2026-08-13").isEmpty)
    assert(dx.pollInboxes().map(_.routeId) == List(upId))
    dx.releaseAll(); dy.releaseAll()
  }

  test("fenced driver forwards events to the successor once its renewal notices") {
    val root = java.nio.file.Files.createTempDirectory("graft_md_f").toString
    var now = 0L
    val clock = () => now
    def mkDriver(id: String) = {
      val d = new ShardedDriver(root, id, 2, allExists, conf,
        leaseTimeoutMillis = 1000, clock = clock)
      d.add(() => mkUp()); d.add(() => mkDown()); d
    }
    val dx = mkDriver("X")
    val dy = mkDriver("Y")
    assert(dx.tryAcquireShard(0).contains(Nil))
    now += 2000 // X's heartbeat expires
    assert(dy.tryAcquireShard(0).isDefined) // Y fences X at epoch k+1
    // X has NOT polled fencedShards yet, but its heartbeat thread runs:
    // the renewal must notice the higher epoch and abdicate (X's own
    // epoch-k file still carries X — verifying only it would heartbeat
    // a dead epoch forever)
    dx.renewLeases()
    // an event reaching the fenced-but-undropped X must NOT fold into
    // the zombie table (acked into a fenced WAL = acked-but-void); it
    // forwards to the successor's inbox instead
    val ctxs = dx.receivePath("/data/a/2026-08-12")
    assert(ctxs.isEmpty, s"zombie folded locally: $ctxs")
    assert(dy.pollInboxes().map(_.routeId) == List(upId),
      "event did not reach the successor via the inbox")
    // cleanup path still reports the fenced shard
    assert(dx.fencedShards() == Set(0))
    dx.dropShard(0)
    dy.releaseAll()
  }

  test("renewLeases never waits on the driver monitor") {
    val root = java.nio.file.Files.createTempDirectory("graft_md_m").toString
    var now = 0L
    val clock = () => now
    val dx = new ShardedDriver(root, "X", 2, allExists, conf,
      leaseTimeoutMillis = 1000, clock = clock)
    dx.add(() => mkUp())
    assert(dx.tryAcquireShard(0).contains(Nil))
    now += 1500 // heartbeat (written at claim, ts=0) is now expired
    // another thread holds the driver monitor — the shape of a long
    // takeover replay inside tryAcquireShard
    val entered = new java.util.concurrent.CountDownLatch(1)
    val releaseMonitor = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => dx.synchronized {
      entered.countDown()
      releaseMonitor.await(10, java.util.concurrent.TimeUnit.SECONDS); ()
    })
    t.start()
    entered.await(10, java.util.concurrent.TimeUnit.SECONDS)
    // the heartbeat must proceed WITHOUT the monitor and land the renewal
    val t0 = System.nanoTime()
    dx.renewLeases()
    val ms = (System.nanoTime() - t0) / 1e6
    releaseMonitor.countDown(); t.join()
    assert(ms < 2000, f"renewLeases blocked $ms%.0f ms behind the monitor")
    // the renewal took effect: a peer cannot steal the lease
    val dy = new ShardedDriver(root, "Y", 2, allExists, conf,
      leaseTimeoutMillis = 1000, clock = clock)
    dy.add(() => mkUp())
    assert(dy.tryAcquireShard(0).isEmpty, "renewal did not land — lease stolen")
    dx.releaseAll()
  }

  test("lease-expiry failover: successor replays the WAL, rebuilds pending joins") {
    val root = java.nio.file.Files.createTempDirectory("graft_md2").toString
    var now = 0L
    val clock = () => now
    val joinId = (0 to 50).map(i => s"join_$i")
      .find(c => Sharding.shardOf(c, 2) == 1).get
    def mkDriver(id: String) = {
      val d = new ShardedDriver(root, id, 2, allExists, conf,
        leaseTimeoutMillis = 1000, clock = clock)
      d.add(() => mkJoin(joinId)); d
    }
    val dy = mkDriver("Y")
    assert(dy.tryAcquireShard(1).isDefined)
    // half-join arrives on Y: pending node opens, event hits Y's WAL
    assert(dy.receivePath("/data/ja/2026-08-12").isEmpty)
    assert(dy.tableOf(1).get.find(joinId).get.pendingNodes.length == 1)

    // Y dies (stops renewing); X cannot take over before expiry...
    val dx = mkDriver("X")
    now = 500
    assert(dx.tryAcquireShard(1).isEmpty)
    // ...and takes over after: WAL replay rebuilds the half-joined node
    now = 2000
    val recovered = dx.tryAcquireShard(1)
    assert(recovered.isDefined)
    assert(recovered.get.isEmpty) // half-join was not mid-flight
    assert(dx.tableOf(1).get.find(joinId).get.pendingNodes.length == 1)
    // Y is fenced out now; X completes the join with the second half
    assert(dy.fencedShards() == Set(1))
    val ctxs = dx.receivePath("/data/jb/2026-08-12")
    assert(ctxs.map(_.routeId) == List(joinId))
    assert(ctxs.head.inputs.map(_.alias).toSet == Set("ja", "jb"))
    dx.releaseAll()
  }

  test("fencing: stale-epoch segments are rejected at replay, swept at compaction") {
    val root = java.nio.file.Files.createTempDirectory("graft_md3").toString
    val shardDir = s"$root/wal"
    // epoch-1 owner logs one event, then is superseded: the epoch-2
    // owner replays and compacts (snapshot at epoch 2)
    val w1 = new EpochWal(shardDir, conf, 1)
    w1.appendEvent("/data/a/2026-08-10", blocked = false)
    val w2 = new EpochWal(shardDir, conf, 2)
    val st = w2.load().get
    assert(st._1 == List(("/data/a/2026-08-10", false)))
    w2.compact(st._1, st._2)
    // the ZOMBIE (epoch 1) keeps writing — its original segment was
    // deleted by the compaction, and a rolled NEW segment carries the
    // stale epoch
    w1.close() // roll a fresh segment on next append
    w1.appendEvent("/data/a/2026-08-99", blocked = false)
    // replay ignores the stale segment: the zombie's event never surfaces
    val replayed = w2.load().get
    assert(replayed._1 == List(("/data/a/2026-08-10", false)))
    assert(!replayed._1.exists(_._1.contains("2026-08-99")))
    // a zombie compaction attempt aborts (higher-epoch snapshot exists)
    w1.compact(List(("/data/a/2026-08-99", false)), Nil)
    assert(w2.load().get._1 == List(("/data/a/2026-08-10", false)))
    // the next legitimate compaction sweeps the stale segment away
    w2.compact(replayed._1, replayed._2)
    val w3 = new EpochWal(shardDir, conf, 3)
    assert(w3.load().get._1 == List(("/data/a/2026-08-10", false)))
  }

  test("same-epoch fencing: the claim-race loser's segments are filtered at replay") {
    val root = java.nio.file.Files.createTempDirectory("graft_md_se").toString
    val shardDir = s"$root/wal"
    // the acknowledged double-hold window on a non-atomic store: X and Y
    // both hold epoch 1 and both append wal-1-* segments; the epoch file
    // settled to X (the renewal-time winner)
    val winner: Long => Option[String] =
      k => if (k == 1L) Some(Sharding.ownerToken("X")) else None
    val wx = new EpochWal(shardDir, conf, 1,
      ownerToken = Some(Sharding.ownerToken("X")), winnerTokenOf = winner)
    val wy = new EpochWal(shardDir, conf, 1,
      ownerToken = Some(Sharding.ownerToken("Y")), winnerTokenOf = winner)
    wx.appendEvent("/data/a/2026-08-10", blocked = false)
    wy.appendEvent("/data/a/2026-08-99", blocked = false) // loser's write
    wx.close(); wy.close()
    // the epoch-2 successor replays: only the settled owner's history
    val w2 = new EpochWal(shardDir, conf, 2,
      ownerToken = Some(Sharding.ownerToken("Z")), winnerTokenOf = winner)
    val st = w2.load().get
    assert(st._1 == List(("/data/a/2026-08-10", false)),
      "the same-epoch loser's segments must not replay")
    // legacy (token-less) segments from older deployments still replay
    val legacy = new EpochWal(shardDir, conf, 1) // no ownerToken
    legacy.appendEvent("/data/b/2026-08-11", blocked = false)
    legacy.close()
    val st2 = w2.load().get
    assert(st2._1.map(_._1).toSet ==
      Set("/data/a/2026-08-10", "/data/b/2026-08-11"))
  }

  test("lease release hands the shard over immediately") {
    val root = java.nio.file.Files.createTempDirectory("graft_md4").toString
    var now = 0L
    val lx = new ShardLease(root, 0, "X", conf, 1000, () => now)
    val ly = new ShardLease(root, 0, "Y", conf, 1000, () => now)
    assert(lx.tryAcquire().contains(1L))
    assert(ly.tryAcquire().isEmpty)
    assert(lx.isCurrent)
    lx.release()
    assert(ly.tryAcquire().contains(2L))
    assert(!lx.isCurrent && ly.isCurrent)
    // renewal keeps the successor alive across the timeout horizon
    now = 900; ly.renew()
    now = 1800
    assert(lx.tryAcquire().isEmpty) // hb at 900, within timeout
    now = 2000
    assert(lx.tryAcquire().contains(3L))
  }

  test("renew abdicates when the epoch file carries another owner") {
    // a non-atomic store can let two claimants slip past the claim
    // read-back holding the SAME epoch; the heartbeat re-verify is the
    // convergence path — whoever's id is NOT in the file surrenders
    val root = java.nio.file.Files.createTempDirectory("graft_md_rv").toString
    var now = 0L
    val lx = new ShardLease(root, 0, "X", conf, 1000, () => now)
    assert(lx.tryAcquire().contains(1L))
    // simulate the other racer's last-write winning the epoch file
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/leases/shard-0/epoch-000000001"),
      "Y".getBytes("UTF-8"))
    now = 100
    lx.renew()
    assert(lx.heldEpoch == -1L, "X must abdicate a lease it no longer owns")
    assert(!lx.isCurrent)
    // the surviving owner's renewal still works
    val ly = new ShardLease(root, 0, "Y", conf, 1000, () => now)
    // Y finds its own id in epoch-1 → same-owner reclaim at epoch 2
    assert(ly.tryAcquire().contains(2L))
    assert(ly.isCurrent)
  }

  test("unreadable heartbeat is graced a full timeout, not stolen instantly") {
    // RawLocalFileSystem's hb renewal is delete+create: a claimant whose
    // read lands in that window sees NO hb file. That must not fold to
    // "expired" — the live owner's next renewal clears the strike; only
    // CONTINUOUS unreadability for a full lease timeout means dead owner
    // (crashed between the epoch and hb writes).
    val root = java.nio.file.Files.createTempDirectory("graft_md_hb").toString
    var now = 0L
    val lx = new ShardLease(root, 0, "X", conf, 1000, () => now)
    val ly = new ShardLease(root, 0, "Y", conf, 1000, () => now)
    assert(lx.tryAcquire().contains(1L))
    val hb = java.nio.file.Paths.get(s"$root/leases/shard-0/hb-000000001")
    // simulate Y reading mid-renewal: hb file momentarily absent
    val saved = java.nio.file.Files.readAllBytes(hb)
    java.nio.file.Files.delete(hb)
    now = 100
    assert(ly.tryAcquire().isEmpty, "missing hb must be graced, not stolen")
    // owner's renewal lands again — strike cleared even 900ms later
    java.nio.file.Files.write(hb, saved)
    now = 150; lx.renew()
    now = 950
    assert(ly.tryAcquire().isEmpty, "hb readable again — owner is live")
    // true crash: hb stays unreadable past a full timeout from first strike
    java.nio.file.Files.delete(hb)
    now = 1000
    assert(ly.tryAcquire().isEmpty) // strike restarts at 1000
    now = 2100
    assert(ly.tryAcquire().contains(2L),
      "continuously unreadable past the timeout = dead owner")
  }

  test("same-owner restart reclaims its own still-live lease at epoch k+1") {
    val root = java.nio.file.Files.createTempDirectory("graft_md5").toString
    var now = 0L
    val old = new ShardLease(root, 0, "X", conf, 1000, () => now)
    assert(old.tryAcquire().contains(1L))
    now = 100; old.renew()
    // restart: a FRESH instance with the same ownerId finds its own live
    // lease — immediate takeover at k+1, no timeout wait
    now = 200
    val fresh = new ShardLease(root, 0, "X", conf, 1000, () => now)
    assert(fresh.tryAcquire().contains(2L))
    assert(fresh.isCurrent)
    assert(!old.isCurrent) // the previous incarnation is fenced out
    // a DIFFERENT owner still cannot steal the live lease
    val ly = new ShardLease(root, 0, "Y", conf, 1000, () => now)
    assert(ly.tryAcquire().isEmpty)
    // and the reclaimed lease expires normally for successors
    now = 2000
    assert(ly.tryAcquire().contains(3L))
  }

  test("conditional-write lease: no epoch ever held by two owners under contention") {
    // the object-store backend: every claim is a conditional PUT decided
    // atomically by the store — 8 threads hammer fresh lease instances
    // (held state lost each attempt, expiry forced) against ONE shared
    // KV; each epoch must be won by exactly one owner, with no read-back
    // or renewal-time convergence needed
    val kv = new InMemoryConditionalKv
    def mkLease(owner: String) = new ShardLease(0, owner,
      new ConditionalLeaseStore(kv, "app/leases/shard-0"),
      leaseTimeoutMillis = -1L, clock = () => 0L)
    val claims =
      java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        val owner = s"driver-$i"
        val deadline = System.nanoTime() + 300000000L // 300 ms of hammering
        while (System.nanoTime() < deadline)
          mkLease(owner).tryAcquire().foreach(k => { claims.add((k, owner)); () })
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val byEpoch = claims.asScala.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct).toMap
    val doubled = byEpoch.filter(_._2.size > 1)
    assert(doubled.isEmpty, s"epochs claimed by two owners: $doubled")
    assert(claims.asScala.map(_._2).toSet.size >= 2,
      s"only ${claims.asScala.map(_._2).toSet} ever won — no contention exercised")
  }

  test("a pruned epoch can never be re-won: a stale claimant abdicates") {
    // the bug this pins (caught by the contention test under co-tenant
    // load): claim()'s hygiene pruning deletes epoch keys >64 behind,
    // so a claimant acting on a STALE current() read could re-CREATE a
    // pruned epoch key and win an epoch number another owner already
    // held — two holders of one fencing token across time
    val kv = new InMemoryConditionalKv
    def lease(owner: String, store: LeaseStore) =
      new ShardLease(0, owner, store, leaseTimeoutMillis = -1L,
        clock = () => 0L)
    val store = new ConditionalLeaseStore(kv, "l")
    var last = 0L
    (1 to 200).foreach { _ =>
      last = lease("A", store).tryAcquire().get
    }
    assert(last == 200L)
    assert(kv.get("l/epoch-000000005").isEmpty, "old epochs must be pruned")
    // a zombie claimant whose FIRST list is a stale snapshot (epoch-5 as
    // the shard's max) — a descheduled racer / eventually-consistent list
    val stale = new LeaseStore {
      private var served = false
      def putIfAbsent(n: String, c: String): Boolean = store.putIfAbsent(n, c)
      def put(n: String, c: String): Unit = store.put(n, c)
      def get(n: String): Option[String] = store.get(n)
      def list(): Seq[String] =
        if (!served) { served = true; Seq("epoch-000000005") }
        else store.list()
      def atomicCreate: Boolean = true
      override def delete(n: String): Unit = store.delete(n)
    }
    val z = lease("Z", stale)
    assert(z.tryAcquire().isEmpty, "a stale claimant re-won a pruned epoch")
    assert(z.heldEpoch == -1L)
    assert(kv.get("l/epoch-000000006").isEmpty,
      "the resurrected epoch key must be cleaned up on abdication")
    // the real owner's path is untouched: the next claim advances
    assert(lease("A", store).tryAcquire().contains(201L))
  }

  test("conditional-write lease: live-lease protection, expiry, release handover") {
    val kv = new InMemoryConditionalKv
    var now = 0L
    def mk(owner: String) = new ShardLease(0, owner,
      new ConditionalLeaseStore(kv, "leases/shard-0"), 1000, () => now)
    val lx = mk("X"); val ly = mk("Y")
    assert(lx.tryAcquire().contains(1L))
    assert(ly.tryAcquire().isEmpty, "live lease must not be stealable")
    now = 900; lx.renew()
    now = 1800
    assert(ly.tryAcquire().isEmpty) // hb at 900, within timeout
    now = 2000
    assert(ly.tryAcquire().contains(2L)) // expired — takeover
    assert(!lx.isCurrent && ly.isCurrent)
    ly.release()
    assert(mk("Z").tryAcquire().contains(3L), "release hands over immediately")
  }

  test("sharded driver failover runs end-to-end on the conditional-write backend") {
    // same failover story as the filesystem-lease test, but leases live
    // in a shared conditional KV (WAL/inbox stay on the filesystem) —
    // the composition a multi-host object-store deployment would run
    val root = java.nio.file.Files.createTempDirectory("graft_md_cw").toString
    val kv = new InMemoryConditionalKv
    var now = 0L
    val clock = () => now
    val joinId = (0 to 50).map(i => s"join_$i")
      .find(c => Sharding.shardOf(c, 2) == 1).get
    def mkDriver(id: String) = {
      val d = new ShardedDriver(root, id, 2, allExists, conf,
        leaseTimeoutMillis = 1000, clock = clock,
        leaseStoreFor = Some(sh =>
          new ConditionalLeaseStore(kv, s"app/leases/shard-$sh")))
      d.add(() => mkJoin(joinId)); d
    }
    val dy = mkDriver("Y")
    assert(dy.tryAcquireShard(1).isDefined)
    assert(dy.receivePath("/data/ja/2026-08-12").isEmpty)
    val dx = mkDriver("X")
    now = 500
    assert(dx.tryAcquireShard(1).isEmpty, "live lease must block takeover")
    now = 2000
    assert(dx.tryAcquireShard(1).isDefined)
    assert(dx.tableOf(1).get.find(joinId).get.pendingNodes.length == 1,
      "WAL replay must rebuild the half-joined pending node")
    assert(dy.fencedShards() == Set(1))
    val ctxs = dx.receivePath("/data/jb/2026-08-12")
    assert(ctxs.map(_.routeId) == List(joinId))
    dx.releaseAll()
  }

  test("FULL conditional-KV backend: leases AND WAL AND inbox, failover end-to-end") {
    // r13: the whole shared state through one ConditionalKv — the
    // object-store deployment where Hadoop rename/create-if-absent are
    // not atomic. Covers cross-shard inbox feed-back, lease-expiry
    // failover with KvEpochWal replay, and fencing of the dead owner.
    val kv = new InMemoryConditionalKv
    var now = 0L
    val clock = () => now
    val existing = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val probe = new PathProbe { def exists(p: String) = existing.contains(p) }
    def mkDriver(id: String) = {
      val d = new ShardedDriver("app", id, 2, probe, conf,
        leaseTimeoutMillis = 1000, clock = clock, kvStore = Some(kv))
      d.add(() => mkUp()); d.add(() => mkDown()); d
    }
    val dx = mkDriver("X")
    val dy = mkDriver("Y")
    assert(dx.tryAcquireShard(0).contains(Nil))
    assert(dy.tryAcquireShard(1).contains(Nil))
    assert(dy.tryAcquireShard(0).isEmpty, "live KV lease must hold")

    // upstream fires on X; completion feeds Y's shard via the KV inbox
    val ctxs = dx.receivePath("/data/a/2026-08-12")
    assert(ctxs.map(_.routeId) == List(upId))
    val outPath = ctxs.head.output.materializedPaths.head
    existing.add(s"$outPath/_SUCCESS") // the slot "wrote" its output
    assert(dx.complete(outPath).isEmpty)
    val downCtxs = dy.pollInboxes()
    assert(downCtxs.map(_.routeId) == List(downId))
    assert(downCtxs.head.output.tip.map(_.value) == List("2026-08-12"))
    assert(dy.pollInboxes().isEmpty, "KV inbox message must be consumed")

    // X dies mid-state: a second upstream event is in X's KV WAL only,
    // its output never written
    assert(dx.receivePath("/data/a/2026-08-13").nonEmpty)
    now = 2000 // X stops renewing; Y takes over shard 0
    val recovered = dy.tryAcquireShard(0)
    assert(recovered.isDefined, "expired KV lease must hand over")
    // replay re-offers the mid-flight 08-13 execution (output incomplete);
    // the completed 08-12 one is NOT re-offered
    assert(recovered.get.map(_.output.tip.map(_.value).head) == List("2026-08-13"))
    assert(dx.fencedShards() == Set(0))
    // the fenced zombie's stale appends never replay on the successor
    dx.receivePath("/data/a/2026-08-19")
    val dz = {
      val d = new ShardedDriver("app", "Z", 2, allExists, conf,
        leaseTimeoutMillis = 1000, clock = clock, kvStore = Some(kv))
      d.add(() => mkUp()); d.add(() => mkDown()); d
    }
    now = 4000
    val rez = dz.tryAcquireShard(0)
    assert(rez.isDefined)
    assert(!rez.get.exists(_.output.tip.map(_.value).contains("2026-08-19")),
      "zombie writer's post-fencing event must not replay")
    dz.releaseAll(); dy.releaseAll()
  }

  test("KvEpochWal: snapshot subsumes failed deletions; zombies fenced") {
    val kv = new InMemoryConditionalKv
    val w1 = new KvEpochWal(kv, "app/shards/shard-0/wal", 1)
    w1.appendEvent("/data/a/2026-08-10", blocked = false)
    val w2 = new KvEpochWal(kv, "app/shards/shard-0/wal", 2)
    val st = w2.load().get
    assert(st._1 == List(("/data/a/2026-08-10", false)))
    w2.compact(st._1, st._2)
    // zombie at epoch 1 keeps writing → rejected at replay
    w1.appendEvent("/data/a/2026-08-99", blocked = false)
    assert(w2.load().get._1 == List(("/data/a/2026-08-10", false)))
    // zombie compaction aborts (higher-epoch snapshot)
    w1.compact(List(("/data/a/2026-08-99", false)), Nil)
    assert(w2.load().get._1 == List(("/data/a/2026-08-10", false)))
    // a same-epoch entry with seq below the snapshot (survivor of a
    // partial post-compaction delete) is subsumed, NOT replayed
    val snapKey = kv.list("app/shards/shard-0/wal/snap/").max
    val snapSeq = snapKey.split('-').last.toLong
    kv.put(f"app/shards/shard-0/wal/wal/${2L}%09d-00000000-${snapSeq - 1}%09d",
      "e\t/data/STALE/1")
    assert(!w2.load().get._1.exists(_._1.contains("STALE")),
      "pre-snapshot survivor resurrected stale state")
    // post-snapshot appends (seq > snapshot) replay normally
    w2.appendEvent("/data/b/2026-08-11", blocked = false)
    assert(w2.load().get._1.map(_._1) ==
      List("/data/a/2026-08-10", "/data/b/2026-08-11"))
    // next compaction sweeps survivors
    val st2 = w2.load().get
    w2.compact(st2._1, st2._2)
    assert(kv.list("app/shards/shard-0/wal/wal/").isEmpty)
    assert(KvEpochWalLoadEquals(kv, st2))
  }

  private def KvEpochWalLoadEquals(
      kv: ConditionalKv,
      want: (List[(String, Boolean)], List[String])): Boolean = {
    val w3 = new KvEpochWal(kv, "app/shards/shard-0/wal", 3)
    val got = w3.load().get
    got._1.toSet == want._1.toSet && got._2.toSet == want._2.toSet
  }

  test("stray files in the shard WAL dir degrade to a warning, not a crash") {
    val root = java.nio.file.Files.createTempDirectory("graft_md6").toString
    val shardDir = s"$root/wal"
    val w = new EpochWal(shardDir, conf, 1)
    w.appendEvent("/data/a/2026-08-10", blocked = false)
    // names that START like segments but carry a non-numeric epoch field
    // used to throw NumberFormatException inside load()/compact() and
    // make the whole shard unrecoverable
    for (junk <- Seq("wal-junk-000.log", "snap-x", "wal-", ".wal-tmp"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(shardDir, junk), Array.emptyByteArray)
    val st = w.load().get
    assert(st._1 == List(("/data/a/2026-08-10", false)))
    w.compact(st._1, st._2) // sweeps segments; must not trip on the junk
    assert(w.load().get._1 == List(("/data/a/2026-08-10", false)))
  }

  test("cross-process claim atomicity: no epoch is ever held by two owners") {
    // Four REAL JVMs contend for one shard's lease over a local (POSIX)
    // store with expiry forced on every read — each successful claim is
    // recorded, and the safety property is that every epoch has at most
    // one claimant. This crosses the process boundary the in-process
    // suite cases cannot: RawLocalFileSystem's create(overwrite=false)
    // is exists-then-create, so without the O_EXCL path + read-back
    // verify in ShardLease.claim this test double-claims within seconds.
    // SAFETY (no epoch double-claimed) is asserted on every race;
    // LIVENESS (≥2 distinct winners) gets one retry — under full-suite
    // load a slow JVM boot can hand one owner the whole window.
    def raceOnce(): Seq[(Long, String)] = {
      val root = java.nio.file.Files.createTempDirectory("graft_md7").toString
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val owners = Seq("A", "B", "C", "D")
      val barrier = java.nio.file.Paths.get(root, "go")
      val procs = owners.map { o =>
        new ProcessBuilder(
          javaBin, "-cp", cp, "graft.routing.LeaseContender",
          root, o, "2000").inheritIO().start()
      }
      // contenders signal readiness, then spin on the barrier file so the
      // race starts simultaneously after JVM boot
      val deadline = System.currentTimeMillis() + 60000
      while (owners.exists(o => !java.nio.file.Files.exists(
          java.nio.file.Paths.get(root, s"ready-$o"))) &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      java.nio.file.Files.write(barrier, Array.emptyByteArray)
      procs.foreach(p => assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)))
      procs.foreach(p => assert(p.exitValue() == 0))
      val claims = owners.flatMap { o =>
        val f = java.nio.file.Paths.get(root, s"claims-$o")
        if (!java.nio.file.Files.exists(f)) Nil
        else scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(f)).asScala
          .filter(_.nonEmpty).map(l => (l.toLong, o))
      }
      assert(claims.nonEmpty, "contenders made no claims — harness broken")
      val byEpoch = claims.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
      val doubled = byEpoch.filter(_._2.size > 1).toMap
      assert(doubled.isEmpty, s"epochs claimed by two owners: $doubled")
      claims
    }
    var claims = raceOnce()
    // real contention happened: multiple owners won at least one epoch
    if (claims.map(_._2).distinct.size < 2) claims = raceOnce()
    assert(claims.map(_._2).distinct.size >= 2,
      s"only ${claims.map(_._2).distinct} ever won — no contention exercised")
  }

  test("two OS processes split a real-slot chain; SIGKILL failover finishes it") {
    // The ShardSoak shape at suite scale: two full driver JVMs (each its
    // own SparkSession) split an 8-hop SqlSlot chain over a shared
    // store, one is SIGKILLed mid-chain, the survivor steals the expired
    // leases and completes the remainder; the verify step recomputes the
    // cumulative totals directly from the corpus, so duplicated or lost
    // hop executions after failover fail arithmetically.
    val root = java.nio.file.Files.createTempDirectory("graft_md8").toString
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def proc(args: String*): ProcessBuilder = {
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx3g",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.ShardSoak") ++ args)
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_SOAK_CPUS", "4")
      val tag = args.filterNot(_.contains("/")).mkString("-").replace(',', '_')
      pb.redirectOutput(new java.io.File(root, s"out-$tag.log"))
      pb.redirectErrorStream(true)
      pb
    }
    val stage = proc("stage", root, "/root/testdata/sf0.001", "2").start()
    assert(stage.waitFor(180, java.util.concurrent.TimeUnit.SECONDS) &&
      stage.exitValue() == 0, "staging failed")
    val pa = proc("drive", root, "A", "0,1").start()
    val pb2 = proc("drive", root, "B", "2,3").start()
    val deadline = System.currentTimeMillis() + 120000
    while (Seq("A", "B").exists(o => !java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, s"ready-$o"))) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "go"), Array.emptyByteArray)
    // kill A once the chain is demonstrably executing split (>=3 hops)
    def completions(): Int = Seq("A", "B").map { o =>
      val f = java.nio.file.Paths.get(root, s"events-$o.log")
      if (!java.nio.file.Files.exists(f)) 0
      else scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(f)).asScala
        .count(_.contains("completed "))
    }.sum
    val killBy = System.currentTimeMillis() + 240000
    while (completions() < 3 && System.currentTimeMillis() < killBy &&
        pb2.isAlive)
      Thread.sleep(200)
    assert(completions() >= 3, "chain never reached 3 completions")
    pa.destroyForcibly()
    assert(pb2.waitFor(420, java.util.concurrent.TimeUnit.SECONDS),
      "survivor did not finish after the kill")
    assert(pb2.exitValue() == 0, s"survivor exited ${pb2.exitValue()}")
    val ver = proc("verify", root).start()
    assert(ver.waitFor(180, java.util.concurrent.TimeUnit.SECONDS) &&
      ver.exitValue() == 0, "verify failed: totals wrong or outputs missing")
  }
}

/** Forked-JVM helper for the cross-process claim-atomicity proof: spins
  * on a start barrier, then hammers `tryAcquire` on shard 0 with expiry
  * forced (timeout −1 ⇒ every observed lease is expired) and a FRESH
  * ShardLease instance per attempt (held state lost ⇒ the same-owner
  * path also re-claims), recording every epoch it wins to
  * `<root>/claims-<owner>`. */
object LeaseContender {
  def main(args: Array[String]): Unit = {
    val Array(root, owner, durMs) = args
    val conf = new org.apache.hadoop.conf.Configuration()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, s"ready-$owner"), Array.emptyByteArray)
    val barrier = java.nio.file.Paths.get(root, "go")
    while (!java.nio.file.Files.exists(barrier)) Thread.sleep(5)
    val out = new java.io.PrintWriter(
      new java.io.File(root, s"claims-$owner"))
    try {
      val deadline = System.currentTimeMillis() + durMs.toLong
      while (System.currentTimeMillis() < deadline) {
        val lease = new ShardLease(root, 0, owner, conf,
          leaseTimeoutMillis = -1L)
        lease.tryAcquire().foreach(k => out.println(k))
      }
    } finally out.close()
  }
}
