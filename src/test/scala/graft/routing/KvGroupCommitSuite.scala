package graft.routing

import org.scalatest.funsuite.AnyFunSuite

import graft.dimension._
import graft.signal._

/** r14: [[KvEpochWal]] group commit — batch N records per conditional
  * PUT so object-store latency (20-50 ms/PUT) stops capping event
  * throughput at ~20-50/s. The key format and replay path are
  * unchanged (one key may now hold N lines; load() always folded values
  * line-by-line), so every fencing/subsumption rule must hold verbatim
  * on the batched backend. */
class KvGroupCommitSuite extends AnyFunSuite {

  private def batched(kv: ConditionalKv, epoch: Long): KvEpochWal =
    new KvEpochWal(kv, "app/shards/shard-0/wal", epoch,
      groupCommit = 64, flushIntervalMs = 1L)

  test("batched appends replay in exact order and actually batch") {
    val kv = new InMemoryConditionalKv
    val w = batched(kv, 1)
    val paths = (0 until 500).map(i => f"/data/a/2026-08-$i%03d")
    paths.foreach(p => w.appendEvent(p, blocked = false))
    w.appendCompleted("/done/1")
    w.flush()
    val (events, completed) = w.load().get
    assert(events.map(_._1) == paths.toList, "replay order must equal append order")
    assert(completed == List("/done/1"))
    val keys = kv.list("app/shards/shard-0/wal/wal/")
    assert(keys.length < 501,
      s"501 records in ${keys.length} keys — group commit never batched")
    w.dispose()
  }

  test("payload metacharacters round-trip through a multi-line batch value") {
    val kv = new InMemoryConditionalKv
    val w = batched(kv, 1)
    // \n and \r in a payload would split/merge batch lines if unescaped
    val nasty = List("/p/with\nnewline", "/p/with\rcr", "/p/with\ttab",
      "/p/with%0Aliteral", "/p/plain")
    nasty.foreach(p => w.appendEvent(p, blocked = true))
    w.flush()
    assert(w.load().get._1 == nasty.map(_ -> true),
      "escaped payloads must round-trip exactly through batched values")
    w.dispose()
  }

  test("compact drains the buffer; snapshot subsumption stays exact") {
    val kv = new InMemoryConditionalKv
    val w = batched(kv, 1)
    (0 until 100).foreach(i => w.appendEvent(s"/data/a/$i", blocked = false))
    val st = (List(("/data/a/99", false)), List.empty[String])
    w.compact(st._1, st._2) // flushes first; snapshot seq > all records
    assert(kv.list("app/shards/shard-0/wal/wal/").isEmpty,
      "pre-snapshot batch keys must be swept")
    assert(w.load().get._1 == st._1)
    // post-compaction appends land after the snapshot
    w.appendEvent("/data/b/1", blocked = false)
    w.flush()
    assert(w.load().get._1 == List(("/data/a/99", false), ("/data/b/1", false)))
    w.dispose()
  }

  test("a restarted owner's seq recovery keys sort after surviving batches") {
    val kv = new InMemoryConditionalKv
    val w1 = batched(kv, 1)
    (0 until 100).foreach(i => w1.appendEvent(s"/old/$i", blocked = false))
    w1.flush(); w1.dispose()
    // a new instance recovers max seq from KEY names (= each batch's
    // FIRST record seq); its appends must still sort after the old
    // batches' contents at replay
    val w2 = batched(kv, 1)
    w2.appendEvent("/new/0", blocked = false)
    w2.flush()
    val got = w2.load().get._1.map(_._1)
    assert(got.take(100) == (0 until 100).map(i => s"/old/$i").toList &&
      got.last == "/new/0",
      s"restart appends must replay after prior batches, got tail=${got.takeRight(3)}")
    w2.dispose()
  }

  test("zombie fencing holds on the batched backend") {
    val kv = new InMemoryConditionalKv
    val w1 = batched(kv, 1)
    w1.appendEvent("/data/a/2026-08-10", blocked = false)
    w1.flush()
    val w2 = batched(kv, 2)
    val st = w2.load().get
    w2.compact(st._1, st._2)
    // zombie epoch-1 writer keeps batching → rejected at replay
    w1.appendEvent("/data/a/2026-08-99", blocked = false)
    w1.flush()
    assert(w2.load().get._1 == List(("/data/a/2026-08-10", false)))
    w1.dispose(); w2.dispose()
  }

  // ---- end-to-end: the FULL KV backend with group-committed WAL ----

  private val conf = new org.apache.hadoop.conf.Configuration()
  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
  private def extSig(alias: String, root: String): Signal =
    Signal(alias, SignalSource.external(root), daySpec,
      DimFilter.loadRaw(daySpec, DimFilter.RawFilter.leafValues("*")))
  private def mkRoute(id: String): Route = {
    val n = SignalLinkNode(List(extSig("a", "/data/a"))).withAutoLinks
    new Route(id, n, Signal(id, SignalSource.internal("/app", id), daySpec,
      n.deriveOutputFilter(daySpec, Nil)), Nil)
  }

  test("failover replays group-committed records once they are flushed") {
    val kv = new InMemoryConditionalKv
    var now = 0L
    val clock = () => now
    val allExists = new PathProbe { def exists(p: String) = false }
    def mkDriver(id: String) = {
      val d = new ShardedDriver("app", id, 1, allExists, conf,
        leaseTimeoutMillis = 1000, clock = clock, kvStore = Some(kv),
        kvGroupCommit = 64)
      d.add(() => mkRoute("r")); d
    }
    val dx = mkDriver("X")
    assert(dx.tryAcquireShard(0).contains(Nil))
    val ctxs = dx.receivePath("/data/a/2026-08-13")
    assert(ctxs.map(_.routeId) == List("r"))
    // the record is async — wait for the flusher (interval 5 ms), then
    // simulate X dying without close(): the flushed batch must replay
    val deadline = System.nanoTime() + 2e9.toLong
    while (kv.list("app/shards/shard-0/wal/wal/").isEmpty &&
           System.nanoTime() < deadline) Thread.sleep(2)
    assert(kv.list("app/shards/shard-0/wal/wal/").nonEmpty,
      "flusher never PUT the batch")
    now = 2000
    val dy = mkDriver("Y")
    val recovered = dy.tryAcquireShard(0)
    assert(recovered.isDefined, "expired lease must hand over")
    assert(recovered.get.map(_.output.tip.map(_.value).head) ==
      List("2026-08-13"), "flushed batch must replay on the successor")
    dy.releaseAll()
  }

  test("a dead flusher fails the WAL loudly instead of hanging (r15)") {
    // ADVICE r14: an InterruptedException escaping poll/sleep is NOT
    // NonFatal, so it killed the flusher silently and flush()/close()
    // spun forever in their wait loop. Pin: interrupt the flusher while
    // it is blocked inside a PUT — flush() and record() must THROW with
    // the cause chained, not hang.
    val inner = new InMemoryConditionalKv
    val gate = new java.util.concurrent.CountDownLatch(1)
    val blockingKv = new ConditionalKv {
      def put(key: String, value: String): Unit = {
        gate.countDown()
        Thread.sleep(600000) // the flusher parks here until interrupted
      }
      def putIfNoneMatch(key: String, value: String): Boolean =
        inner.putIfNoneMatch(key, value)
      def get(key: String): Option[String] = inner.get(key)
      def list(prefix: String): Seq[String] = inner.list(prefix)
      def delete(key: String): Unit = inner.delete(key)
    }
    val w = new KvEpochWal(blockingKv, "app/shards/shard-9/wal", 1L,
      groupCommit = 8, flushIntervalMs = 1L)
    w.appendEvent("/data/a/1", blocked = false)
    assert(gate.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "flusher never reached the PUT")
    import scala.jdk.CollectionConverters._
    val th = Thread.getAllStackTraces.keySet.asScala
      .find(_.getName == "graft-kvwal-flusher-app/shards/shard-9/wal")
      .getOrElse(fail("flusher thread not found"))
    th.interrupt()
    th.join(5000)
    assert(!th.isAlive, "interrupted flusher should exit")
    val e = intercept[IllegalStateException] { w.flush() }
    assert(e.getMessage.contains("flusher thread died"))
    assert(e.getCause != null, "original cause must be chained")
    intercept[IllegalStateException] {
      w.appendEvent("/data/a/2", blocked = false)
    }
  }
}
