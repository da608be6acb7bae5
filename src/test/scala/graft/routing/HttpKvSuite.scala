package graft.routing

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** r16 (VERDICT r15 #3): the ConditionalKv contract bound to a REAL
  * conditional-PUT HTTP API — every assertion here crosses actual
  * sockets through [[HttpConditionalKv]] against
  * [[LocalHttpObjectStore]] (S3-shaped If-None-Match / If-Match
  * semantics), instead of the in-memory map that only models them.
  * Covers: the raw contract (incl. 16-way create races and conditional
  * delete), the lease/fencing stack (ShardLease failover on a
  * ConditionalLeaseStore over HTTP), and the rename-free compaction
  * swap (compactNearDupIndexKv end-to-end with probe equality and
  * crash-heal through the HTTP manifest store).
  */
class HttpKvSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var srv: LocalHttpObjectStore = _
  private var kv: HttpConditionalKv = _

  override def beforeAll(): Unit = {
    srv = new LocalHttpObjectStore
    kv = new HttpConditionalKv(srv.endpoint)
  }
  override def afterAll(): Unit = if (srv != null) srv.close()

  test("get/put/delete/list round-trip, keys with slashes and spaces") {
    val k = "compact/some dir/with%odd:chars/.manifest"
    assert(kv.get(k).isEmpty)
    kv.put(k, "v1\nline2\ttab")
    assert(kv.get(k).contains("v1\nline2\ttab"))
    kv.put(k, "v2")
    assert(kv.get(k).contains("v2"))
    assert(kv.list("compact/") == Seq(k))
    assert(kv.list("other/").isEmpty)
    kv.delete(k)
    assert(kv.get(k).isEmpty)
    kv.delete(k) // idempotent — 404 is success
  }

  test("keys are RFC 3986 percent-encoded on the wire — space is %20, " +
      "never the form-encoding '+' a real object store would store " +
      "as a literal plus") {
    assert(kv.enc("a b") == "a%20b")
    assert(kv.enc("a+b") == "a%2Bb")
    assert(kv.enc("compact/some dir/x") == "compact%2Fsome%20dir%2Fx")
    // and literal-plus keys stay distinct from space keys end-to-end
    kv.put("enc/a b", "space")
    kv.put("enc/a+b", "plus")
    assert(kv.get("enc/a b").contains("space"))
    assert(kv.get("enc/a+b").contains("plus"))
  }

  test("putIfNoneMatch: exactly one winner under a 16-way socket race") {
    val key = "race/claim"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val start = new java.util.concurrent.CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger
      val futures = (0 until 16).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            if (kv.putIfNoneMatch(key, s"claimant-$i")) wins.incrementAndGet()
            ()
          }
        })
      }
      start.countDown()
      futures.foreach(_.get())
      assert(wins.get() == 1, s"expected exactly 1 winner, got ${wins.get()}")
      val winner = kv.get(key).get
      assert(winner.startsWith("claimant-"))
      // and the losing claimants' values never landed
      assert(kv.putIfNoneMatch(key, "late") == false)
      assert(kv.get(key).contains(winner))
    } finally pool.shutdown()
  }

  test("deleteIfValue binds to content identity (ETag If-Match)") {
    kv.put("swap/manifest", "mine")
    assert(!kv.deleteIfValue("swap/manifest", "theirs"),
      "mismatched expectation must not delete")
    assert(kv.get("swap/manifest").contains("mine"))
    assert(kv.deleteIfValue("swap/manifest", "mine"))
    assert(kv.get("swap/manifest").isEmpty)
    assert(!kv.deleteIfValue("swap/manifest", "mine"), "absent key = false")
  }

  test("ShardLease failover over the HTTP store: fencing epochs advance") {
    var now = 0L
    def storeFor(shard: Int) =
      new ConditionalLeaseStore(kv, s"leases/shard-$shard")
    val lx = new ShardLease(7, "X", storeFor(7), 1000, () => now)
    val ly = new ShardLease(7, "Y", storeFor(7), 1000, () => now)
    assert(lx.tryAcquire().contains(1L))
    assert(ly.tryAcquire().isEmpty, "live lease must not be stolen")
    now = 900; lx.renew()
    now = 1800
    assert(ly.tryAcquire().isEmpty, "renewed at 900 — still inside timeout")
    now = 2000
    assert(ly.tryAcquire().contains(2L),
      "expired lease must hand over at the NEXT fencing epoch")
    assert(!lx.isCurrent && ly.isCurrent)
    // the epoch files really live in the HTTP store
    assert(kv.list("leases/shard-7/").exists(_.endsWith("epoch-000000002")))
  }

  test("rename-free near-dup compaction end-to-end over HTTP manifests") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("httpkv-compact")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val docs = (0L until 40L).map(i =>
        (i, s"the quick brown fox ${i % 7} jumps over the lazy dog $i"))
        .toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("graft_httpkv").toString
      graft.operators.Dedup.saveNearDupIndex(
        graft.operators.Dedup.buildNearDupIndex(docs, "text", "doc_id",
          k = 8, bands = 4, shingleN = 2), dir)
      (0 until 5).foreach { b =>
        graft.operators.Dedup.updateNearDupIndex(spark, dir,
          Seq((1000L + b, s"fresh document $b")).toDF("doc_id", "text"),
          "text")
      }
      def probe(): Long =
        graft.operators.Dedup.loadNearDupIndex(spark, dir, persist = false)
          .sigs.count()
      val pre = probe()
      val stats = graft.operators.Dedup.compactNearDupIndexKv(spark, dir, kv)
      assert(!stats.sigs.skipped && stats.sigs.filesAfter <= 2, s"$stats")
      assert(probe() == pre, "probe must be value-identical across the swap")
      assert(kv.list("compact/").isEmpty, "HTTP manifests must be cleared")
      // crash mid-swap: the manifest survives IN THE HTTP STORE and the
      // heal (a different client of the same endpoint) rolls forward/back
      graft.operators.Dedup.updateNearDupIndex(spark, dir,
        Seq((2000L, "one more")).toDF("doc_id", "text"), "text")
      val expected = probe()
      intercept[RuntimeException] {
        graft.operators.Dedup.compactNearDupIndexKv(spark, dir, kv,
          failpoint = l => if (l == "new-copied") sys.error("boom"))
      }
      assert(kv.list("compact/").nonEmpty, "crashed swap leaves its manifest")
      val kv2 = new HttpConditionalKv(srv.endpoint) // a fresh client
      assert(graft.operators.Dedup.healNearDupIndexKv(spark, dir, kv2))
      assert(probe() == expected, "healed index must read committed rows")
      assert(kv2.list("compact/").isEmpty)
    } finally spark.stop()
  }
}
