import graft.dimension._
import graft.routing._
import graft.signal._
object CkptBench extends App {
  val n = 4000
  val daySpec = DimSpec.pretty("day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
  def sig(alias: String, root: String) = Signal(alias, SignalSource.external(root), daySpec, DimFilter.allPassFor(daySpec))
  val node = SignalLinkNode(List(sig("a", "/data/a"), sig("b", "/data/b"))).withAutoLinks
  val out = Signal("joined", SignalSource.internal("/app", "joined"), daySpec, node.deriveOutputFilter(daySpec, Nil))
  def run(label: String, compactEvery: Int,
          mkWal: String => RoutingWal = tmp =>
            new RoutingCheckpoint(s"$tmp/state.json",
              new org.apache.hadoop.conf.Configuration())): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("ckpt_bench").toString
    val cp = mkWal(tmp)
    val table = new RoutingTable(new PathProbe { def exists(p: String) = true },
      Some(cp), compactEveryEvents = compactEvery)
    table.add(new Route("joined", node, out, Nil))
    val day0 = java.time.LocalDate.of(2000, 1, 1)
    val t0 = System.nanoTime()
    (0 until n / 2).foreach { i =>
      val d = day0.plusDays(i.toLong % 365).toString
      table.receivePath(s"/data/a/$d"); table.receivePath(s"/data/b/$d")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"$label: ${n / secs}%.0f events/s over $n events")
  }
  def epochWal(tmp: String): RoutingWal =
    new EpochWal(s"$tmp/shard-0/wal", new org.apache.hadoop.conf.Configuration(), 1)
  // interleaved double runs: the first lap is JIT warmup for both modes
  run("warmup no-compact", 1000000)
  run("warmup compact@1000", 1000)
  run("warmup sharded", 1000000, epochWal)
  run("checkpointed (no compaction window hit)", 1000000)
  // live compaction engaged every 1000 events: load() + snapshot rewrite
  // amortized over the window — the long-lived-driver steady state
  run("checkpointed + live compaction @1000", 1000)
  // the multi-driver per-shard WAL (epoch-named segments, same O(1)
  // append + hflush): per-driver throughput must stay within ~20% of
  // the single-driver checkpoint — leases renew per seconds, not per
  // event, so nothing else touches the shared store on this path
  run("sharded epoch WAL (per-driver)", 1000000, epochWal)
  run("sharded epoch WAL + live compaction @1000", 1000, epochWal)

  /** KV-backend WAL throughput under injected object-store latency:
    * per-record PUTs collapse to ~1000/latency events/s; group commit
    * (one multi-line PUT per batch) amortizes the round-trip. The timed
    * region includes the final flush() so async batching can't cheat by
    * leaving records buffered. */
  def kvRun(label: String, latencyMs: Long, group: Int, events: Int): Unit = {
    val kv = new LatencyInjectedKv(new InMemoryConditionalKv, latencyMs)
    val wal = new KvEpochWal(kv, "bench/wal", 1, groupCommit = group)
    val table = new RoutingTable(new PathProbe { def exists(p: String) = true },
      Some(wal), compactEveryEvents = 1000000)
    table.add(new Route("joined", node, out, Nil))
    val day0 = java.time.LocalDate.of(2000, 1, 1)
    val t0 = System.nanoTime()
    (0 until events / 2).foreach { i =>
      val d = day0.plusDays(i.toLong % 365).toString
      table.receivePath(s"/data/a/$d"); table.receivePath(s"/data/b/$d")
    }
    wal.flush()
    val secs = (System.nanoTime() - t0) / 1e9
    wal.dispose()
    println(f"$label: ${events / secs}%.0f events/s over $events events")
  }
  kvRun("kv WAL warmup", 0, 64, 4000)
  kvRun("kv WAL latency=0ms  per-record", 0, 1, 4000)
  kvRun("kv WAL latency=0ms  group=64", 0, 64, 4000)
  kvRun("kv WAL latency=1ms  per-record", 1, 1, 2000)
  kvRun("kv WAL latency=1ms  group=64", 1, 64, 4000)
  kvRun("kv WAL latency=10ms per-record", 10, 1, 400)
  kvRun("kv WAL latency=10ms group=64", 10, 64, 4000)
  kvRun("kv WAL latency=50ms per-record", 50, 1, 100)
  kvRun("kv WAL latency=50ms group=64", 50, 64, 2000)
  kvRun("kv WAL latency=50ms group=256", 50, 256, 4000)
}
