package graft.routing

import org.scalatest.funsuite.AnyFunSuite

import graft.dimension._
import graft.signal._

/** r13: sweep probe I/O must never hold the RoutingTable monitor —
  * event ingestion stays responsive while a sweep waits on slow remote
  * storage. The probe BLOCKS on a latch mid-sweep; with the old
  * in-monitor probing, `receivePath` could not return until the sweep
  * finished, so the latency assertion below deadlocked-then-failed. */
class SweepLatencySuite extends AnyFunSuite {

  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  private def ranged(alias: String, root: String): Signal =
    Signal(alias, SignalSource.external(root), daySpec,
      DimFilter.loadRaw(daySpec, DimFilter.RawFilter.leafValues("_:-2")),
      rangeCheckRequired = true)

  private def chained(alias: String, root: String, day: String): Signal =
    Signal(alias, SignalSource.external(root),
      daySpec, DimFilter.branchOf(daySpec, Seq(day)))

  private def outputFor(node: SignalLinkNode, id: String): Signal =
    Signal(id, SignalSource.internal("/app", id), daySpec,
      node.deriveOutputFilter(daySpec, Nil))

  /** Existence probe that can block every call on a latch (sweep phase)
    * while signalling that the sweep has entered its I/O. */
  private final class GatedProbe extends PathProbe {
    @volatile var gate: Option[(java.util.concurrent.CountDownLatch,
      java.util.concurrent.CountDownLatch)] = None
    val existing = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def exists(path: String): Boolean = {
      gate.foreach { case (entered, release) =>
        entered.countDown()
        release.await(10, java.util.concurrent.TimeUnit.SECONDS)
      }
      existing.contains(path)
    }
  }

  test("event ingestion is not starved by a blocked sweep") {
    val probe = new GatedProbe
    val table = new RoutingTable(probe)
    val waitNode = SignalLinkNode(List(ranged("a", "/data/a"))).withAutoLinks
    table.add(new Route("waiting", waitNode, outputFor(waitNode, "waiting"), Nil))
    val fastNode = SignalLinkNode(List(
      Signal("f", SignalSource.external("/data/fast"), daySpec,
        DimFilter.loadRaw(daySpec, DimFilter.RawFilter.leafValues("*")))))
      .withAutoLinks
    table.add(new Route("fast", fastNode, outputFor(fastNode, "fast"), Nil))

    // 20 pending nodes, each awaiting a 2-partition range (none exist)
    (1 to 20).foreach { d =>
      assert(table.receivePath(f"/data/a/2026-07-$d%02d").isEmpty)
    }
    assert(table.find("waiting").get.pendingNodes.length == 20)

    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    probe.gate = Some((entered, release))
    @volatile var swept: List[ExecutionContext] = null
    val sweeper = new Thread(() => { swept = table.sweepPending() })
    sweeper.start()
    assert(entered.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "sweep never reached its probe I/O")
    // the sweep is now BLOCKED inside probe I/O; the monitor must be free
    val t0 = System.nanoTime()
    val ctxs = table.receivePath("/data/fast/2026-08-12")
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ctxs.length == 1, "fast route must trigger during the sweep")
    assert(ms < 2000,
      f"receivePath took $ms%.0f ms while a sweep was probing — " +
        "probe I/O is holding the table monitor")
    release.countDown()
    sweeper.join(15000)
    assert(swept != null && swept.isEmpty) // nothing completed yet

    // functional check: with partitions present the sweep still fires
    probe.gate = None
    (1 to 20).foreach { d =>
      probe.existing.add(f"/data/a/2026-07-$d%02d")
      probe.existing.add(f"/data/a/2026-07-${d - 1}%02d")
    }
    probe.existing.add("/data/a/2026-06-30")
    val fired = table.sweepPending()
    assert(fired.length == 20,
      s"sweep with snapshot probe must fire all ready nodes, got ${fired.length}")
  }

  test("single-route sweep uses the same monitor-free path") {
    val probe = new GatedProbe
    val table = new RoutingTable(probe)
    val waitNode = SignalLinkNode(List(ranged("a", "/data/a"))).withAutoLinks
    table.add(new Route("waiting", waitNode, outputFor(waitNode, "waiting"), Nil))
    assert(table.receivePath("/data/a/2026-07-05").isEmpty)
    probe.existing.add("/data/a/2026-07-05")
    probe.existing.add("/data/a/2026-07-04")
    assert(table.sweepPendingRoute("waiting").length == 1)
    assert(table.sweepPendingRoute("waiting").isEmpty) // drained
  }
}
