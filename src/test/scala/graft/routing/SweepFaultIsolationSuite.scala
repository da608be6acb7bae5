package graft.routing

import org.scalatest.funsuite.AnyFunSuite

import graft.dimension._
import graft.signal._

/** r14: a sweep probe target that THROWS (bad mount, permissions, a
  * flaky endpoint) must degrade to incomplete-for-this-sweep on its own
  * key only — never abort the whole sweep tick. Before the fix,
  * `probeOutsideMonitor` rethrew the first probe failure out of
  * `sweepPending`, so one persistently-failing path halted every
  * route's sweep-driven progress fleet-wide, forever. */
class SweepFaultIsolationSuite extends AnyFunSuite {

  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  private def ranged(alias: String, root: String): Signal =
    Signal(alias, SignalSource.external(root), daySpec,
      DimFilter.loadRaw(daySpec, DimFilter.RawFilter.leafValues("_:-2")),
      rangeCheckRequired = true)

  private def outputFor(node: SignalLinkNode, id: String): Signal =
    Signal(id, SignalSource.internal("/app", id), daySpec,
      node.deriveOutputFilter(daySpec, Nil))

  /** Probe where selected path prefixes throw; everything else answers
    * from an in-memory set. */
  private final class FaultyProbe extends PathProbe {
    val existing = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val poisoned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val throwCount = new java.util.concurrent.atomic.AtomicInteger(0)
    def exists(path: String): Boolean = {
      if (poisoned.stream().anyMatch(p => path.startsWith(p))) {
        throwCount.incrementAndGet()
        throw new java.io.IOException(s"simulated store failure probing $path")
      }
      existing.contains(path)
    }
  }

  test("one throwing probe target does not abort the sweep; healthy routes fire") {
    val probe = new FaultyProbe
    val table = new RoutingTable(probe)
    val sick = SignalLinkNode(List(ranged("s", "/data/sick"))).withAutoLinks
    table.add(new Route("sick", sick, outputFor(sick, "sick"), Nil))
    val healthy = SignalLinkNode(List(ranged("h", "/data/healthy"))).withAutoLinks
    table.add(new Route("healthy", healthy, outputFor(healthy, "healthy"), Nil))

    // both routes get a pending node awaiting a 2-partition range
    assert(table.receivePath("/data/sick/2026-08-10").isEmpty)
    assert(table.receivePath("/data/healthy/2026-08-10").isEmpty)
    probe.poisoned.add("/data/sick")

    // tick 1: sick path throws; healthy range incomplete -> no fire, no throw
    assert(table.sweepPending().isEmpty)
    assert(probe.throwCount.get() > 0, "the poisoned target was never probed")

    // tick 2: healthy range now complete — it must fire even though the
    // sick probe still throws every tick
    probe.existing.add("/data/healthy/2026-08-10")
    probe.existing.add("/data/healthy/2026-08-09")
    val fired = table.sweepPending()
    assert(fired.length == 1, s"healthy route must fire, got ${fired.length}")
    assert(fired.head.routeId == "healthy")
    assert(table.find("sick").get.pendingNodes.nonEmpty,
      "sick node must stay pending, not be dropped")

    // heal: transient faults self-resolve on a later sweep
    probe.poisoned.clear()
    probe.existing.add("/data/sick/2026-08-10")
    probe.existing.add("/data/sick/2026-08-09")
    val healed = table.sweepPending()
    assert(healed.length == 1 && healed.head.routeId == "sick",
      "healed path must fire on the next sweep")
  }

  test("probe failures are counted per route, not just sampled in the log (r15)") {
    val probe = new FaultyProbe
    val table = new RoutingTable(probe)
    val sick = SignalLinkNode(List(ranged("s", "/data/sick"))).withAutoLinks
    val sickRoute = new Route("sick", sick, outputFor(sick, "sick"), Nil)
    table.add(sickRoute)
    val healthy = SignalLinkNode(List(ranged("h", "/data/healthy"))).withAutoLinks
    val healthyRoute = new Route("healthy", healthy, outputFor(healthy, "healthy"), Nil)
    table.add(healthyRoute)
    assert(table.receivePath("/data/sick/2026-08-10").isEmpty)
    assert(table.receivePath("/data/healthy/2026-08-10").isEmpty)
    probe.poisoned.add("/data/sick")

    // two ticks: the sick route's 2-target range fails both times — its
    // counter records 2 per tick; the healthy route's stays at zero
    table.sweepPending()
    table.sweepPending()
    assert(sickRoute.counters.probeFailures == 4L,
      s"expected 2 targets x 2 ticks, got ${sickRoute.counters.probeFailures}")
    assert(healthyRoute.counters.probeFailures == 0L,
      "failures must be attributed to the owning route only")

    // healed path stops counting
    probe.poisoned.clear()
    probe.existing.add("/data/sick/2026-08-10")
    probe.existing.add("/data/sick/2026-08-09")
    table.sweepPending()
    assert(sickRoute.counters.probeFailures == 4L,
      "a healthy tick must not grow the counter")
  }

  test("a throwing target folds to incomplete, not to a live re-probe under the monitor") {
    // If the failed key were merely OMITTED from the snapshot, the
    // SnapshotProbe would fall back to the live probe UNDER the table
    // monitor and the sweep would throw there instead. Pin the fold:
    // with every target poisoned, sweepPending returns empty cleanly.
    val probe = new FaultyProbe
    val table = new RoutingTable(probe)
    val n = SignalLinkNode(List(ranged("a", "/data/a"))).withAutoLinks
    table.add(new Route("r", n, outputFor(n, "r"), Nil))
    assert(table.receivePath("/data/a/2026-08-10").isEmpty)
    probe.poisoned.add("/data/a")
    val before = probe.throwCount.get()
    assert(table.sweepPending().isEmpty)
    val sweep1Throws = probe.throwCount.get() - before
    // 2-partition range = 2 targets probed in phase 2; the monitor-held
    // phase 3 must add ZERO live probes (each would throw and abort)
    assert(sweep1Throws == 2,
      s"expected exactly the 2 snapshot-phase probes, got $sweep1Throws — " +
        "a snapshot miss is falling through to a live probe")
  }
}
