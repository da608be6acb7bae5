package graft

import org.scalatest.funsuite.AnyFunSuite

/** r15 (VERDICT r14 #2): the bench's window label must CONSUME its own
  * telemetry — BENCH_r14 self-labeled "calm" while its jvm series showed
  * a co-tenant taking the machine mid-run (own_cores collapsing, walls
  * rising, GC flat, loadavg_other erased to 0.00 by the EWMA self-
  * subtraction). The labeling rule is a pure function so the exact
  * failing shape is pinned here, no host required. */
class BenchLabelSuite extends AnyFunSuite {

  test("the BENCH_r14 shape self-labels loaded") {
    // pre-sweep other-load read clean (the EWMA arithmetic erased the
    // burst) but the measured per-sweep co-tenant CPU shows the machine
    // went elsewhere during sweeps 2 and 3
    assert(Bench.windowLabel(
      preSweepOtherLoad = Seq(0.0, 0.0, 0.0),
      sweepOtherCores = Seq(0.4, 12.3, 9.8)) == "loaded")
  }

  test("a genuinely calm run labels calm") {
    assert(Bench.windowLabel(
      preSweepOtherLoad = Seq(0.1, 0.0, 0.3),
      sweepOtherCores = Seq(0.2, 0.5, 0.1)) == "calm")
  }

  test("a pre-sweep burst still degrades the label (r13 rule retained)") {
    assert(Bench.windowLabel(
      preSweepOtherLoad = Seq(0.1, 4.2, 0.3),
      sweepOtherCores = Seq(0.2, 0.5, 0.1)) == "loaded")
  }

  test("unavailable readings (-1) never count as calm") {
    assert(Bench.windowLabel(Seq(-1.0, 0.0), Seq(0.1, 0.1)) == "loaded")
    assert(Bench.windowLabel(Seq(0.0, 0.0), Seq(-1.0, 0.1)) == "loaded")
    assert(Bench.windowLabel(Nil, Nil) == "loaded")
  }

  test("threshold is strict: exactly 2.0 cores of co-tenant is loaded") {
    assert(Bench.windowLabel(Seq(0.0), Seq(2.0)) == "loaded")
    assert(Bench.windowLabel(Seq(0.0), Seq(1.9)) == "calm")
    assert(Bench.windowLabel(Seq(2.0), Seq(0.0)) == "loaded")
  }

  test("otherCoresOver measures co-tenant cores from jiffy deltas") {
    // 10 s wall on a 64-cpu HOST where /proc/stat says 40% of capacity
    // was busy while this process used 2 cores: co-tenant = 0.4*64 - 2.
    // The host cpu count comes from /proc/stat itself (per-cpu lines) —
    // NOT availableProcessors, which is cgroup-quota-aware and would
    // under-scale the host-wide busy fraction inside a container.
    val n = 64
    val wall = 10L * 1000 * 1000 * 1000
    val total0 = 1000000L
    val totalD = 50000L
    val busyD = totalD * 2 / 5 // 40% busy
    val own = 2L * wall // 2 cores' worth of cpu-time
    val got = Bench.otherCoresOver(
      Some((500L, total0, n)), Some((500L + busyD, total0 + totalD, n)),
      own, wall)
    assert(math.abs(got - (0.4 * n - 2.0)) < 1e-9, s"got $got")
    // unavailable stat or zero-width window -> -1 (never calm)
    assert(Bench.otherCoresOver(None, Some((1L, 2L, n)), own, wall) == -1.0)
    assert(Bench.otherCoresOver(Some((1L, 2L, n)), Some((1L, 2L, n)), own,
      wall) == -1.0)
    // own >= busy clamps at 0, not negative
    assert(Bench.otherCoresOver(Some((0L, total0, n)),
      Some((busyD, total0 + totalD, n)), 100L * wall, wall) == 0.0)
  }
}
