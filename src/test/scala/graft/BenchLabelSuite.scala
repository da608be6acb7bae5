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

  test("the BENCH_r17 shape self-labels disturbed and names the queries") {
    // r18 (VERDICT r17 #2): the exact r17 artifact — CPU telemetry calm
    // (other_cores 0.0) but q01's middle rep 8x its neighbors (an
    // iowait/page-cache stall the busy-jiffy counters cannot see). The
    // dispersion rule must catch it FROM THE REPS and name the queries.
    val r17 = Map(
      "q01_agg_pricing" -> Seq(2.106, 16.179, 2.149),
      "q02_join_agg_topk" -> Seq(1.711, 6.416, 1.434),
      "q03_star_join" -> Seq(1.028, 3.158, 0.695),
      "q07_window_rank" -> Seq(0.910, 2.065, 0.652),
      "q21_count_distinct" -> Seq(0.911, 1.449, 0.736),
      "fw01_range_union" -> Seq(1.232, 1.147, 0.898),
      "p01_exact_dedup" -> Seq(0.630, 0.445, 0.333),
      "p05_cosine_topk" -> Seq(0.593, 0.452, 0.309),
      "p07_minhash_lsh" -> Seq(3.350, 2.336, 1.836),
      "p12_ann_lsh" -> Seq(0.563, 0.389, 0.285),
      "p14_dup_clusters" -> Seq(4.162, 4.696, 2.627),
      "p18_incremental_dedup" -> Seq(4.876, 1.885, 2.150))
    assert(Bench.disturbedQueries(r17) ==
      List("q01_agg_pricing", "q02_join_agg_topk", "q03_star_join"))
    // dispersion TRUMPS a calm CPU window — r17's exact failure
    assert(Bench.runLabel(Seq(0.0, 0.0, 0.0), Seq(0.0, 0.0, 0.1), r17)
      == "disturbed")
  }

  test("warmup-shaped first-rep inflation does not trip the dispersion " +
    "rule; a calm run stays calm end-to-end") {
    // observed warmup inflation tops out ~3x (even the loaded r14
    // artifact's worst clean query was 3.7x); the threshold sits above it
    val calm = Map(
      "q01_agg_pricing" -> Seq(2.2, 1.6, 1.5),
      "p01_exact_dedup" -> Seq(0.9, 0.35, 0.30)) // 3x warmup
    assert(Bench.disturbedQueries(calm).isEmpty)
    assert(Bench.runLabel(Seq(0.1, 0.0), Seq(0.2, 0.3), calm) == "calm")
    // a loaded CPU window still labels loaded when reps are tight
    assert(Bench.runLabel(Seq(0.1, 4.4), Seq(0.2, 0.3), calm) == "loaded")
    // degenerate rows never divide by zero or trip on a single rep
    assert(Bench.disturbedQueries(Map("x" -> Seq(5.0))).isEmpty)
    assert(Bench.disturbedQueries(Map("x" -> Seq(0.0, 1.0))).isEmpty)
  }

  test("large-SF warmup (first rep only, any magnitude) stays calm; a " +
    "non-first-rep stall still flags (r18 first-rep exclusion)") {
    // the exact sf10 shape measured on an IDLE machine: a fresh JVM's
    // first rep pays codegen+JIT+first-scan that grows with SF (27.2 s
    // vs 5.5 s steady = 5x) — judging it would permanently label every
    // large-SF run disturbed and the label would stop meaning anything
    val sf10warm = Map(
      "q01_agg_pricing" -> Seq(27.223, 5.601, 5.494),
      "p07_minhash_lsh" -> Seq(69.281, 9.120, 10.757))
    assert(Bench.disturbedQueries(sf10warm).isEmpty)
    assert(Bench.runLabel(Seq(0.0, 0.0, 0.0), Seq(0.1, 0.1, 0.1), sf10warm)
      == "calm")
    // but a stall in any NON-first rep is still named (the r17 failure
    // was the MIDDLE rep — warmup can never explain that)
    val midStall = Map("q01" -> Seq(27.0, 5.5, 30.1))
    assert(Bench.disturbedQueries(midStall) == List("q01"))
    // 2-rep runs have no warmup-free pair: both reps are judged
    assert(Bench.disturbedQueries(Map("q" -> Seq(9.0, 2.0))) == List("q"))
  }

  test("a first-rep outlier under hypervisor steal labels disturbed; " +
    "the same shape with clean steal is accepted as warmup (r19)") {
    // ADVICE r18 #4: a stall landing in the FIRST rep of a 3+-rep run is
    // shape-indistinguishable from warmup, so the label consults the
    // first sweep's steal percentage — warmup (codegen/JIT/first-scan)
    // spends CPU and iowait, never steal.
    val firstRepStall = Map(
      "q01_agg_pricing" -> Seq(31.2, 5.6, 5.5), // 5.6x the non-first median
      "p14_dup_clusters" -> Seq(6.1, 5.8, 5.9))
    assert(Bench.firstRepOutliers(firstRepStall) == List("q01_agg_pricing"))
    // steal present during the first sweep: not warmup -> disturbed
    assert(Bench.runLabel(Seq(0.0, 0.0, 0.0), Seq(0.1, 0.1, 0.1),
      firstRepStall, firstSweepStealPct = 3.2) == "disturbed")
    // clean steal (the sf100 cold-scan shape ran 29% IOWAIT, 0 steal):
    // accepted as warmup, run stays calm — but the outlier still ships
    // in the artifact's first_rep_outliers for re-adjudication
    assert(Bench.runLabel(Seq(0.0, 0.0, 0.0), Seq(0.1, 0.1, 0.1),
      firstRepStall, firstSweepStealPct = 0.0) == "calm")
    // unavailable steal telemetry (-1) cannot corroborate a stall: the
    // conservative default is the pre-r19 behavior (warmup accepted)
    assert(Bench.runLabel(Seq(0.0, 0.0, 0.0), Seq(0.1, 0.1, 0.1),
      firstRepStall) == "calm")
    // steal WITHOUT a first-rep outlier does not flip the label on its
    // own (ambient steal with tight reps is the window rules' business)
    assert(Bench.runLabel(Seq(0.0, 0.0, 0.0), Seq(0.1, 0.1, 0.1),
      Map("q" -> Seq(5.6, 5.5, 5.7)), firstSweepStealPct = 3.2) == "calm")
    // the median guard: one fast later rep cannot manufacture an outlier
    // (head/min would read 10.0/0.9 = 11x; head/median reads ~1.1x)
    assert(Bench.firstRepOutliers(Map("q" -> Seq(10.0, 9.5, 0.9))).isEmpty)
    // 2-rep runs have no warmup-free pair and are already judged whole
    // by disturbedQueries; firstRepOutliers stays out of their way
    assert(Bench.firstRepOutliers(Map("q" -> Seq(9.0, 2.0))).isEmpty)
  }

  test("statPctOver reads iowait/steal percentages from stat snapshots") {
    // 100k-jiffy window, 8k of it iowait, 1k steal
    val s0 = Some((50000L, 1000000L, 2000L, 100L, 32))
    val s1 = Some((90000L, 1100000L, 10000L, 1100L, 32))
    assert(math.abs(Bench.statPctOver(s0, s1, _._3) - 8.0) < 1e-9)
    assert(math.abs(Bench.statPctOver(s0, s1, _._4) - 1.0) < 1e-9)
    assert(Bench.statPctOver(None, s1, _._3) == -1.0)
    assert(Bench.statPctOver(s0, s0, _._3) == -1.0) // zero-width window
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

  test("host canary is positive, finite, and repeatable within 2x") {
    // r20 (VERDICT r19 #3): the canary is a fixed single-thread integer
    // loop — its ops/sec must be a stable clock proxy, not noise. Two
    // back-to-back JIT-warm readings on the same host must agree within
    // 2x (in practice they agree within a few percent; 2x keeps the pin
    // honest on a co-tenanted CI host).
    Bench.hostCanaryOpsPerSec(iters = 10000000L) // JIT warmup
    val a = Bench.hostCanaryOpsPerSec(iters = 100000000L)
    val b = Bench.hostCanaryOpsPerSec(iters = 100000000L)
    assert(a > 0 && java.lang.Double.isFinite(a), s"canary a=$a")
    assert(b > 0 && java.lang.Double.isFinite(b), s"canary b=$b")
    assert(math.max(a, b) / math.min(a, b) < 2.0, s"canary spread: $a vs $b")
  }
}
