import graft.dimension._
import graft.routing._
import graft.signal._

/** Orchestrator-only throughput micro-bench (no Spark I/O): N partition
  * events through a 2-input coincidence route. BASELINE.md target:
  * >= 1000 events/s, < 10 ms/event. */
object RoutingBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val daySpec = DimSpec.pretty(
      "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
    def sig(alias: String, root: String) = Signal(alias,
      SignalSource.external(root), daySpec, DimFilter.allPassFor(daySpec))
    val node = SignalLinkNode(List(sig("a", "/data/a"), sig("b", "/data/b"))).withAutoLinks
    val out = Signal("joined", SignalSource.internal("/app", "joined"), daySpec,
      node.deriveOutputFilter(daySpec, Nil))
    val table = new RoutingTable(new PathProbe { def exists(p: String) = true })
    table.add(new Route("joined", node, out, Nil))

    val day0 = java.time.LocalDate.of(2000, 1, 1)
    var triggered = 0
    val t0 = System.nanoTime()
    (0 until n / 2).foreach { i =>
      val d = day0.plusDays(i.toLong % 365).toString
      triggered += table.receivePath(s"/data/a/$d").length
      triggered += table.receivePath(s"/data/b/$d").length
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"routing_events_per_sec","value":${n / secs}%.0f,"events":$n,"triggered":$triggered,"sec":$secs%.3f}""")
    require(triggered > 0, "no triggers fired — bench is broken")

    // ---- routing-table SCALE mode (VERDICT r11 #4): args(1) = route
    // count. The reference's RouteIndex serves hundreds of routes
    // (constructs.py:2705-2741); this declares `nRoutes` two-input
    // coincidence routes on distinct source roots, half-joins every one
    // (nRoutes pending nodes), sweeps the full table, then completes
    // every join — per-event cost must track the EVENT (indexed
    // dispatch), not the table size.
    if (args.length > 1) {
      val nRoutes = args(1).toInt
      val table2 = new RoutingTable(new PathProbe { def exists(p: String) = true })
      val tDecl0 = System.nanoTime()
      (0 until nRoutes).foreach { i =>
        val ln = SignalLinkNode(List(
          sig("a", s"/data10k/a$i"), sig("b", s"/data10k/b$i"))).withAutoLinks
        val o = Signal(s"j$i", SignalSource.internal("/app10k", s"j$i"),
          daySpec, ln.deriveOutputFilter(daySpec, Nil))
        table2.add(new Route(s"j$i", ln, o, Nil))
      }
      val tDecl = (System.nanoTime() - tDecl0) / 1e9
      val day = "2026-08-14"
      val tA0 = System.nanoTime()
      var pendingCreated = 0
      (0 until nRoutes).foreach { i =>
        pendingCreated += table2.receivePath(s"/data10k/a$i/$day").length
      }
      val tA = (System.nanoTime() - tA0) / 1e9
      val tS0 = System.nanoTime()
      val swept = table2.sweepPending().length
      val tSweep = (System.nanoTime() - tS0) / 1e9
      val tB0 = System.nanoTime()
      var trig = 0
      (0 until nRoutes).foreach { i =>
        trig += table2.receivePath(s"/data10k/b$i/$day").length
      }
      val tB = (System.nanoTime() - tB0) / 1e9
      require(trig == nRoutes,
        s"expected $nRoutes triggers, got $trig — scale bench broken")
      println(f"""{"metric":"routing_scale","routes":$nRoutes,"declare_sec":$tDecl%.2f,"half_join_events_per_sec":${nRoutes / tA}%.0f,"sweep_sec_at_${nRoutes}_pending":$tSweep%.3f,"swept":$swept,"complete_events_per_sec":${nRoutes / tB}%.0f,"triggered":$trig}""")
    }
  }
}
