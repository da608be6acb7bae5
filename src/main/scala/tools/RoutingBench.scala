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
  }
}
