import graft.dimension._
import graft.routing._
import graft.signal._
object CkptBench extends App {
  val n = 4000
  val daySpec = DimSpec.pretty("day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
  def sig(alias: String, root: String) = Signal(alias, SignalSource.external(root), daySpec, DimFilter.allPassFor(daySpec))
  val node = SignalLinkNode(List(sig("a", "/data/a"), sig("b", "/data/b"))).withAutoLinks
  val out = Signal("joined", SignalSource.internal("/app", "joined"), daySpec, node.deriveOutputFilter(daySpec, Nil))
  def run(label: String, compactEvery: Int): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("ckpt_bench").toString
    val cp = new RoutingCheckpoint(s"$tmp/state.json", new org.apache.hadoop.conf.Configuration())
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
  // interleaved double runs: the first lap is JIT warmup for both modes
  run("warmup no-compact", 1000000)
  run("warmup compact@1000", 1000)
  run("checkpointed (no compaction window hit)", 1000000)
  // live compaction engaged every 1000 events: load() + snapshot rewrite
  // amortized over the window — the long-lived-driver steady state
  run("checkpointed + live compaction @1000", 1000)
}
