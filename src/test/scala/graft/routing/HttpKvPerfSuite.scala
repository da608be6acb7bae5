package graft.routing

import org.scalatest.funsuite.AnyFunSuite

/** Throughput sanity of the HTTP KV pair (used to size soak budgets). */
class HttpKvPerfSuite extends AnyFunSuite {
  test("sequential op latency is sub-ms scale") {
    val srv = new LocalHttpObjectStore
    val kv = new HttpConditionalKv(srv.endpoint)
    try {
      val t0 = System.nanoTime()
      (0 until 1000).foreach { i => kv.put(s"k/$i", "v" * 100); kv.get(s"k/$i") }
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"2000 ops in $sec%.2f s (${sec / 2000 * 1000}%.2f ms/op)")
      val t1 = System.nanoTime()
      (0 until 100).foreach(_ => kv.list("k/"))
      info(f"100 lists in ${(System.nanoTime() - t1) / 1e9}%.2f s")
      assert(sec < 30.0)
    } finally srv.close()
  }
}
