package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The r16 sf1-gate trap, as code: fw staging dirs cached corpora behind
  * `_SUCCESS` markers keyed only on the sf basename, so REGENERATED
  * source data silently reran the gate on stale staging (fw14 kept 1/10
  * of the oracle's docs). Staging dirs are now keyed on a content
  * fingerprint of the source tables; regenerating a table must yield a
  * different staging dir and evict the stale one (VERDICT r16 Next #1). */
class StagingSuite extends AnyFunSuite {

  private def writeTable(dir: java.io.File, name: String,
                         bytes: Array[Byte], mtime: Long): Unit = {
    val f = new java.io.File(dir, name)
    val out = new java.io.FileOutputStream(f)
    try out.write(bytes) finally out.close()
    assert(f.setLastModified(mtime))
  }

  test("staging dir is keyed on source-table content; a regen re-keys " +
    "and evicts the stale dir") {
    val sf = java.nio.file.Files.createTempDirectory("graft_fp_sf").toFile
    val t0 = 1700000000000L
    writeTable(sf, "orders.parquet", "v1-orders".getBytes, t0)
    writeTable(sf, "lineitem.parquet", "v1-lineitem".getBytes, t0)

    val w1 = Framework.work(sf.getPath)
    assert(w1.startsWith(s"/tmp/graft_fw_${sf.getName}_"), w1)
    // simulate the gate staging a corpus behind a _SUCCESS marker
    val staged = new java.io.File(s"$w1/orders_daily/2026-08-10")
    assert(staged.mkdirs())
    new java.io.FileOutputStream(
      new java.io.File(staged, "_SUCCESS")).close()

    // same data -> same dir (idempotent across calls)
    assert(Framework.work(sf.getPath) == w1)

    // regenerate one table (new bytes + mtime, like a driver regen)
    writeTable(sf, "orders.parquet", "v2-orders-longer".getBytes, t0 + 60000)
    val w2 = Framework.work(sf.getPath)
    assert(w2 != w1, "regenerated source data reused the old staging key")
    // the stale staging tree is evicted — its _SUCCESS cannot gate reuse
    assert(!new java.io.File(w1).exists(),
      s"stale staging $w1 survived the regen")

    // same-length same-mtime rewrite is the one shape (name,len,mtime)
    // cannot see — pin that ONLY a real regen re-keys (documented limit)
    assert(Framework.work(sf.getPath) == w2)
  }

  test("fingerprint ignores non-parquet files (markers, temp dirs)") {
    val sf = java.nio.file.Files.createTempDirectory("graft_fp_sf2").toFile
    writeTable(sf, "orders.parquet", "x".getBytes, 1700000000000L)
    val fp1 = Framework.sourceFingerprint(sf.getPath)
    new java.io.FileOutputStream(new java.io.File(sf, "notes.txt")).close()
    assert(Framework.sourceFingerprint(sf.getPath) == fp1)
  }
}
