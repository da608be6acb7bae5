package graft.compute

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** r16 claim-protocol hardening (ADVICE r15): acquire read-back verify,
  * tombstone-based stale clear, ownership-checked heartbeat that can
  * never resurrect a released claim or clobber a successor's, and an
  * owner-checked release. No SparkSession — pure filesystem protocol. */
class FsClaimSuite extends AnyFunSuite {

  import Compaction.FsClaim

  private val fs: FileSystem = FileSystem.getLocal(new Configuration())

  private def tmpClaim(): Path = {
    val d = java.nio.file.Files.createTempDirectory("fsclaim").toFile
    d.deleteOnExit()
    new Path(d.getAbsolutePath, ".claim")
  }

  private def read(p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeClaim(p: Path, uuid: String, ts: Long): Unit = {
    val out = fs.create(p, true)
    try out.write(s"$uuid\t$ts".getBytes("UTF-8")) finally out.close()
  }

  test("acquire returns the written uuid and read-back verifies it") {
    val claim = tmpClaim()
    val uuid = FsClaim.acquire(fs, claim, "t")
    assert(read(claim).startsWith(uuid + "\t"))
    // a second claimant loses loudly
    val e = intercept[IllegalStateException] { FsClaim.acquire(fs, claim, "t") }
    assert(e.getMessage.contains("lost the claim race"))
    FsClaim.release(fs, claim, uuid)
    assert(!fs.exists(claim))
  }

  test("release is owner-checked: a foreign release leaves the claim") {
    val claim = tmpClaim()
    val uuid = FsClaim.acquire(fs, claim, "t")
    FsClaim.release(fs, claim, "not-the-owner")
    assert(fs.exists(claim), "foreign release must not delete a live claim")
    FsClaim.release(fs, claim, uuid)
    assert(!fs.exists(claim))
  }

  test("ensureUnclaimed: fresh throws, stale clears via tombstone") {
    val claim = tmpClaim()
    writeClaim(claim, "live", System.currentTimeMillis())
    val e = intercept[IllegalStateException] {
      FsClaim.ensureUnclaimed(fs, claim, 60000L, "t")
    }
    assert(e.getMessage.contains("compaction in progress"))
    // stale: cleared, and no tombstone litter survives
    writeClaim(claim, "dead", System.currentTimeMillis() - 120000L)
    FsClaim.ensureUnclaimed(fs, claim, 60000L, "t")
    assert(!fs.exists(claim))
    val litter = fs.listStatus(claim.getParent)
      .map(_.getPath.getName).filter(_.startsWith(".claim-tombstone"))
    assert(litter.isEmpty, s"tombstone litter: ${litter.mkString(",")}")
  }

  test("heartbeat refreshes its own claim's timestamp, same uuid") {
    val claim = tmpClaim()
    val uuid = FsClaim.acquire(fs, claim, "t")
    val ts0 = read(claim).split('\t')(1).toLong
    val hb = FsClaim.startHeartbeat(fs, claim, ttlMs = 3000L, uuid)
    try {
      Thread.sleep(2500L) // ≥ 2 ticks at period = max(1000, ttl/3)
      val Array(u, ts) = read(claim).split('\t')
      assert(u == uuid, "heartbeat must keep the OWNER uuid")
      assert(ts.toLong > ts0, "heartbeat must refresh the timestamp")
    } finally hb.close()
    FsClaim.release(fs, claim, uuid)
  }

  test("heartbeat never overwrites a successor's claim (foreign uuid)") {
    val claim = tmpClaim()
    val uuid = FsClaim.acquire(fs, claim, "t")
    val hb = FsClaim.startHeartbeat(fs, claim, ttlMs = 3000L, uuid)
    try {
      // a bystander stale-clears and a successor re-acquires
      writeClaim(claim, "successor", 42L)
      Thread.sleep(2500L)
      assert(read(claim) == "successor\t42",
        "heartbeat overwrote a claim it does not own")
    } finally hb.close()
  }

  /** Injects read (open) failures — the transient-503 shape of an
    * object store — while create/delete/exists stay healthy. */
  private class FlakyReadFs(underlying: FileSystem, failures: Int)
      extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
    private val remaining =
      new java.util.concurrent.atomic.AtomicInteger(failures)
    override def open(f: Path, bufferSize: Int)
        : org.apache.hadoop.fs.FSDataInputStream = {
      if (remaining.getAndDecrement() > 0)
        throw new java.io.IOException("injected transient read failure")
      super.open(f, bufferSize)
    }
  }

  test("acquire tolerates transient read-back failures (retries)") {
    val claim = tmpClaim()
    val flaky = new FlakyReadFs(fs, failures = 2)
    val uuid = FsClaim.acquire(flaky, claim, "t")
    assert(read(claim).startsWith(uuid + "\t"),
      "two transient read failures must not abort a won acquire")
    FsClaim.release(fs, claim, uuid)
  }

  test("acquire on persistent read failure removes its own claim " +
      "(no ownerless orphan blocking the index for a TTL)") {
    val claim = tmpClaim()
    val dead = new FlakyReadFs(fs, failures = Int.MaxValue)
    val e = intercept[IllegalStateException] {
      FsClaim.acquire(dead, claim, "t")
    }
    assert(e.getMessage.contains("unreadable immediately after acquire"))
    assert(!fs.exists(claim),
      "an unverifiable just-created claim must be best-effort deleted — " +
        "nobody holds its uuid, nothing could ever release it")
  }

  test("release tolerates transient read failures; persistent read " +
      "failure still deletes (the claim is the releaser's own)") {
    val claim = tmpClaim()
    val uuid = FsClaim.acquire(fs, claim, "t")
    FsClaim.release(new FlakyReadFs(fs, failures = 2), claim, uuid)
    assert(!fs.exists(claim), "transient read failures must not skip release")
    val uuid2 = FsClaim.acquire(fs, claim, "t")
    FsClaim.release(new FlakyReadFs(fs, failures = Int.MaxValue), claim, uuid2)
    assert(!fs.exists(claim),
      "a persistently unreadable claim at release time must be deleted, " +
        "not orphaned for the TTL")
  }

  test("heartbeat never resurrects a released (vanished) claim") {
    val claim = tmpClaim()
    val uuid = FsClaim.acquire(fs, claim, "t")
    val hb = FsClaim.startHeartbeat(fs, claim, ttlMs = 3000L, uuid)
    try {
      FsClaim.release(fs, claim, uuid) // released while heartbeat runs
      Thread.sleep(2500L)
      assert(!fs.exists(claim),
        "heartbeat recreated a claim after release — blocks the index a TTL")
    } finally hb.close()
    // and after close, nothing comes back either
    Thread.sleep(1200L)
    assert(!fs.exists(claim))
  }
}
