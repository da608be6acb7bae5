package graft.app

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic replace-on-write for small durable state files (pending sets,
  * dev state, export manifests). Write the full content to `<dest>.tmp`,
  * then swap: delete old dest, rename tmp over it. Every crash window
  * leaves either the old file or a COMPLETE tmp — never a truncated
  * dest — and [[readPath]] falls back to the tmp when only it survived
  * (crash between delete and rename). One shared protocol, so the
  * crash-recovery behavior cannot drift between call sites. */
object AtomicFile {

  def tmpFor(dest: Path): Path = new Path(dest.getParent, dest.getName + ".tmp")

  /** Write via `body` (receives the open tmp-file stream), then swap. */
  def replace(fs: FileSystem, dest: Path)(
      body: java.io.OutputStream => Unit): Unit = {
    val tmp = tmpFor(dest)
    val out = fs.create(tmp, true)
    try body(out) finally out.close()
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
  }

  /** The live path to read: dest if present, else a surviving complete
    * tmp (mid-swap crash), else None. */
  def readPath(fs: FileSystem, dest: Path): Option[Path] = {
    if (fs.exists(dest)) Some(dest)
    else { val t = tmpFor(dest); if (fs.exists(t)) Some(t) else None }
  }
}
