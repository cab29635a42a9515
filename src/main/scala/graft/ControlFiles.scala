package graft

import org.apache.hadoop.fs.{FileSystem, Options, Path}

/** Crash-safety-critical control-file I/O, shared by every protocol in
  * the repo (the landing zone's markers/checkpoints, the segment logs'
  * compaction horizons, the classifier artifact): exactly one copy of
  * each idiom, so the next protocol fix cannot be forgotten in a
  * drifted duplicate.
  */
object ControlFiles {

  /** Read a small control file fully — FSDataInputStream.read may
    * return fewer bytes than available on non-local filesystems, so a
    * single read risks truncating a horizon/version number.
    */
  def readFully(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }

  /** Publish `content` at `dst` atomically: temp write + OVERWRITE
    * rename (FileContext — the primitive Structured Streaming's
    * checkpoint manager relies on). Never delete-then-rename: a crash
    * in that window leaves no file at all, and a missing marker/
    * checkpoint makes fully-committed data read as missing or empty.
    */
  def atomicWrite(f: FileSystem, dst: Path, content: String): Unit = {
    val tmp = new Path(dst.getParent, "." + dst.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    // The tmp is created through `f` (possibly a ChecksumFileSystem,
    // which writes a `.<name>.crc` sidecar) but renamed through raw
    // FileContext, which moves only the data file — so sidecars must
    // be managed by hand. Any stale `.<dst>.crc` left by a
    // pre-FileContext writer describes the OLD content and makes a
    // checksummed open of the renamed file throw ChecksumException
    // against fully-valid data; it is deleted BEFORE the rename (old
    // content with no sidecar always reads fine, so a crash between
    // the delete and the rename is safe — deleting it after would
    // leave a crash window that recreates the very mismatch). The
    // tmp's sidecar is orphaned by the rename and reaped last (pure
    // hygiene; a crash before it merely leaves the orphan for the
    // next write).
    val raw = f match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    def dropSidecar(p: Path): Unit = {
      val crc = new Path(p.getParent, "." + p.getName + ".crc")
      if (raw.exists(crc)) raw.delete(crc, false)
    }
    dropSidecar(dst)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.getUri, f.getConf)
    fc.rename(f.makeQualified(tmp), f.makeQualified(dst),
      Options.Rename.OVERWRITE)
    dropSidecar(tmp)
  }
}
