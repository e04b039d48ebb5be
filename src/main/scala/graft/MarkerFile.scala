package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Crash-safe small-file commit markers (the `_tver`-style version
 * pointers the durable table / streaming-checkpoint logs advance).
 *
 * The naive in-place rewrite (`fs.create(path, overwrite = true)`)
 * truncates before it writes: a crash in between leaves an EMPTY
 * marker, and a later `"".trim.toLong` bricks the table with a
 * NumberFormatException and no recovery path. Two defenses, both
 * applied everywhere markers are used:
 *
 *  1. WRITE via a sibling temp file renamed into place. On a POSIX
 *     local filesystem the rename replaces the destination atomically;
 *     on stores whose rename will not clobber, the destination is
 *     deleted first — the marker is then briefly ABSENT (never
 *     half-written), which reads treat as "derive from the log"
 *     (see the callers' fallback walks), not as corruption.
 *  2. READ tolerantly: absent, empty, or unparsable content all
 *     surface as None, so callers fall back to deriving the value
 *     from the durable log itself (e.g. the max delta dir whose
 *     commit meta exists) instead of throwing.
 */
private[graft] object MarkerFile {

  /** Atomically (re)write `path` to hold the decimal text of `v`. */
  def writeLong(fs: FileSystem, path: Path, v: Long): Unit = {
    val tmp = new Path(path.getParent, s".${path.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, path)) {
      // rename-no-clobber store: expose an absent (never partial)
      // marker for the instant between delete and rename
      fs.delete(path, false)
      require(fs.rename(tmp, path), s"marker rename failed for $path")
    }
  }

  /** The marker's value, or None when the file is absent, empty, or
    * not a number (a crashed writer's torn state). */
  def readLong(fs: FileSystem, path: Path): Option[Long] = {
    if (!fs.exists(path)) return None
    val in = fs.open(path)
    val text =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
    try Some(text.toLong) catch { case _: NumberFormatException => None }
  }
}
