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

  /** Atomically (re)write `path`'s bytes via a staged sibling + rename
    * — the shared kernel for every rewritable root sidecar (version
    * markers, constraint/index-name manifests). A concurrent reader
    * sees the OLD content, the NEW content, or (on rename-no-clobber
    * stores, for an instant) NO file — never a truncated one. */
  def writeAtomic(fs: FileSystem, path: Path)(
      write: java.io.OutputStream => Unit): Unit = {
    // tmp name is UNIQUE per write: rival writers to the same marker
    // must never share a staging file, or one renames the other's tmp
    // away mid-write (Hadoop's local rename then dies inside its copy
    // fallback — found by MarkerFileRaceSpec's hammer)
    val tmp = new Path(path.getParent,
      s".${path.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try {
      try write(out) finally out.close()
      var attempts = 0
      var done =
        try fs.rename(tmp, path)
        catch { case _: java.io.FileNotFoundException => false }
      while (!done && attempts < 3) {
        // rename-no-clobber store: expose an absent (never partial)
        // marker for the instant between delete and rename; a rival
        // landing inside that window makes the rename fail again —
        // retry, and if the rival keeps winning simply yield (markers
        // are advisory and last-writer-wins; the loser's value is
        // superseded either way, and every reader tolerates staleness)
        fs.delete(path, false)
        done =
          try fs.rename(tmp, path)
          catch { case _: java.io.FileNotFoundException => false }
        attempts += 1
      }
    } finally fs.delete(tmp, false)
  }

  /** Atomically (re)write `path` to hold the decimal text of `v`. */
  def writeLong(fs: FileSystem, path: Path, v: Long): Unit =
    writeAtomic(fs, path)(_.write(
      v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** The marker's value, or None when the file is absent, empty, or
    * not a number (a crashed writer's torn state).
    *
    * exists→open is deliberately NOT treated as atomic: a rival
    * `writeLong` on a rename-no-clobber store deletes the marker for an
    * instant before renaming the tmp in, so a reader can pass `exists`
    * and still find the file gone at `open`. That window is exactly the
    * "briefly ABSENT" state the write path documents — surface it as
    * None (callers derive from the log) rather than crashing the query.
    * Likewise a ChecksumFileSystem pairs the data file and its `.crc`
    * sidecar non-atomically across a rival's rename (new data under the
    * old checksum for an instant) and a mid-swap read can hit EOF —
    * both are transient torn-marker states, not corruption.
    */
  /** The marker's trimmed text, or None when absent/empty/torn — the
    * string twin of [[readLong]], same transient-state tolerances
    * (used for identity markers like the vector-index `_stageid`). */
  def readString(fs: FileSystem, path: Path): Option[String] = {
    val text =
      try {
        if (!fs.exists(path)) return None
        val in = fs.open(path)
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      } catch {
        case _: java.io.FileNotFoundException => return None
        case _: org.apache.hadoop.fs.ChecksumException => return None
        case _: java.io.EOFException => return None
      }
    if (text.isEmpty) None else Some(text)
  }

  /** Atomically (re)write `path` to hold `text`. */
  def writeString(fs: FileSystem, path: Path, text: String): Unit =
    writeAtomic(fs, path)(_.write(
      text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  def readLong(fs: FileSystem, path: Path): Option[Long] =
    readString(fs, path).flatMap(t =>
      try Some(t.toLong) catch { case _: NumberFormatException => None })
}
