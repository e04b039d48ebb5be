package graft.sql

import java.net.URI

import org.apache.hadoop.fs.Path

/**
 * A `fault:` filesystem over the local disk whose `rename` can be made
 * to FAIL (return false) for chosen destination names — the
 * object-store-semantics probe: stores without atomic rename must
 * degrade the rename-promoted artifacts (fold sidecars, the checkpoint
 * manifest, marker files) to correct-but-slower behavior, never to a
 * corrupted log. Registered per test via
 * `hadoopConfiguration.set("fs.fault.impl", ...)`; the failure
 * predicate is a process-wide toggle so the spec can flip it around
 * specific statements.
 */
class FaultInjectingFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {

  override def getUri: URI = URI.create("fault:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (FaultInjectingFileSystem.failRenameTo.get()(dst.getName)) {
      FaultInjectingFileSystem.failed.incrementAndGet()
      false
    } else super.rename(src, dst)
  }
}

object FaultInjectingFileSystem {
  /** Destination-name predicate: true = that rename returns false. */
  val failRenameTo =
    new java.util.concurrent.atomic.AtomicReference[String => Boolean](
      (_: String) => false)
  /** How many renames were refused (spec sanity: the fault actually
    * fired). */
  val failed = new java.util.concurrent.atomic.AtomicInteger(0)

  def reset(): Unit = {
    failRenameTo.set((_: String) => false)
    failed.set(0)
  }
}
