package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/**
 * The marker protocol's concurrency contract: `readLong` NEVER throws
 * against a rival `writeLong`, whatever instant it lands in —
 * including the "briefly absent" delete→rename window of the
 * rename-no-clobber fallback (MarkerFile.writeLong), where a reader
 * can pass `exists` and still find the file gone at `open`. That
 * exact window crashed a `_tver` read in round 17's concurrent-writer
 * manifest test; this spec pins the fix deterministically (a
 * filesystem whose `open` throws after `exists` said yes) and
 * stochastically (writer/reader hammer on the real local FS).
 */
class MarkerFileRaceSpec extends AnyFunSuite {

  private def tmpDir(): java.io.File = {
    val d = java.io.File.createTempFile("markerrace", "")
    d.delete(); d.mkdirs()
    d.deleteOnExit()
    d
  }

  test("readLong degrades to None when the file vanishes between " +
      "exists and open (the writeLong delete+rename window)") {
    val dir = tmpDir()
    val real = FileSystem.getLocal(new Configuration())
    val p = new Path(dir.getAbsolutePath, "_tver")
    MarkerFile.writeLong(real, p, 7L)
    // a view whose open ALWAYS reports the file just deleted — the
    // reader observed exists=true an instant before the rival's
    // fallback delete landed
    val racing = new org.apache.hadoop.fs.FilterFileSystem(real) {
      override def open(f: Path, bufferSize: Int)
          : org.apache.hadoop.fs.FSDataInputStream =
        throw new java.io.FileNotFoundException(s"racing delete: $f")
    }
    assert(MarkerFile.readLong(racing, p) === None)
    // and the real view still reads the committed value
    assert(MarkerFile.readLong(real, p) === Some(7L))
  }

  test("concurrent writeLong/readLong hammer: readers only ever see " +
      "a committed value or None, never an exception") {
    val dir = tmpDir()
    val fs = new Path(dir.getAbsolutePath)
      .getFileSystem(new Configuration()) // the production acquisition
    val p = new Path(dir.getAbsolutePath, "_tver")
    MarkerFile.writeLong(fs, p, 0L)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writers = (0 until 2).map { t =>
      new Thread(() => {
        try {
          var i = 0L
          while (!stop.get()) {
            MarkerFile.writeLong(fs, p, t * 1000000L + i)
            i += 1
          }
        } catch { case e: Throwable => errs.add(e); () }
      })
    }
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val readers = (0 until 2).map { _ =>
      new Thread(() => {
        try {
          while (!stop.get()) {
            MarkerFile.readLong(fs, p).foreach(v =>
              assert(v >= 0L, s"torn read: $v"))
            reads.incrementAndGet()
          }
        } catch { case e: Throwable => errs.add(e); () }
      })
    }
    (writers ++ readers).foreach(_.start())
    Thread.sleep(1500)
    stop.set(true)
    (writers ++ readers).foreach(_.join(30000))
    if (!errs.isEmpty) throw errs.peek()
    assert(reads.get() > 0)
  }
}
