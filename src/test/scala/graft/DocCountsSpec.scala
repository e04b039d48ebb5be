package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * MECHANICAL doc-count gate (rounds 10-13 all shipped stale headline
 * numbers because the re-check was a human step): `sbt test` now FAILS
 * when the registry-lane counts written in README.md / SURVEY.md
 * disagree with the authoritative `SparkEntry.queries.size`, or when
 * any lane lacks its oracle. Update the docs in the same commit that
 * adds a lane, or this gate stops the build.
 */
class DocCountsSpec extends AnyFunSuite {

  private def read(name: String): String = {
    val p = java.nio.file.Paths.get(name)
    if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p)
    else java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/repo", name))
  }

  test("every registry lane has an oracle (and vice versa)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("README and SURVEY lane counts match the registry") {
    val n = SparkEntry.queries.size
    val re = "(\\d+) registry\\s+queries".r // counts wrap across lines
    Seq("README.md", "SURVEY.md").foreach { doc =>
      val claims = re.findAllMatchIn(read(doc)).map(_.group(1).toInt).toSeq
      assert(claims.nonEmpty, s"$doc no longer states a registry-lane count")
      claims.foreach(c => assert(c === n,
        s"$doc claims $c registry queries; SparkEntry.queries.size is $n — " +
          "update the doc in the same commit that changed the registry"))
    }
  }
}
