package graft

import org.apache.spark.util.SizeEstimator
import org.scalatest.funsuite.AnyFunSuite

import graft.partition.{HashIndexedPartition, RadixIndexedPartition}

/**
 * BASELINE.md's "index memory per entry vs `immutable.HashMap`" row.
 * The hash layout IS a persistent HAMT (keys stored directly), so its
 * footprint must track `immutable.HashMap` closely; the radix layout
 * additionally materializes serialized key bytes inside trie nodes and
 * buys pruned range scans for that overhead.
 */
class MemoryFootprintSpec extends AnyFunSuite {

  private val n = 100000
  private val entries = (1L to n.toLong).map(k => (k, k * 2.0))

  test("hash partition per-entry footprint ~= immutable.HashMap") {
    val part = HashIndexedPartition(entries.iterator)
    val map = scala.collection.immutable.HashMap.from(entries)
    val perPart = SizeEstimator.estimate(part).toDouble / n
    val perMap = SizeEstimator.estimate(map).toDouble / n
    info(f"hash partition: $perPart%.1f B/entry vs HashMap $perMap%.1f B/entry")
    assert(perPart <= perMap * 1.2,
      f"hash layout costs $perPart%.1f B/entry vs HashMap's $perMap%.1f")
  }

  test("radix partition overhead over HashMap is bounded (pays for range scans)") {
    val part = RadixIndexedPartition(entries.iterator)
    val map = scala.collection.immutable.HashMap.from(entries)
    val perPart = SizeEstimator.estimate(part).toDouble / n
    val perMap = SizeEstimator.estimate(map).toDouble / n
    info(f"radix partition: $perPart%.1f B/entry vs HashMap $perMap%.1f B/entry")
    assert(perPart <= perMap * 4.0,
      f"radix layout costs $perPart%.1f B/entry vs HashMap's $perMap%.1f")
  }
}
