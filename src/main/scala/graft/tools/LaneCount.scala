package graft.tools

/** Snapshot-checklist helper: prints the authoritative registry lane count
  * so README/SURVEY headline numbers can be re-checked after the last lane
  * lands (the r10/r11 verdicts both flagged stale counts).
  */
object LaneCount {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size}")
    println(s"oracles=${o.size}")
    val qo = (q -- o).toList.sorted
    val oq = (o -- q).toList.sorted
    if (qo.nonEmpty) println(s"queries-without-oracle=${qo.mkString(",")}")
    if (oq.nonEmpty) println(s"oracle-without-query=${oq.mkString(",")}")
  }
}
