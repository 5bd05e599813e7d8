package graft.tools
object ListGate {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"QUERIES ${q.size} ORACLED ${(q & o).size}")
    println("ROWS_ONLY: " + (q -- o).toSeq.sorted.mkString(", "))
    println("ORPHAN_ORACLE: " + (o -- q).toSeq.sorted.mkString(", "))
  }
}
