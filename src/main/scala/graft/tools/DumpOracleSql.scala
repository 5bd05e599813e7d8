package graft.tools

import java.nio.file.{Files, Paths}

/** Dump SparkEntry.oracleSql as JSON without running any query (for ad-hoc
  * DuckDB compares of new oracle entries — no Spark session needed). */
object DumpOracleSql {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"DUMPED ${graft.SparkEntry.oracleSql.size} oracle entries to $out")
  }
}
