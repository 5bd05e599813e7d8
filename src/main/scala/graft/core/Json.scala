package graft.core

/** Minimal JSON string escaping shared by the stores' metrics writers
  * (MatchStore / DeviationStore previously had diverging private copies —
  * the weaker one emitted invalid JSON for lineage strings with newlines). */
object Json {
  def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '\\'           => sb.append("\\\\")
      case '"'            => sb.append("\\\"")
      case '\n'           => sb.append("\\n")
      case '\r'           => sb.append("\\r")
      case '\t'           => sb.append("\\t")
      case c if c < 0x20  => sb.append(f"\\u${c.toInt}%04x")
      case c              => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}
