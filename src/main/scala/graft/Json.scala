package graft

/** Minimal JSON string escaping shared by the driver-facing mains
  * (Verify's oracle_sql.json, Bench's one-line result). Escapes
  * backslash, quote, and ALL control chars (<0x20) — Spark exception
  * messages routinely contain newlines (AnalysisException), and an
  * unescaped one would make the single-line JSON unparseable exactly
  * when failure detail matters most.
  */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
