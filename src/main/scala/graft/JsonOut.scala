package graft

/** The ONE JSON string escaper for driver-contract output (Verify's
  * oracle_sql.json, Bench's metrics line). Backslash, quote, and ALL
  * control chars (< 0x20) — a tab or CR in builder-authored SQL, a
  * quote in a path, would otherwise make the driver's json parse fail
  * and silently zero a round's correctness or bench metrics. Shared so
  * the two call sites can never fork. */
object JsonOut {
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
