package graft

/** JSON string escaping shared by the dev mains (Verify's oracle dump,
  * Bench's results line). Escapes backslash, quote, and ALL control
  * chars (<0x20) — a tab or CR in builder-authored SQL would otherwise
  * break the driver's json.load and silently zero a round's artifacts.
  */
private[graft] object JsonText {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
