package graft

/** One JSON string-escape for every artifact the driver parses
  * (Verify's oracle_sql.json/_failed.json, Bench's metric line and
  * bench_full.json). Escapes backslash, quote, and ALL control chars
  * (< 0x20) — a tab or CR in builder-authored SQL or an exception
  * message would otherwise break the driver's json.load and silently
  * zero a round's artifact. Shared so a fix here reaches every
  * emitter at once. */
private[graft] object JsonUtil {
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
