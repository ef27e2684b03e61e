package graft

/** ONE JSON string-literal escaper for every hand-rolled JSON emitter
  * (the CLI status line, Verify's oracle dump): backslash, quote, and
  * ALL control chars (<0x20) — a tab or CR in a user path or
  * builder-authored SQL must never emit malformed JSON. Two drifting
  * copies of this table would let a missed escape diverge the CLI
  * status from the oracle dump. */
private[graft] object JsonUtil {
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
