package graft

/** Shared pieces of the driver's stdout/file protocols.
  *
  * Bench (two-line stdout) and Verify (oracle_sql.json) both emit
  * hand-rendered JSON the driver parses with a strict json.load; the
  * escape rule lives HERE exactly once so a fix (e.g. a newly-observed
  * control-char class in exception text or builder-authored SQL) cannot
  * land in one protocol and silently miss the other.
  */
private[graft] object Protocol {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20),
    * the named escapes for \n \r \t and \\u-hex for the rest. */
  def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
