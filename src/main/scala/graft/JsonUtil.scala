package graft

/** Shared JSON string escaping for the hand-built JSON the harness
  * mains emit (Verify's oracle_sql.json, Bench's metrics line) — one
  * implementation so an escaping fix can never land in only one of
  * them. Escapes backslash, quote, and ALL control chars (<0x20). */
object JsonUtil {
  def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Quoted JSON string. */
  def q(s: String): String = "\"" + esc(s) + "\""
}
