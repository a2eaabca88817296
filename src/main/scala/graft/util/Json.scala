package graft.util

/** Canonical JSON string escaper for the hand-rolled writers (manifests,
  * oracle_sql.json, benchmark JSONL). One implementation — the three
  * sinks previously carried byte-identical copies that had to be kept in
  * sync by hand. Escapes the two mandatory characters, the common
  * whitespace escapes, and ALL remaining control chars (<0x20) as \\uXXXX
  * so a tab or CR in builder-authored content can never break a
  * downstream json.load. */
object Json {
  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
