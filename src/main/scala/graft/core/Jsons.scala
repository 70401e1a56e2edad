package graft.core

/** Minimal JSON string escaping, shared by every hand-authored JSON
  * emitter in the repo (the Verify/Bench artifact writers, the alert
  * spool): backslash, quote, and ALL control characters below 0x20 —
  * a tab or CR in builder-authored text would otherwise break the
  * driver's `json.load` downstream. One definition so an escaping fix
  * lands everywhere at once. */
object Jsons {

  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `escape` wrapped in quotes — a complete JSON string literal. */
  def str(s: String): String = "\"" + escape(s) + "\""
}
