package graft.util

/** Small shared helpers (single source for behaviors that were at risk of
  * drifting between copies: JSON escaping feeds the driver's json.load, and
  * recursive deletion guards verify/state hygiene). */
object Json {
  /** JSON string literal: escapes backslash, quote, and ALL control chars —
    * a stray tab/CR would break the driver's JSON parse. */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
