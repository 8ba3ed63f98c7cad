package graft

/** JSON emission helpers shared by the artifact-writing mains (Bench,
  * Verify, ScaleProbe): one string escaper and one decimal formatter,
  * so the hand-rolled copies cannot drift — ScaleProbe's copy had
  * already drifted by skipping escaping entirely for its sf field. */
object JsonOut {

  /** Escape backslash, quote, and ALL control chars (<0x20) — a tab or
    * CR in builder-authored SQL (or a path) would otherwise make the
    * driver's json.load fail and silently zero a round artifact. */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Locale.ROOT %.3f: a comma-decimal default locale would emit
    * "0,123" and make the JSON unparseable. */
  def sec3(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
}
