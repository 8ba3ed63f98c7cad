package graft

/** JSON emission helpers shared by the artifact-writing mains (Bench,
  * Verify, ScaleProbe): one string escaper and one decimal formatter,
  * so the hand-rolled copies cannot drift — ScaleProbe's copy had
  * already drifted by skipping escaping entirely for its sf field. */
object JsonOut {

  /** Escape backslash, quote, ALL control chars (<0x20), and every
    * surrogate — a tab or CR in builder-authored SQL (or a path) would
    * otherwise make the driver's json.load fail and silently zero a
    * round artifact. Surrogates are escaped because error messages get
    * TRUNCATED (.take(n) can split a pair) and Files.writeString throws
    * on malformed UTF-16 — after the stdout line already printed, the
    * file artifact would be left stale from a prior run. Escaping a
    * VALID pair as two \\uXXXX units is still correct JSON for the
    * same code point. */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' || (c >= '\ud800' && c <= '\udfff') => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Locale.ROOT %.3f: a comma-decimal default locale would emit
    * "0,123" and make the JSON unparseable. */
  def sec3(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  /** Commit hash of the repo the JVM runs in, read straight from
    * `.git` (no subprocess): artifacts stamp this so artifact-vs-code
    * staleness is checkable from the JSON alone — r7's scale-probe
    * artifact silently described code two commits older than HEAD.
    * "unknown" when not a git checkout (or a detached/packed layout
    * this reader doesn't handle). */
  def gitHead(repoDir: String = "."): String =
    try {
      val head = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(repoDir, ".git", "HEAD")), "UTF-8").trim
      if (head.startsWith("ref: ")) {
        val refPath = java.nio.file.Paths.get(repoDir, ".git", head.stripPrefix("ref: "))
        if (java.nio.file.Files.exists(refPath))
          new String(java.nio.file.Files.readAllBytes(refPath), "UTF-8").trim
        else {
          // packed-refs fallback: "<sha> <refname>" lines
          val packed = java.nio.file.Paths.get(repoDir, ".git", "packed-refs")
          val ref = head.stripPrefix("ref: ")
          scala.io.Source.fromFile(packed.toFile, "UTF-8").getLines()
            .collectFirst { case l if l.endsWith(" " + ref) => l.split(" ")(0) }
            .getOrElse("unknown")
        }
      } else head // detached HEAD is the sha itself
    } catch { case scala.util.control.NonFatal(_) => "unknown" }

  /** Extract the string value of `field` from a flat JSON object,
    * honoring escapes — the ONE copy shared by the HTTP surfaces
    * (JobServerHttp, SchemaRegistryHttp), which had drifted as twins.
    *
    * A candidate match counts as a KEY only when the preceding
    * non-whitespace char is `{` or `,` and the following one is `:` —
    * a bare indexOf would match a string VALUE equal to the key text
    * (`{"note":"query","other":"SELECT 99","query":"SELECT 1"}`) and
    * then extract the NEXT field's value: the server would silently
    * deploy the wrong SQL. Escaped quotes cannot fake a key position:
    * inside a JSON string every `"` is preceded by `\`, so the raw
    * `"field"` byte sequence never occurs within a value. */
  def jsonStringField(body: String, field: String): Option[String] = {
    val key = "\"" + field + "\""
    var at = body.indexOf(key)
    while (at >= 0) {
      var p = at - 1
      while (p >= 0 && body(p).isWhitespace) p -= 1
      var n = at + key.length
      while (n < body.length && body(n).isWhitespace) n += 1
      val isKey = p >= 0 && (body(p) == '{' || body(p) == ',') &&
        n < body.length && body(n) == ':'
      if (isKey) {
        var i = n + 1
        while (i < body.length && body(i).isWhitespace) i += 1
        if (i >= body.length || body(i) != '"') return None
        i += 1
        val sb = new StringBuilder
        while (i < body.length && body(i) != '"') {
          body(i) match {
            case '\\' if i + 1 < body.length =>
              body(i + 1) match {
                case 'n' => sb += '\n'; i += 2
                case 'r' => sb += '\r'; i += 2
                case 't' => sb += '\t'; i += 2
                case 'b' => sb += '\b'; i += 2
                case 'f' => sb += '\f'; i += 2
                case 'u' if i + 5 < body.length
                    && body.substring(i + 2, i + 6).forall(h => Character.digit(h, 16) >= 0) =>
                  // hex validated FIRST: \uZZZZ in a client body must be
                  // a malformed-input 4xx, not a NumberFormatException 500
                  sb += Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar; i += 6
                case c => sb += c; i += 2
              }
            case c => sb += c; i += 1
          }
        }
        return if (i >= body.length) None else Some(sb.toString)
      }
      at = body.indexOf(key, at + 1)
    }
    None
  }
}
