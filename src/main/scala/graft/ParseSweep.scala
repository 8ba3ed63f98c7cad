package graft

import java.nio.file.{Files, Paths}

/** Dev tool: parse every SQL statement harvested from the reference's
  * docs (JSON list of [file, sql] pairs) through VeloSqlParser and
  * report the failures — a dialect-coverage census. */
object ParseSweep {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/ref_sql_blocks.json")
    val raw = Files.readString(Paths.get(path))
    // minimal JSON [[file, sql], ...] parse (strings with escapes)
    val items = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var i = 0
    // bounds-checked cursor: a truncated harvest file (partial write)
    // must die with the offending offset, not an opaque
    // StringIndexOutOfBoundsException from past-the-end indexing
    def cur: Char = {
      require(i < raw.length, s"unexpected end of input at offset $i (truncated file?)")
      raw(i)
    }
    def skipWs(): Unit = while (i < raw.length && raw(i).isWhitespace) i += 1
    def parseString(): String = {
      val sb = new StringBuilder
      require(cur == '"', s"expected '\"' at offset $i"); i += 1
      while (cur != '"') {
        if (raw(i) == '\\') {
          i += 1
          cur match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case '"' => sb.append('"')
            case 'b' => sb.append('\b'); case 'f' => sb.append('\f')
            case '\\' => sb.append('\\'); case '/' => sb.append('/')
            case 'u' =>
              require(i + 5 <= raw.length, s"truncated \\u escape at offset $i")
              sb.append(Integer.parseInt(raw.substring(i + 1, i + 5), 16).toChar); i += 4
            case c => sb.append(c)
          }
          i += 1
        } else { sb.append(raw(i)); i += 1 }
      }
      i += 1
      sb.toString
    }
    skipWs(); require(cur == '[', s"expected '[' at offset $i"); i += 1
    var done = false
    while (!done) {
      skipWs()
      if (cur == ']') done = true
      else {
        require(cur == '[', s"expected '[' at offset $i"); i += 1; skipWs()
        val f = parseString(); skipWs(); require(cur == ',', s"expected ',' at offset $i"); i += 1; skipWs()
        val s = parseString(); skipWs(); require(cur == ']', s"expected ']' at offset $i"); i += 1; skipWs()
        if (cur == ',') i += 1
        items += ((f, s))
      }
    }
    var ok = 0
    val fails = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    items.foreach { case (f, s) =>
      try { graft.sql.VeloSqlParser.parse(s); ok += 1 }
      catch { case e: Throwable =>
        // StackOverflowError / internal NPEs carry a null message — the
        // failure handler must record them, not crash the whole census
        fails += ((f, Option(e.getMessage).getOrElse(e.getClass.getName).take(90), s.take(140)))
      }
    }
    println(s"[sweep] parsed $ok/${items.length}")
    fails.groupBy(_._2.take(40)).toSeq.sortBy(-_._2.size).foreach { case (msg, fs) =>
      println(s"\n== ${fs.size} × $msg")
      fs.take(3).foreach { case (f, m, s) => println(s"   [$f] $m\n     ${s.replace('\n', ' ')}") }
    }
  }
}
