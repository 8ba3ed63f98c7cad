package graft

import graft.sql.VeloSqlParser

/** One-off compatibility sweep: every SQL statement extracted from the
  * reference's own test suite (r-string literals in the .rs test
  * files), fed through VeloSqlParser. Prints failures for triage. */
object TestSweep {
  private val SEP1 = 1.toChar
  private val SEP2 = 2.toChar
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/ref_test_sqls.txt")
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    var dropped = 0
    val entries = raw.split(SEP2).filter(_.nonEmpty).flatMap { e =>
      // limit -1: split drops trailing empty fields by default, so a
      // well-formed entry whose SQL is EMPTY ("file") would land in
      // the malformed bucket and understate real coverage
      e.split(SEP1.toString, -1) match {
        case Array(f, s) => Some((f, s))
        case _ => dropped += 1; None // malformed entry: COUNT it — a silent
                                     // drop would read as full coverage
      }
    }
    if (dropped > 0) System.err.println(s"[sweep] WARNING: $dropped malformed entries dropped")
    var ok = 0
    val fails = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    entries.foreach { case (f, s) =>
      try { VeloSqlParser.parse(s); ok += 1 }
      catch { case e: Throwable =>
        fails += ((f, s.linesIterator.mkString(" ").replaceAll("\\s+", " ").take(160),
          Option(e.getMessage).getOrElse("?").take(110)))
      }
    }
    println(s"SWEEP ok=$ok fail=${fails.length} total=${entries.length}")
    fails.foreach { case (f, s, m) => println(s"FAIL [$f] $s\n  -> $m") }
  }
}
