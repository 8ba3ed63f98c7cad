package graft

/** The ONE best-effort recursive delete (r11 review: three private
  * copies had drifted — only one closed its directory-walk stream, so
  * the others leaked an fd per call in a long-lived server session).
  * Verify.scala keeps its own FAIL-LOUD variant deliberately: there a
  * silently-failed delete would green a broken query against stale
  * parquet, the opposite contract from this cleanup helper.
  */
private[graft] object Fs {
  def deleteRecursively(path: String): Unit = {
    import scala.util.control.NonFatal
    try {
      // walk's stream holds open directory handles — close it, or every
      // call leaks fds until GC
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try stream.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally stream.close()
    } catch { case NonFatal(_) => } // best-effort; never fail the caller over cleanup
  }

  def deleteRecursively(f: java.io.File): Unit = deleteRecursively(f.getPath)
}
