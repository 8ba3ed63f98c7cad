package graft.sources

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaCompatibility}

/** Minimal schema-registry analog (reference: src/velostream/schema/ —
  * subjects, versions, compatibility-gated registration): schemas are
  * versioned per subject and a new version must be able to READ data
  * written with the previous one (BACKWARD compatibility, the standard
  * registry default) before it registers.
  *
  * Storage is a directory of `<subject>/<version>.avsc` files — a
  * driver-side metadata store (a registry holds schemas, not data);
  * any shared filesystem a cluster's driver can reach works. All
  * compatibility logic is Avro's own `SchemaCompatibility` resolver,
  * the same rules `Serde.decodeAvro`'s reader-schema evolution applies
  * at decode time.
  */
final class SchemaRegistry(root: Path) {
  Files.createDirectories(root)

  private[sources] def root_forTest: Path = root

  // test seam for the cross-process CREATE_NEW race: runs between the
  // version listing/compat gate and the version-file write, where a
  // rival process can commit a version this attempt never validated
  private[sources] var onBeforeWrite_forTest: () => Unit = () => ()

  private def subjectDir(subject: String): Path = {
    require(SchemaRegistry.isValidSubject(subject), s"invalid subject name: $subject")
    root.resolve(subject)
  }

  def versions(subject: String): Vector[Int] = {
    val d = subjectDir(subject)
    if (!Files.exists(d)) Vector.empty
    else {
      // Files.list holds an open directory handle until closed — and
      // versions() runs on every register/latest, so an unclosed stream
      // leaks a file descriptor per call. Only `<int>.avsc` names count;
      // stray files (editor backups, .DS_Store) must not throw.
      val stream = Files.list(d)
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        // ≤9 digits: a longer run overflows Int in toInt and THROWS —
        // exactly the stray-file breakage this filter exists to prevent.
        // CANONICAL form only (no zero-padding): '01.avsc' would list as
        // version 1 that get() — which reconstructs '1.avsc' — cannot
        // read back, making latest()/register crash on a version this
        // same listing reported to exist (r17 review). A zero-padded
        // file is stray noise, like any other non-canonical name.
        .filter(_.matches("""(0|[1-9]\d{0,8})\.avsc"""))
        .map(_.stripSuffix(".avsc").toInt).toVector.sorted
      finally stream.close()
    }
  }

  def subjects(): Vector[String] = {
    if (!Files.exists(root)) Vector.empty
    else {
      val stream = Files.list(root)
      try stream.iterator().asScala
        .filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .filter(_.matches("[A-Za-z0-9._-]+")).toVector.sorted
      finally stream.close()
    }
  }

  def get(subject: String, version: Int): Option[String] = {
    val f = subjectDir(subject).resolve(s"$version.avsc")
    if (Files.exists(f)) Some(Files.readString(f)) else None
  }

  def latest(subject: String): Option[(Int, String)] =
    versions(subject).lastOption.map(v => v -> get(subject, v).get)

  private def incompatList(reader: Schema, writer: Schema): Vector[String] =
    SchemaCompatibility.checkReaderWriterCompatibility(reader, writer).getResult
      .getIncompatibilities.asScala.toVector.map(i =>
        s"${i.getType}: ${i.getMessage} at ${i.getLocation}")

  /** Incompatibility messages preventing `readerJson` from reading data
    * written with `writerJson`; empty = compatible. */
  def incompatibilities(readerJson: String, writerJson: String): Vector[String] =
    incompatList(new Schema.Parser().parse(readerJson), new Schema.Parser().parse(writerJson))

  /** Register a schema under `subject`. Returns the version. Identical
    * to the latest schema → returns the existing version (idempotent).
    * A BACKWARD-incompatible change (new schema cannot read the latest
    * version's data) is rejected, as a registry's default gate is. */
  def register(subject: String, schemaJson: String): Int = synchronized {
    val parsed = new Schema.Parser().parse(schemaJson) // reject malformed first
    registerAttempt(subject, parsed)
  }

  /** One registration attempt: list versions, run the identity/compat
    * gates against the CURRENT latest, and CREATE_NEW-write the next
    * version file. The registry doc promises any shared filesystem
    * works, and `synchronized` only serializes THIS driver: version
    * allocation (list, +1) can race another process, and truncate-write
    * would silently clobber its committed file, so the write fails on
    * collision — and the retry must START OVER, because the version the
    * rival just committed is a new latest the identity and
    * backward-compatibility checks never saw (bumping the number and
    * rewriting would admit a schema incompatible with it — the exact
    * cross-process race CREATE_NEW exists to close). */
  @annotation.tailrec
  private def registerAttempt(subject: String, parsed: Schema): Int = {
    // one directory listing + one parse of the latest schema per attempt
    // (latest() would re-list and the equality/compat checks re-parse)
    val vs = versions(subject)
    val prevParsed = vs.lastOption.map(v => v -> new Schema.Parser().parse(get(subject, v).get))
    // idempotent re-register of ANY live version, not just the latest:
    // the standard registry looks the schema up under the subject first
    // and returns its existing version — comparing only against latest
    // would push a redeployed OLDER (but legally evolved-away-from)
    // schema into the compat gate and 409 a schema that literally IS
    // version k of the subject.
    val existing = prevParsed.collect { case (v, prev) if prev == parsed => v }
      .orElse(vs.dropRight(1).find { v =>
        try new Schema.Parser().parse(get(subject, v).get) == parsed
        catch { case scala.util.control.NonFatal(_) => false }
      })
    existing match {
      case Some(v) => v
      case None =>
        prevParsed.foreach { case (v, prev) =>
          val problems = incompatList(parsed, prev)
          if (problems.nonEmpty)
            throw new IllegalArgumentException(
              s"schema for $subject is not backward-compatible with version $v: ${problems.mkString("; ")}")
        }
        val d = subjectDir(subject)
        Files.createDirectories(d)
        val next = vs.lastOption.getOrElse(0) + 1
        // ATOMIC publication with CREATE_NEW race semantics: write the
        // full content to a temp name, then HARD-LINK it into place —
        // link(2) is atomic (a reader can never observe an empty or
        // partial version file, which a direct CREATE_NEW+write exposes
        // between the create and the write) and fails with
        // FileAlreadyExistsException when a rival committed the same
        // version first (ATOMIC_MOVE would silently REPLACE the
        // rival's file and lose the race detection).
        val written =
          try {
            onBeforeWrite_forTest()
            val tmp = Files.createTempFile(d, s".$next", ".tmp")
            try {
              Files.writeString(tmp, parsed.toString(true))
              try { Files.createLink(d.resolve(s"$next.avsc"), tmp); true }
              catch {
                case _: java.nio.file.FileAlreadyExistsException => false
                // filesystems without hard links (FAT/exFAT, some FUSE
                // object-store and SMB mounts — exactly the shared
                // mounts the class doc invites): fall back to an
                // exclusive CREATE_NEW write. Race detection survives
                // (CREATE_NEW throws FileAlreadyExists when a rival
                // committed first); the cost is a microsecond window
                // where a reader can observe a partial version file —
                // accepted only on link-less filesystems, where no
                // atomic-publish-with-race-detection primitive exists
                // (ATOMIC_MOVE would silently REPLACE a rival's win).
                case _: UnsupportedOperationException
                    | _: java.nio.file.FileSystemException =>
                  try {
                    Files.write(d.resolve(s"$next.avsc"), Files.readAllBytes(tmp),
                      java.nio.file.StandardOpenOption.CREATE_NEW,
                      java.nio.file.StandardOpenOption.WRITE)
                    true
                  } catch { case _: java.nio.file.FileAlreadyExistsException => false }
              }
            } finally { Files.deleteIfExists(tmp); () }
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            case e: Throwable =>
              // a failed FIRST write must not leave an empty subject
              // directory behind: subjects() would list it while
              // versions() 404s — permanently inconsistent state.
              // deleteIfExists only removes an EMPTY dir (a rival's
              // committed version throws DirectoryNotEmptyException,
              // swallowed — the dir is then legitimately occupied).
              if (vs.isEmpty)
                try { Files.deleteIfExists(d); () }
                catch { case scala.util.control.NonFatal(_) => }
              throw e
          }
        if (written) next else registerAttempt(subject, parsed)
    }
  }
}

object SchemaRegistry {
  /** The ONE subject-name rule, shared by the registry's path resolution
    * and the HTTP layer's route guards. "." and ".." satisfy the
    * character class but resolve OUTSIDE the registry root — a path
    * traversal reachable straight from the HTTP server's un-normalized
    * URI segment, so they are rejected by name. */
  private[sources] def isValidSubject(subject: String): Boolean =
    subject.matches("[A-Za-z0-9._-]+") && subject != "." && subject != ".."
}
