package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** GraftLocalFileSystem (r17 optimization): RawLocalFileSystem minus
  * client-side permission enforcement. Without libhadoop, setPermission
  * fork/execs chmod per file whenever group != other bits — and the
  * state-store provider pays that INSIDE StateStore's JVM-global
  * provider lock. The subclass must keep every data-path operation of
  * the checkpoint protocol intact while making setPermission inert.
  */
class GraftLocalFileSystemSpec extends AnyFunSuite {

  private def freshFs(): FileSystem = {
    val conf = new Configuration(false)
    conf.set("fs.file.impl", "graft.api.GraftLocalFileSystem")
    // bypass the JVM-wide FileSystem cache so this spec cannot be
    // poisoned by (or poison) a file:// instance another spec created
    conf.setBoolean("fs.file.impl.disable.cache", true)
    FileSystem.get(new java.net.URI("file:///"), conf)
  }

  test("fs.file.impl resolves file:// to GraftLocalFileSystem") {
    val fs = freshFs()
    try assert(fs.getClass === classOf[graft.api.GraftLocalFileSystem])
    finally fs.close()
  }

  test("checkpoint-protocol ops survive with permission args, and content is intact") {
    val fs = freshFs()
    val dir = java.nio.file.Files.createTempDirectory("graftfs").toFile
    try {
      // mkdirs with group != other bits — the exact shape that forked
      // chmod on RawLocalFileSystem (Spark's checkpoint dirs use 0770)
      def oct(s: String) = FsPermission.createImmutable(Integer.parseInt(s, 8).toShort)
      val sub = new Path(s"${dir.getAbsolutePath}/state/0/1")
      assert(fs.mkdirs(sub, oct("770")))
      assert(fs.getFileStatus(sub).isDirectory)

      // create-temp-then-rename (FileSystemBasedCheckpointFileManager's
      // protocol) with an explicit permission on create
      val tmp = new Path(s"${dir.getAbsolutePath}/state/0/1/.1.delta.tmp")
      val out = fs.create(tmp, oct("660"), false, 4096,
        fs.getDefaultReplication(tmp), fs.getDefaultBlockSize(tmp), null)
      out.write("delta-payload".getBytes("UTF-8"))
      out.close()
      val fin = new Path(s"${dir.getAbsolutePath}/state/0/1/1.delta")
      assert(fs.rename(tmp, fin))

      // setPermission is a NO-OP: requesting 000 must not lock the
      // owning process out (enforcement is the thing being removed)
      fs.setPermission(fin, oct("000"))
      val in = fs.open(fin)
      val buf = new Array[Byte](64)
      val n = in.read(buf)
      in.close()
      assert(new String(buf, 0, n, "UTF-8") === "delta-payload")

      assert(fs.delete(fin, false))
      assert(!fs.exists(fin))
    } finally {
      fs.close()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
