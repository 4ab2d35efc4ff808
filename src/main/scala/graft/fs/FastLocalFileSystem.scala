package graft.fs

import java.nio.file.attribute.PosixFilePermission
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local-mode `fs.file.impl` that removes Hadoop's per-file process forks.
  *
  * Without libhadoop (no native IO in this container — and in most
  * plain-JVM local setups), `RawLocalFileSystem.setPermission` falls back
  * to `Shell.execCommand("chmod", ...)`: a fork+exec PER FILE CREATE and
  * PER MKDIR. Stack-sampling a 32-core crawl bench showed this as the
  * single hottest executor frame (196/990 samples through
  * `Shell.runCommand`, every one rooted at `setPermission`), with
  * ~470 forks/second measured via /proc/stat — a serialized, fixed cost
  * that stops scaling with cores and collapses under external memory
  * pressure (fork touches contended pages). On a real cluster the
  * committer talks to HDFS/S3 — no shell forks — so local mode with this
  * shim is MORE faithful to cluster behavior, not less.
  *
  * Two changes vs the default checksummed `LocalFileSystem`:
  *  - extends RawLocalFileSystem: no `.crc` sibling per file (halves
  *    creates);
  *  - `setPermission` uses java.nio `Files.setPosixFilePermissions`
  *    in-process instead of forking `chmod` (falls back to the shell
  *    path on filesystems without POSIX view).
  *
  * Wire with `spark.hadoop.fs.file.impl=graft.fs.FastLocalFileSystem`.
  */
class FastLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    import PosixFilePermission._
    // FsPermission.toShort: (owner rwx)<<6 | (group rwx)<<3 | (other rwx),
    // so bit i of the low 9 maps to byBit(i)
    val byBit = Array(
      OTHERS_EXECUTE, OTHERS_WRITE, OTHERS_READ,
      GROUP_EXECUTE, GROUP_WRITE, GROUP_READ,
      OWNER_EXECUTE, OWNER_WRITE, OWNER_READ)
    val bits = permission.toShort
    val set = new java.util.HashSet[PosixFilePermission]()
    var i = 0
    while (i < 9) {
      if (((bits >> i) & 1) == 1) set.add(byBit(i))
      i += 1
    }
    try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
    catch {
      case _: UnsupportedOperationException => super.setPermission(p, permission)
      case _: java.io.IOException => super.setPermission(p, permission)
    }
  }
}
