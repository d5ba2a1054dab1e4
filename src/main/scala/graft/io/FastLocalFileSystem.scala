package graft.io

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}

/** `file://` implementation for sandboxes WITHOUT the Hadoop native
  * library: identical to the stock [[LocalFileSystem]] (checksums,
  * buffering, semantics all inherited) except that `setPermission`
  * uses java.nio instead of Hadoop's fallback, which FORKS
  * `/bin/chmod` per call when libhadoop is absent. Every permissioned
  * mkdir/create in a commit pays that fork — driver stack sampling
  * showed `Shell.runCommand` under `RawLocalFileSystem.setPermission`
  * costing ~0.1–1.6s per committing query (a 24-partition write forks
  * ~50 times). Register with
  * `spark.hadoop.fs.file.impl=graft.io.FastLocalFileSystem`.
  *
  * Cluster note: this class only affects `file://` URIs — on real
  * deployments (HDFS/S3) it is inert; it exists so local-mode commit
  * latency measures the engine, not process spawning.
  */
class FastLocalFileSystem
    extends LocalFileSystem(new FastRawLocalFileSystem)

class FastRawLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    // sticky/setuid/setgid bits aren't expressible via
    // PosixFilePermission — fall back to the stock (forking) path for
    // those rare modes rather than silently dropping bits
    val mode = permission.toShort.toInt
    if ((mode & 0xE00) != 0) super.setPermission(p, permission)
    else {
      val file = pathToFile(p).toPath
      try
        java.nio.file.Files.setPosixFilePermissions(file, posixOf(mode))
      catch {
        // non-POSIX stores or races: the stock path defines behavior
        case _: UnsupportedOperationException =>
          super.setPermission(p, permission)
        case e: java.io.IOException => throw e
      }
    }
  }

  private def posixOf(mode: Int)
      : java.util.Set[java.nio.file.attribute.PosixFilePermission] = {
    import java.nio.file.attribute.PosixFilePermission._
    val out = java.util.EnumSet.noneOf(
      classOf[java.nio.file.attribute.PosixFilePermission])
    if ((mode & 0x100) != 0) out.add(OWNER_READ)
    if ((mode & 0x080) != 0) out.add(OWNER_WRITE)
    if ((mode & 0x040) != 0) out.add(OWNER_EXECUTE)
    if ((mode & 0x020) != 0) out.add(GROUP_READ)
    if ((mode & 0x010) != 0) out.add(GROUP_WRITE)
    if ((mode & 0x008) != 0) out.add(GROUP_EXECUTE)
    if ((mode & 0x004) != 0) out.add(OTHERS_READ)
    if ((mode & 0x002) != 0) out.add(OTHERS_WRITE)
    if ((mode & 0x001) != 0) out.add(OTHERS_EXECUTE)
    out
  }
}
