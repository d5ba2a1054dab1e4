package graft.io

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FileStatus, LocalFileSystem, Path, RawLocalFileSystem}

/** `file://` implementation for sandboxes WITHOUT the Hadoop native
  * library: identical to the stock [[LocalFileSystem]] (checksums,
  * buffering, semantics all inherited) except that the operations
  * Hadoop implements by FORKING a shell when libhadoop is absent go
  * through java.nio instead:
  *
  *  - `setPermission` — stock forks `/bin/chmod` per call; every
  *    permissioned mkdir/create in a commit pays it (a 24-partition
  *    write forks ~50 times, ~0.1–1.6s per committing query).
  *  - `getFileStatus`/`listStatus` — the stock
  *    `DeprecatedRawLocalFileStatus` lazy-loads permission/owner by
  *    forking `ls -ld` the first time `getPermission` is called, and
  *    `FileSystem.listFiles`' `LocatedFileStatus` constructor calls it
  *    for EVERY listed file — so each commit's file listing forked
  *    once per data file (driver stack: `loadPermissionInfoByNonNativeIO`
  *    under `listCommitFiles`). Here the status is built EAGERLY from
  *    one `unix:` attribute read (mode incl. sticky bits, owner,
  *    group) — no fork, same values.
  *
  * Register with `spark.hadoop.fs.file.impl=graft.io.FastLocalFileSystem`.
  *
  * Cluster note: this class only affects `file://` URIs — on real
  * deployments (HDFS/S3) it is inert; it exists so local-mode commit
  * latency measures the engine, not process spawning.
  */
class FastLocalFileSystem
    extends LocalFileSystem(new FastRawLocalFileSystem)

/** The [[FastLocalFileSystem]] counterpart for the FileContext /
  * AbstractFileSystem API — which Structured Streaming's checkpoint
  * file manager uses for EVERY offset/commit/state-delta rename:
  * `FileContext.rename` stats the destination through
  * `FileSystem#getFileLinkStatus`, and the stock local status forks
  * `readlink` + `ls -ld` per call without libhadoop — several process
  * spawns per micro-batch per streaming drain. Same checksummed
  * semantics as the stock `LocalFs` (ChecksumFs wrapper), delegating
  * to [[FastRawLocalFileSystem]]. Register with
  * `spark.hadoop.fs.AbstractFileSystem.file.impl=graft.io.FastLocalFs`. */
class FastLocalFs(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.ChecksumFs(
      new FastRawLocalFs(uri, conf))

class FastRawLocalFs(uri: java.net.URI,
    conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      org.apache.hadoop.fs.FsConstants.LOCAL_FS_URI,
      new FastRawLocalFileSystem, conf,
      org.apache.hadoop.fs.FsConstants.LOCAL_FS_URI.getScheme, false)

class FastRawLocalFileSystem extends RawLocalFileSystem {

  override def getFileStatus(f: Path): FileStatus =
    eager(super.getFileStatus(f))

  /** Non-symlink fast path: ONE lstat via java.nio instead of the
    * stock `readlink` + `ls -ld` forks. Actual symlinks (none in any
    * table/checkpoint layout this engine writes) keep the stock path
    * whose semantics are the contract. */
  override def getFileLinkStatus(f: Path): FileStatus = {
    val nio =
      try pathToFile(f).toPath
      catch { case _: Exception => null }
    if (nio != null && !java.nio.file.Files.isSymbolicLink(nio))
      getFileStatus(f)
    else super.getFileLinkStatus(f)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val raw = super.listStatus(f)
    if (raw == null) null else raw.map(eager)
  }

  /** Rebuild `st` with permission/owner/group loaded via ONE java.nio
    * `unix:` attribute read — the full st_mode (sticky/setuid bits
    * included), so values match the stock `ls -ld` fork exactly. Any
    * failure (non-POSIX store, racing delete) returns the stock lazy
    * status whose behavior is the contract. */
  private def eager(st: FileStatus): FileStatus = {
    if (st == null || st.isSymlink) return st
    try {
      val attrs = java.nio.file.Files.readAttributes(
        pathToFile(st.getPath).toPath, "unix:mode,owner,group")
      val mode = attrs.get("mode").asInstanceOf[Int]
      new FileStatus(st.getLen, st.isDirectory, 1, st.getBlockSize,
        st.getModificationTime, st.getAccessTime,
        new FsPermission((mode & 0xFFF).toShort),
        attrs.get("owner").asInstanceOf[java.nio.file.attribute.UserPrincipal]
          .getName,
        attrs.get("group").asInstanceOf[java.nio.file.attribute.GroupPrincipal]
          .getName,
        st.getPath)
    } catch { case _: Exception => st }
  }

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
