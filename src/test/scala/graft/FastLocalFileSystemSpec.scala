package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

class FastLocalFileSystemSpec extends AnyFunSuite {

  test("setPermission applies the exact mode bits without forking") {
    val conf = new Configuration()
    conf.set("fs.file.impl", classOf[graft.io.FastLocalFileSystem].getName)
    // the JVM-global FileSystem cache keys on (scheme, authority, ugi)
    // and ignores fs.file.impl — an earlier suite's stock LocalFileSystem
    // would be returned otherwise (test-order flakiness)
    conf.setBoolean("fs.file.impl.disable.cache", true)
    val dir = java.nio.file.Files.createTempDirectory("graft-fastfs")
    val p = new Path(dir.toString, "f.txt")
    val fs = p.getFileSystem(conf)
    assert(fs.isInstanceOf[graft.io.FastLocalFileSystem])
    val out = fs.create(p)
    out.write(42); out.close()
    for (mode <- Seq(Integer.parseInt("600", 8), Integer.parseInt("755", 8),
        Integer.parseInt("640", 8))) {
      fs.setPermission(p, new FsPermission(mode.toShort))
      val got = fs.getFileStatus(p).getPermission.toShort.toInt
      assert(got == mode, f"mode $mode%o round-trips (got $got%o)")
    }
    // checksum wrapper intact: the CRC sibling exists after create
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir.toString, ".f.txt.crc")),
      "FastLocalFileSystem must keep the ChecksumFileSystem wrapper")
    fs.delete(new Path(dir.toString), true)
  }

  test("sticky/setuid modes fall back to the stock path, not dropped") {
    val conf = new Configuration()
    conf.set("fs.file.impl", classOf[graft.io.FastLocalFileSystem].getName)
    // the JVM-global FileSystem cache keys on (scheme, authority, ugi)
    // and ignores fs.file.impl — an earlier suite's stock LocalFileSystem
    // would be returned otherwise (test-order flakiness)
    conf.setBoolean("fs.file.impl.disable.cache", true)
    val dir = java.nio.file.Files.createTempDirectory("graft-fastfs2")
    val p = new Path(dir.toString, "g.txt")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p)
    out.write(1); out.close()
    val sticky = Integer.parseInt("1755", 8)
    fs.setPermission(p, new FsPermission(sticky.toShort))
    val got = fs.getFileStatus(p).getPermission.toShort.toInt
    assert(got == sticky, f"sticky mode survives (got $got%o)")
    fs.delete(new Path(dir.toString), true)
  }
}
