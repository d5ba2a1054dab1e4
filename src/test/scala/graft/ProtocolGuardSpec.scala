package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

import graft.io.VersionedTable

/** Reader-protocol gate: manifests name the read-semantic features a
  * reader MUST implement (`#requires=`), written only while a feature
  * is in use; an unknown required feature fails the read loudly —
  * silence would return wrong data (a pre-defaults reader would see
  * nulls where the lazy backfill belongs). */
class ProtocolGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a defaulted table writes #requires; plain tables do not") {
    val root = s"${Fixtures.tempDir("graft-proto")}/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write(Seq((1L, "a")).toDF("id", "s")) // v0: no features
    def manifest(v: Long): String = Files.readString(
      Paths.get(root, "_manifests", f"v$v%08d.txt"))
    assert(!manifest(0L).contains("#requires="),
      "feature-free tables must stay readable by older readers")
    vt.addColumnWithDefault("tier", StringType, "'standard'") // v1
    assert(manifest(1L).contains("#requires=column-defaults"))
  }

  test("an unknown required feature fails the read loudly") {
    val root = s"${Fixtures.tempDir("graft-proto2")}/tbl"
    val vt = new VersionedTable(spark, root)
    vt.write(Seq((1L, "a")).toDF("id", "s")) // v0
    // forge a future library's manifest: demand a feature this
    // reader does not implement (headers are order-independent)
    val p = Paths.get(root, "_manifests", "v00000000.txt")
    Files.writeString(p,
      Files.readString(p) + "\n#requires=frobnicate-compression-v2")
    // the direct edit invalidates Hadoop LocalFS's checksum sidecar
    Files.deleteIfExists(
      Paths.get(root, "_manifests", ".v00000000.txt.crc"))
    val err = intercept[IllegalArgumentException] {
      new VersionedTable(spark, root).read().collect()
    }
    assert(err.getMessage.contains("frobnicate-compression-v2"))
    assert(err.getMessage.contains("does not implement"))
  }
}
