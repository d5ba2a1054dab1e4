package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins BOTH arriving-type branches of `Tables.load("events")`
  * (queries/Tables.scala): the harness has shipped events.ts as
  * parquet TIMESTAMP(NANOS) in some generations and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) in others, and load resolves by the type
  * that actually arrives — NANOS reads as long (legacy nanosAsLong)
  * and truncates with `DIV 1000`; MICROS-NTZ arrives as
  * TIMESTAMP_NTZ and casts to the session-zone timestamp. The specs
  * write real parquet fixtures of each physical type (parquet-java
  * example writer — the API Spark itself bundles) carrying the SAME
  * instants and assert the two branches resolve to identical
  * session-zone (UTC) timestamps. */
class TablesLoadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // instants with sub-micro nanos to prove the DIV-1000 truncation:
  // 2023-11-14T22:13:20.123456789Z and ...21.999999999Z
  private val nanos = Seq(1700000000123456789L, 1700000001999999999L)
  private val micros = nanos.map(_ / 1000L)

  /** Write `<dir>/events.parquet` with one INT64 ts column annotated
    * with the given timestamp logical type. */
  private def writeEvents(unit: TimeUnit, adjustedToUtc: Boolean,
      values: Seq[Long]): String = {
    val dir = Files.createTempDirectory("graft-events-fixture").toFile
    dir.deleteOnExit()
    val schema = new MessageType("events",
      Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(adjustedToUtc, unit))
        .named("ts"))
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter
      .builder(new Path(s"${dir.getAbsolutePath}/events.parquet"))
      .withConf(conf)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val f = new SimpleGroupFactory(schema)
    try values.foreach(v => w.write(f.newGroup().append("ts", v)))
    finally w.close()
    dir.getAbsolutePath
  }

  private def loadMicros(dir: String): (String, Seq[Long]) = {
    val df = graft.queries.Tables.load(spark, dir, "events")
    (df.schema("ts").dataType.typeName,
      df.select(unix_micros(col("ts"))).orderBy("ts")
        .collect().map(_.getLong(0)).toSeq)
  }

  test("events.ts NANOS branch: long + DIV 1000 truncation to micros") {
    val dir = writeEvents(TimeUnit.NANOS, adjustedToUtc = true, nanos)
    val (tpe, got) = loadMicros(dir)
    assert(tpe === "timestamp")
    assert(got === micros)
  }

  test("events.ts MICROS-NTZ branch: cast to session-zone timestamp") {
    val dir = writeEvents(TimeUnit.MICROS, adjustedToUtc = false, micros)
    val (tpe, got) = loadMicros(dir)
    assert(tpe === "timestamp")
    assert(got === micros)
  }

  test("both branches resolve the same instants identically") {
    val n = loadMicros(writeEvents(TimeUnit.NANOS, adjustedToUtc = true, nanos))
    val m = loadMicros(
      writeEvents(TimeUnit.MICROS, adjustedToUtc = false, micros))
    assert(n === m)
  }
}
