package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Uniform access to the driver-generated test tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `<sfDir>/<name>.parquet`.
  * At cluster scale the same call shape works on a directory of many
  * parquet files — nothing here assumes single-file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** SCHEMA memo per (sfDir, table): the source files are immutable
    * inputs, and without a caller-supplied schema every `load` pays a
    * driver-side footer-inference pass — a fixed ~tens-of-ms tax on
    * each of the registry's ~500 loads per bench run (guide §6:
    * listing/planning time is driver-side, single-process). Caches
    * METADATA only — never rows or results. The key carries the
    * file's (mtime, length) freshness token so a fixture regenerated
    * in-JVM with a different schema (events has shipped as both
    * TIMESTAMP(NANOS)→Long and TIMESTAMP(MICROS)) is re-inferred
    * instead of silently misread through a stale entry. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Long, Long), org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    def read(path: String): DataFrame = {
      val f = new java.io.File(path)
      val key = (sfDir, name, f.lastModified(), f.length())
      val cached = schemaCache.get(key)
      if (cached != null) spark.read.schema(cached).parquet(path)
      else {
        val df = spark.read.parquet(path)
        schemaCache.put(key, df.schema)
        df
      }
    }
    val raw = if (name == "events") {
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) and
      // TIMESTAMP(MICROS) across harness generations, so resolve by
      // the type that actually arrives rather than assuming either:
      //  - NANOS: Spark's vectorized reader rejects it; read nanos as
      //    long, truncate to micros with exact integer division
      //    (`DIV 1000`) — the same truncation DuckDB applies on
      //    CAST(timestamp_ns AS TIMESTAMP), so oracles line up.
      //  - MICROS (no tz): arrives as TIMESTAMP_NTZ; cast to the
      //    session-zone TIMESTAMP every downstream query and oracle
      //    already speaks (sessions run in UTC, so the instant is
      //    unchanged).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = read(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else {
      read(s"$sfDir/$name.parquet")
    }
    lowercased(raw)
  }

  /** Case-insensitive column resolution at the LOAD boundary: the
    * query catalogs reference lowercase names throughout, so a
    * mixed-case source (`Doc_Id`, `TEXT`) is normalized here once —
    * the same pervasive lowercase-match semantic the ETL jobs apply
    * via util.Cols (reference: etl/silver_job.py:56-57), applied
    * where the catalogs ingest. Harness tables are already lowercase,
    * so this is a no-op there (and a rename is metadata-only — no
    * plan cost either way). Duplicate names that collide after
    * lowercasing fail loudly rather than silently shadowing. */
  private[graft] def lowercased(df: DataFrame): DataFrame = {
    val lower = df.columns.map(_.toLowerCase(java.util.Locale.ROOT))
    require(lower.distinct.length == lower.length,
      s"columns collide after lowercasing: ${df.columns.mkString(",")}")
    if (df.columns.sameElements(lower)) df else df.toDF(lower.toIndexedSeq: _*)
  }
}
