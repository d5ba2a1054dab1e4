package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, to_date, to_timestamp}
import org.apache.spark.sql.types._

/** Declared layer schemas + validation/enforcement.
  *
  * Port of the reference's `utils/schemas.py:9-237`: flat StructTypes for
  * bronze/silver/gold, case-insensitive validation with a small
  * type-compatibility lattice (string→timestamp, int→long, int→double),
  * and enforcement = case-insensitive rename + cast.
  */
object Schemas {

  val bronze: StructType = StructType(Seq(
    StructField("VendorID", IntegerType),
    StructField("tpep_pickup_datetime", StringType), // cast to ts in silver
    StructField("tpep_dropoff_datetime", StringType),
    StructField("passenger_count", IntegerType),
    StructField("trip_distance", DoubleType),
    StructField("RatecodeID", IntegerType),
    StructField("store_and_fwd_flag", StringType),
    StructField("PULocationID", IntegerType),
    StructField("DOLocationID", IntegerType),
    StructField("payment_type", IntegerType),
    StructField("fare_amount", DoubleType),
    StructField("extra", DoubleType),
    StructField("mta_tax", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("tolls_amount", DoubleType),
    StructField("improvement_surcharge", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("congestion_surcharge", DoubleType),
    StructField("airport_fee", DoubleType),
    StructField("ingestion_ts", TimestampType),
    StructField("source_file", StringType)))

  val silver: StructType = StructType(Seq(
    StructField("vendorid", IntegerType),
    StructField("tpep_pickup_datetime", TimestampType),
    StructField("tpep_dropoff_datetime", TimestampType),
    StructField("passenger_count", IntegerType),
    StructField("trip_distance", DoubleType),
    StructField("ratecodeid", IntegerType),
    StructField("store_and_fwd_flag", StringType),
    StructField("pulocationid", IntegerType),
    StructField("dolocationid", IntegerType),
    StructField("payment_type", IntegerType),
    StructField("fare_amount", DoubleType),
    StructField("extra", DoubleType),
    StructField("mta_tax", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("tolls_amount", DoubleType),
    StructField("improvement_surcharge", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("congestion_surcharge", DoubleType),
    StructField("airport_fee", DoubleType),
    StructField("ingestion_ts", TimestampType),
    StructField("source_file", StringType)))

  val goldDailyKpis: StructType = StructType(Seq(
    StructField("trip_date", DateType, nullable = false),
    StructField("daily_trip_count", LongType, nullable = false),
    StructField("daily_total_revenue", DoubleType, nullable = false),
    StructField("avg_trip_distance", DoubleType),
    StructField("avg_passenger_count", DoubleType)))

  val goldZoneDemand: StructType = StructType(Seq(
    StructField("trip_date", DateType, nullable = false),
    StructField("pu_location_id", IntegerType),
    StructField("trip_count", LongType, nullable = false),
    StructField("total_revenue", DoubleType, nullable = false)))

  /** Type-compatibility lattice (reference `utils/schemas.py:155-182`):
    * exact match, string→timestamp, int→long, int→double. */
  def typesCompatible(actual: DataType, expected: DataType): Boolean =
    (actual, expected) match {
      case (a, e) if a == e => true
      case (StringType, TimestampType) => true
      case (IntegerType, LongType) => true
      case (IntegerType, DoubleType) => true
      case _ => false
    }

  /** Validate a DataFrame schema against a declared one
    * (reference `utils/schemas.py:111-152`): field presence by lowercase
    * name, type compatibility, nullability; optionally reject extras.
    * @return (isValid, errors) */
  def validate(
      actual: StructType,
      expected: StructType,
      allowExtraColumns: Boolean = true): (Boolean, Seq[String]) = {
    val expectedByName = expected.fields.map(f => f.name.toLowerCase -> f).toMap
    val actualByName = actual.fields.map(f => f.name.toLowerCase -> f).toMap
    val errors = Seq.newBuilder[String]

    expectedByName.foreach { case (lname, ef) =>
      actualByName.get(lname) match {
        case None =>
          errors += s"Missing required field: ${ef.name}"
        case Some(af) =>
          if (!typesCompatible(af.dataType, ef.dataType))
            errors += s"Type mismatch for field '${ef.name}': " +
              s"expected ${ef.dataType}, got ${af.dataType}"
          if (!ef.nullable && af.nullable)
            errors += s"Nullability mismatch for field '${ef.name}': " +
              "expected non-nullable, but field is nullable"
      }
    }
    if (!allowExtraColumns)
      actualByName.keys.filterNot(expectedByName.contains).foreach { extra =>
        errors += s"Unexpected field: ${actualByName(extra).name}"
      }
    val errs = errors.result()
    (errs.isEmpty, errs)
  }

  /** Enforce a declared schema (reference `utils/schemas.py:185-237`):
    * case-insensitive rename to declared names, then cast mismatched
    * types (to_timestamp/to_date for string sources, plain cast
    * otherwise). Single `select` rather than a withColumn-per-field
    * chain — one Project node regardless of column count.
    * @return (enforced DataFrame, cast warnings) */
  def enforce(df: DataFrame, expected: StructType): (DataFrame, Seq[String]) = {
    val expectedByName = expected.fields.map(f => f.name.toLowerCase -> f).toMap
    val warnings = Seq.newBuilder[String]

    val cols = df.schema.fields.map { af =>
      expectedByName.get(af.name.toLowerCase) match {
        case Some(ef) if af.dataType != ef.dataType =>
          warnings += s"Casted ${ef.name} from ${af.dataType} to ${ef.dataType}"
          val src = col(df.schema.fields
            .find(_.name.equalsIgnoreCase(ef.name)).get.name)
          val castd = (af.dataType, ef.dataType) match {
            case (StringType, TimestampType) => to_timestamp(src)
            case (StringType, DateType) => to_date(src)
            case _ => src.cast(ef.dataType)
          }
          castd.as(ef.name)
        case Some(ef) => col(af.name).as(ef.name)
        case None => col(af.name) // extra column: pass through
      }
    }
    (df.select(cols.toSeq: _*), warnings.result())
  }
}
