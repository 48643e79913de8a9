package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Columnar/row format breadth beyond parquet+CSV: ORC (the other
  * splittable columnar format with predicate pushdown and column
  * pruning — organizations standardized on it get the same scan
  * behavior parquet users do) and JSON-lines (the interchange format
  * every scraped-corpus delivery actually arrives in).
  *
  * Reads take an EXPLICIT schema: at 100 TB, schema inference is a
  * full extra pass over the data (JSON) or an availability hazard
  * (first-file sampling picks up a malformed outlier); production
  * tables have contracts, so the schema is an input, not a discovery.
  * JSON reads run PERMISSIVE with a `_corrupt_record` column so one
  * bad line quarantines instead of failing the pipeline.
  */
object Formats {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** PERMISSIVE JSON-lines read: rows that fail the schema land with
    * nulls + the raw line in `_corrupt_record` for quarantine/DQ
    * (the S12-style defensive posture, applied to JSON).
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
}
