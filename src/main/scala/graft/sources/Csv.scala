package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV side-channel sources/sinks (reference S11–S13):
  *
  *  - QA/debug append sinks with header management
  *    (etl_sales/seed_historical.py:40-48, S11/S14)
  *  - all-strings defensive reads (`dtype=str, keep_default_na=False` —
  *    etl_inventory/dq_exclusions_csv.py:53-55, S12)
  *  - the atomic dedup-append upsert: concat old+new, drop duplicate
  *    `uniq` keys, atomic replace (dq_exclusions_csv.py:57-66, S13).
  *
  * Spark-native mapping: a CSV *directory* instead of a single file (the
  * job commit protocol provides the reference's tmp-file + os.replace
  * atomicity), `dropDuplicates` instead of pandas drop_duplicates, and an
  * explicit all-`StringType` schema instead of dtype=str.
  */
object Csv {

  /** S12: read a CSV with every column as a non-null string (missing →
    * empty string, matching keep_default_na=False).
    */
  def readAllStrings(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val schema = StructType(columns.map(StructField(_, StringType, nullable = true)))
    val df = spark.read.schema(schema).option("header", "true").csv(path)
    df.na.fill("", columns)
  }

  /** S11: append rows to a CSV dataset; header handling is per-file and
    * automatic (every part file carries the header, readers merge).
    */
  def appendWithHeader(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).option("header", "true").csv(path)

  /** S13: idempotent dedup-append — union the existing log with new rows,
    * keep the first row per `uniq` key (existing rows win, like the
    * reference's keep='first' after concat [old, new]), rewrite
    * atomically. Returns the merged row count.
    */
  def dedupAppend(spark: SparkSession, path: String, incoming: DataFrame,
                  uniqCol: String = "uniq"): Long = {
    val cols = incoming.columns.toSeq
    val merged =
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
        incoming.dropDuplicates(uniqCol)
      } else {
        val existing = readAllStrings(spark, path, cols)
        // precedence flag: existing rows sort first within a uniq key
        val tagged = existing.withColumn("__p", lit(0))
          .unionByName(incoming.select(cols.map(col): _*).withColumn("__p", lit(1)))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(uniqCol)).orderBy(col("__p"))
        tagged.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__p", "__rn")
      }
    val out = merged.cache()
    val n = out.count()
    // materialized above, so the same-path rewrite is safe; the write's
    // job commit gives the os.replace-style atomicity
    out.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    out.unpersist()
    n
  }
}
