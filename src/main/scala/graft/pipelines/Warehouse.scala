package graft.pipelines

import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A parquet-backed warehouse with keyed upserts and per-pipeline
  * checkpoints — the Spark-native stand-in for the reference's central
  * `analytics_db` MySQL (tables + `etl_progress`,
  * etl_sales/db/db_helpers.py, SURVEY.md §1.1/§2.9). Swapping parquet for
  * Delta/Iceberg (MERGE INTO, atomic commits) changes this class only.
  *
  * Crash-safety contract (SURVEY.md §7.3): checkpoints are advanced AFTER
  * the sink write commits. A crash between the two replays the window on
  * the next run; last-wins upserts (and the ledger ingest's id anti-join)
  * make the replay idempotent — the same at-least-once-extract /
  * exactly-once-effect scheme the reference gets from transactions.
  * Table rewrites go through [[Fs.replaceWith]] (write tmp → swap), so a
  * failed merge never destroys the previous table contents.
  */
/** Sink seam for the S8/S9 keyed merges. The harness default is the
  * parquet keyed-overwrite ([[Warehouse.upsert]]: read current + merge +
  * tmp-swap); a lakehouse deployment drops in Delta/Iceberg
  * `MERGE INTO ... WHEN MATCHED` by implementing this trait with the same
  * call shape (SURVEY §7.1 documents that as the production path — a
  * MERGE avoids rewriting untouched files and commits atomically).
  * Pipelines depend only on the contract: last-wins per `keys` by
  * (`versionCol`, `tiebreakCol`), atomic with respect to readers.
  */
trait UpsertSink {
  def upsert(table: String, incoming: DataFrame, keys: Seq[String],
             versionCol: String, tiebreakCol: String): Unit
}

final class Warehouse(val spark: SparkSession, val root: String) extends UpsertSink {

  private def path(table: String): String = s"$root/$table"

  def exists(table: String): Boolean = Fs.exists(spark, path(table))

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def write(table: String, df: DataFrame): Unit =
    Fs.replaceWith(spark, path(table))(tmp => df.write.parquet(tmp))

  def append(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(table))

  /** Keyed last-wins upsert (S8/S9): read current, merge via
    * [[Upsert.upsertByKey]], write to a tmp dir (the read of the old
    * table streams into the tmp write — no same-path race), swap.
    */
  def upsert(table: String, incoming: DataFrame, keys: Seq[String],
             versionCol: String, tiebreakCol: String): Unit =
    if (!exists(table)) write(table, incoming)
    else write(table,
      Upsert.upsertByKey(read(table), incoming, keys, versionCol, tiebreakCol))

  /** Bucketed write: co-locates the table by `bucketCol` so repeated
    * joins/aggregations on that key skip their shuffle entirely (the scan
    * reports the bucketing as its output partitioning). This is the
    * at-rest form of the pre-partitioning the big fact tables want at
    * 100 TB — bucket `raw_stock_movements` by art_id once, and every
    * nightly replay's window exchange disappears. Registers the table in
    * the session catalog (bucketing metadata lives there), data under the
    * warehouse root.
    */
  def writeBucketed(table: String, df: DataFrame, bucketCol: String,
                    numBuckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path(table))
      .saveAsTable(table)
  }

  /** Date/column-partitioned write — the at-rest layout every 100 TB fact
    * table needs: one directory per partition value, so date-range and
    * store predicates prune at PLANNING time (the scan's
    * `PartitionFilters` — zero IO for untouched partitions, where a flat
    * table would scan-and-filter everything). This is the file-source
    * form of the reference's date-window batching + `tienda_id` filters
    * (SURVEY.md §4 "partition-style pruning"). Combine with bucketing
    * (partition by day, bucket by SKU) for pruned AND shuffle-free reads.
    */
  def writePartitioned(table: String, df: DataFrame,
                       partitionCols: Seq[String]): Unit =
    Fs.replaceWith(spark, path(table))(tmp =>
      df.write.partitionBy(partitionCols: _*).parquet(tmp))

  /** Scalar checkpoint per (pipeline, key) — the `etl_progress` row. Stored
    * as a tiny one-row parquet; read returns None before the first seed.
    */
  def checkpoint(name: String): Option[Long] =
    if (!exists(s"_checkpoints/$name")) None
    else read(s"_checkpoints/$name").select(col("v")).collect().headOption.map(_.getLong(0))

  def setCheckpoint(name: String, v: Long): Unit = {
    import spark.implicits._
    write(s"_checkpoints/$name", Seq(v).toDF("v"))
  }
}
