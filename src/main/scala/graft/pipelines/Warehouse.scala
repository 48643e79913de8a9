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
  * the next run; last-wins upserts make the replay idempotent — the same
  * at-least-once-extract / exactly-once-effect scheme the reference gets
  * from transactions.
  */
final class Warehouse(val spark: SparkSession, val root: String) {

  private def path(table: String): String = s"$root/$table"

  def exists(table: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path(table)))

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def write(table: String, df: DataFrame, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path(table))

  def append(table: String, df: DataFrame): Unit =
    write(table, df, SaveMode.Append)

  /** Keyed last-wins upsert (S8/S9). Reads the current table, merges via
    * [[Upsert.upsertByKey]], materializes, rewrites. The materialize step
    * (cache + count) closes the read-overwrite-same-path race on plain
    * parquet; a real table format commits atomically instead.
    */
  def upsert(table: String, incoming: DataFrame, keys: Seq[String],
             versionCol: String, tiebreakCol: String): Unit = {
    if (!exists(table)) write(table, incoming)
    else {
      val merged = Upsert.upsertByKey(read(table), incoming, keys, versionCol, tiebreakCol)
        .cache()
      merged.count()
      write(table, merged)
      merged.unpersist()
      ()
    }
  }

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
