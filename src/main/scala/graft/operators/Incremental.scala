package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental/checkpoint operators (reference §2.9): high-water-mark
  * checkpoints (A7), watermark-filtered extraction (P7/P8), and the keyed
  * last-wins upsert applied as a query (S8/S9).
  */
object Incremental {

  /** S8 keyed last-wins upsert as a testable query: re-deliver every 10th
    * order with a bumped total and a later version timestamp; the upsert
    * must keep exactly the newer row per key (reference
    * etl_sales/db/db_helpers.py:25-40; update_clean_data.py:91-97).
    */
  def upsertLastWins(spark: SparkSession, dir: String): DataFrame = {
    val existing = Tables.orders(spark, dir).select(
      col("o_orderkey").as("ven_id"),
      col("o_totalprice").cast(Tables.Money).as("total_venta"),
      col("o_orderdate").as("version"),
      lit(1).as("src"))
    val incoming = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 === 0)
      .select(
        col("o_orderkey").as("ven_id"),
        (col("o_totalprice").cast(Tables.Money) + lit(100000)).as("total_venta"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("version"),
        lit(2).as("src"))
    Upsert.upsertByKey(existing, incoming, Seq("ven_id"), "version", "src")
      .select(col("ven_id"),
        col("total_venta").cast("double").as("total_venta"),
        col("version"))
      .orderBy(col("ven_id"))
  }

  val upsertLastWinsSql: String =
    """WITH existing AS (
      |  SELECT o_orderkey AS ven_id,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS total_venta,
      |    o_orderdate AS version, 1 AS src
      |  FROM orders),
      |incoming AS (
      |  SELECT o_orderkey AS ven_id,
      |    CAST(o_totalprice AS DECIMAL(18,2)) + 100000 AS total_venta,
      |    o_orderdate + INTERVAL 1 DAY AS version, 2 AS src
      |  FROM orders WHERE o_orderkey % 10 = 0),
      |u AS (SELECT * FROM existing UNION ALL SELECT * FROM incoming),
      |r AS (SELECT *, row_number() OVER (
      |        PARTITION BY ven_id ORDER BY version DESC, src DESC) AS rn
      |      FROM u)
      |SELECT ven_id, CAST(total_venta AS DOUBLE) AS total_venta, version
      |FROM r WHERE rn = 1 ORDER BY ven_id""".stripMargin

  /** A7 checkpoint scalar aggregates, per store (reference
    * etl_sales/db/db_helpers.py:42-55; sql/get_max_raw_ts.sql). Store is
    * role-played by o_orderstatus.
    */
  def checkpointMax(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("store_name"))
      .agg(
        max(col("o_orderkey")).as("last_processed_ven_id"),
        max(col("o_orderdate")).as("last_ts"))
      .orderBy(col("store_name"))

  val checkpointMaxSql: String =
    """SELECT o_orderstatus AS store_name,
      |  max(o_orderkey) AS last_processed_ven_id,
      |  max(o_orderdate) AS last_ts
      |FROM orders GROUP BY o_orderstatus ORDER BY store_name""".stripMargin

  /** P7/P8 watermark-filtered incremental extract: checkpoint = max key seen
    * before the cutover date, then pull strictly-newer rows (reference
    * etl_sales/update_clean_data.py:41-70;
    * etl_inventory/update_raw_stock_movements.py:84-85). The checkpoint is a
    * 1-row aggregate broadcast into the filter — no second scan shuffle.
    */
  def watermarkIncrement(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val ckpt = ev
      .filter(col("ts") < lit("2024-01-15").cast("timestamp"))
      .agg(max(col("event_id")).as("last_id"))
    ev
      .join(broadcast(ckpt), ev("event_id") > ckpt("last_id"), "inner")
      .select(col("event_id").as("id_origen"),
        col("ts").as("fecha"),
        col("user_id").as("art_id"),
        col("event_type").as("tipo_movimiento"))
      .orderBy(col("id_origen"))
  }

  val watermarkIncrementSql: String =
    """SELECT event_id AS id_origen, ts AS fecha, user_id AS art_id,
      |  event_type AS tipo_movimiento
      |FROM events
      |WHERE event_id > (SELECT max(event_id) FROM events
      |                  WHERE ts < TIMESTAMP '2024-01-15')
      |ORDER BY id_origen""".stripMargin
}
