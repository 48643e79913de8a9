package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality exclusion layer over the stock ledger (reference
  * etl_inventory/dq_exclusions_csv.py): threshold rule on absurd absolute
  * snapshots (P11, `:96-97`), manually-curated id exclusions (P12,
  * `:89-94`), nested reason labels (F17, `:108-110`), composite uniq key
  * (F16, `:46-49`), and application of the exclusions to the ledger via
  * anti-join before replay (`seed_stock_points.py:49-56`).
  *
  * Fixture mapping: the `events`-backed ledger (Tables.ledger); the
  * curated manual list is role-played by `id_origen % 97 = 0` (the
  * reference reads it from a CSV — a driver-side membership set either
  * way, broadcast-joined at scale).
  */
object Dq {

  /** Threshold on absolute snapshots (reference ABS_MAX = 1_000_000,
    * `seed_stock_points.py:15`; scaled to the fixture value range).
    */
  val AbsMax = 250L

  private def withFlags(led: DataFrame): DataFrame =
    led
      .withColumn("rule_hit",
        col("is_absolute") && abs(col("abs_stock_after")) > AbsMax)
      .withColumn("manual_hit", col("id_origen") % 97 === 0)

  private val flagsSql =
    s"""(is_absolute AND abs(abs_stock_after) > $AbsMax) AS rule_hit,
      |  (id_origen % 97 = 0) AS manual_hit""".stripMargin

  /** The exclusion ledger: flagged rows + nested reason + composite uniq
    * key (F16/F17). Idempotent by construction — `uniq` is a pure function
    * of the row, so the S13 dedup-append sink drops re-detections.
    */
  def dqExclusions(spark: SparkSession, dir: String): DataFrame =
    withFlags(Tables.ledger(spark, dir))
      .filter(col("rule_hit") || col("manual_hit"))
      .withColumn("reason",
        when(col("rule_hit") && !col("manual_hit"), "abs_stock_after_too_large")
          .when(!col("rule_hit") && col("manual_hit"), "manual_exclusion")
          .otherwise("manual_and_threshold"))
      .withColumn("fecha_iso", date_format(col("fecha"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("uniq",
        concat_ws("|", col("tienda_id"), col("art_id"), col("id_origen"),
          col("fecha_iso"), col("reason")))
      .select(col("tienda_id").as("store_id"), col("art_id"),
        col("id_origen").as("hist_id"), col("fecha_iso"), col("reason"), col("uniq"))
      .orderBy(col("hist_id"))

  val dqExclusionsSql: String =
    s"""WITH ledger AS (${Tables.ledgerSql}),
      |f AS (SELECT *, $flagsSql FROM ledger)
      |SELECT tienda_id AS store_id, art_id, id_origen AS hist_id,
      |  strftime(fecha, '%Y-%m-%d %H:%M:%S') AS fecha_iso,
      |  CASE WHEN rule_hit AND NOT manual_hit THEN 'abs_stock_after_too_large'
      |       WHEN NOT rule_hit AND manual_hit THEN 'manual_exclusion'
      |       ELSE 'manual_and_threshold' END AS reason,
      |  concat_ws('|', tienda_id, art_id, id_origen,
      |    strftime(fecha, '%Y-%m-%d %H:%M:%S'),
      |    CASE WHEN rule_hit AND NOT manual_hit THEN 'abs_stock_after_too_large'
      |         WHEN NOT rule_hit AND manual_hit THEN 'manual_exclusion'
      |         ELSE 'manual_and_threshold' END) AS uniq
      |FROM f WHERE rule_hit OR manual_hit
      |ORDER BY hist_id""".stripMargin

  /** The ledger with exclusions applied (left_anti on the exclusion ids —
    * the P12 pattern; the exclusion side is tiny and broadcast), rolled up
    * per store/day. This is the input the stock-point replay consumes in
    * the reference (`seed_stock_points.py:49-56` drops excluded rows
    * before the running balance).
    */
  def dqFilteredLedger(spark: SparkSession, dir: String): DataFrame = {
    val led = Tables.ledger(spark, dir)
    val excl = dqExclusions(spark, dir).select(col("hist_id").as("id_origen"))
    led.join(broadcast(excl), Seq("id_origen"), "left_anti")
      .groupBy(col("tienda_id"), to_date(col("fecha")).as("dia"))
      .agg(count(lit(1)).as("n_events"),
        sum(coalesce(col("delta_cantidad"), lit(0L))).as("net_delta"))
      .orderBy(col("tienda_id"), col("dia"))
  }

  val dqFilteredLedgerSql: String =
    s"""WITH ledger AS (${Tables.ledgerSql}),
      |f AS (SELECT *, $flagsSql FROM ledger)
      |SELECT tienda_id, CAST(fecha AS DATE) AS dia, count(*) AS n_events,
      |  CAST(sum(COALESCE(delta_cantidad, 0)) AS BIGINT) AS net_delta
      |FROM f WHERE NOT (rule_hit OR manual_hit)
      |GROUP BY 1, 2 ORDER BY tienda_id, dia""".stripMargin
}
