package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The stock-point engine — the reference's flagship derivation
  * (etl_inventory/seed_stock_points.py, update_stock_points.py): replay an
  * event ledger into per-SKU running balances with absolute resets (R4),
  * derive start-of-day stock over a dense calendar (R5/R6), compress to a
  * sparse change-point series (R7), and read it back as-of a date (J9).
  *
  * R4 formulation (SURVEY.md §2.5 R4a, refined to a SINGLE shuffle): instead
  * of the reference's per-row Python loop (seed_stock_points.py:74-85), the
  * balance is
  *
  *   balance = coalesce(last_reset_value, 0)
  *           + cum_delta - coalesce(cum_delta_at_last_reset, 0)
  *
  * where every term is a running window over ONE partitioning
  * (tienda_id, art_id) ordered by (fecha, id_origen) — Catalyst plans one
  * Exchange + one Sort and evaluates the three running expressions in chained
  * Window operators over the same sorted partition, so the whole replay is a
  * single shuffle regardless of how many resets a SKU has. The per-(key,seg)
  * alternative needs a second Exchange on the seg column; this one does not.
  * At 100 TB the shuffle is on (store, SKU) — millions of small groups, which
  * hash-partitions evenly; no driver-side state, no collect.
  *
  * Ordering ties are broken by id_origen everywhere (pandas mergesort is
  * stable, Spark sort is not — SURVEY.md §2.5 R2).
  */
object Stock {

  private val keyCols = Seq("tienda_id", "art_id")

  /** R4: per-event running balance with absolute resets. Adds `balance`. */
  def withBalance(ledger: DataFrame): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("fecha"), col("id_origen"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = ledger
      .withColumn("run_abs",
        last(when(col("is_absolute"), col("abs_stock_after")), ignoreNulls = true).over(w))
      .withColumn("cum_delta",
        sum(coalesce(col("delta_cantidad"), lit(0L))).over(w))
    withCum
      .withColumn("cum_at_reset",
        last(when(col("is_absolute"), col("cum_delta")), ignoreNulls = true).over(w))
      .withColumn("balance",
        coalesce(col("run_abs"), lit(0L)) + col("cum_delta")
          - coalesce(col("cum_at_reset"), lit(0L)))
  }

  /** Typed event row for the [[withBalanceTyped]] fallback. */
  final case class LedgerEv(id_origen: Long, art_id: Long, tienda_id: Int,
                            fecha: java.sql.Timestamp, is_absolute: Boolean,
                            delta_cantidad: Option[Long],
                            abs_stock_after: Option[Long])

  final case class BalanceRow(tienda_id: Int, art_id: Long, id_origen: Long,
                              balance: Long)

  /** R4 fallback formulation (SURVEY.md §2.5 R4b): typed
    * `groupByKey.flatMapGroups` running the reference's fold verbatim per
    * key. Same single shuffle as the window plan, but each group is
    * materialized and sorted in executor heap (no spill) and rows leave
    * whole-stage codegen — kept as the documented alternative and as a
    * differential test target for [[withBalance]], which is the default.
    */
  def withBalanceTyped(ledger: DataFrame): Dataset[BalanceRow] = {
    val spark = ledger.sparkSession
    import spark.implicits._
    ledger
      .select(col("id_origen").cast("long"), col("art_id").cast("long"),
        col("tienda_id").cast("int"), col("fecha"), col("is_absolute"),
        col("delta_cantidad").cast("long"), col("abs_stock_after").cast("long"))
      .as[LedgerEv]
      .groupByKey(e => (e.tienda_id, e.art_id))
      .flatMapGroups { (key: (Int, Long), it: Iterator[LedgerEv]) =>
        val evs = it.toArray.sortBy(e => (e.fecha.getTime, e.id_origen))
        // lastAbs mirrors the window plan's run_abs: an absolute event with
        // a NULL value still RESETS the balance (to the previous non-null
        // absolute, or 0) because cum_at_reset advances regardless — the
        // formulations must agree even on out-of-contract rows
        var running = 0L
        var lastAbs = 0L
        evs.iterator.map { e =>
          if (e.is_absolute) {
            lastAbs = e.abs_stock_after.getOrElse(lastAbs)
            running = lastAbs
          } else running += e.delta_cantidad.getOrElse(0L)
          BalanceRow(key._1, key._2, e.id_origen, running)
        }
      }
  }

  /** The same replay as DuckDB CTEs over `ledger` (layered: cum first,
    * then last-at-reset over the cum column).
    */
  val balanceCte: String =
    """bal0 AS (
      |  SELECT *,
      |    last_value(CASE WHEN is_absolute THEN abs_stock_after END IGNORE NULLS)
      |      OVER wk AS run_abs,
      |    sum(COALESCE(delta_cantidad, 0)) OVER wk AS cum_delta
      |  FROM ledger
      |  WINDOW wk AS (PARTITION BY tienda_id, art_id
      |                ORDER BY fecha, id_origen
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |bal AS (
      |  SELECT *,
      |    CAST(COALESCE(run_abs, 0) + cum_delta
      |      - COALESCE(last_value(CASE WHEN is_absolute THEN cum_delta END IGNORE NULLS)
      |                 OVER wk, 0) AS BIGINT) AS balance
      |  FROM bal0
      |  WINDOW wk AS (PARTITION BY tienda_id, art_id
      |                ORDER BY fecha, id_origen
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""".stripMargin

  /** The raw-events ledger CTE (Tables.ledgerSql) for oracle reuse. */
  private val ledgerPrelude: String = s"ledger AS (${Tables.ledgerSql})"

  /** q11 — A5 daily net deltas per (store, SKU, day), relative events only
    * (reference seed_stock_points.py:88-91).
    */
  def dailyNet(spark: SparkSession, dir: String): DataFrame =
    Tables.ledger(spark, dir)
      .filter(!col("is_absolute"))
      .groupBy(col("tienda_id"), col("art_id"),
        to_date(col("fecha")).cast("timestamp").as("fecha"))
      .agg(sum(col("delta_cantidad")).as("daily_delta"))
      .orderBy(col("tienda_id"), col("art_id"), col("fecha"))

  val dailyNetSql: String =
    s"""WITH $ledgerPrelude
      |SELECT tienda_id, art_id,
      |  CAST(CAST(fecha AS DATE) AS TIMESTAMP) AS fecha,
      |  CAST(sum(delta_cantidad) AS BIGINT) AS daily_delta
      |FROM ledger WHERE NOT is_absolute
      |GROUP BY 1, 2, 3
      |ORDER BY tienda_id, art_id, fecha""".stripMargin

  /** q12 — R4 per-event running balance with resets. */
  def runningBalance(spark: SparkSession, dir: String): DataFrame =
    withBalance(Tables.ledger(spark, dir))
      .select(col("id_origen"), col("tienda_id"), col("art_id"),
        col("fecha"), col("tipo_movimiento"), col("balance"))
      .orderBy(col("tienda_id"), col("art_id"), col("fecha"), col("id_origen"))

  val runningBalanceSql: String =
    s"""WITH $ledgerPrelude,
      |$balanceCte
      |SELECT id_origen, tienda_id, art_id, fecha, tipo_movimiento, balance
      |FROM bal
      |ORDER BY tienda_id, art_id, fecha, id_origen""".stripMargin

  /** Dense start-of-day stock per (store, SKU, calendar day): R4 balances →
    * end-of-day value per active day → calendar densification (D1/D2' —
    * long-format cross join, never the pandas pivot) → forward fill → SOD =
    * yesterday's EOD (R5/R6; reference seed_stock_points.py:92-116).
    */
  def denseSod(spark: SparkSession, dir: String): DataFrame =
    denseSodFrom(Tables.ledger(spark, dir))

  /** Parametric form over any ledger frame (used by the incremental
    * pipeline layer with a seeded/re-filtered ledger).
    */
  def denseSodFrom(ledger: DataFrame): DataFrame = {
    val bal = withBalance(ledger)
    // end-of-day balance per active (key, day)
    val wDay = Window.partitionBy(col("tienda_id"), col("art_id"), col("d"))
      .orderBy(col("fecha").desc, col("id_origen").desc)
    val eod = bal
      .withColumn("d", to_date(col("fecha")))
      .withColumn("rn", row_number().over(wDay))
      .filter(col("rn") === 1)
      .select(col("tienda_id"), col("art_id"), col("d"), col("balance").as("eod"))
    // D1 calendar spanning the whole ledger (distributed; no driver collect)
    val cal = ledger
      .agg(min(to_date(col("fecha"))).as("d0"), max(to_date(col("fecha"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
    val keys = ledger
      .select(col("tienda_id"), col("art_id")).distinct()
    // D2': stay long — keys × calendar, left join actual EODs
    val dense = keys.crossJoin(broadcast(cal))
      .join(eod, Seq("tienda_id", "art_id", "d"), "left")
    val wFill = Window.partitionBy(col("tienda_id"), col("art_id"))
      .orderBy(col("d"))
    dense
      .withColumn("eod_f", coalesce(
        last(col("eod"), ignoreNulls = true)
          .over(wFill.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        lit(0L)))
      .withColumn("sod", lag(col("eod_f"), 1, 0L).over(wFill))
  }

  val denseSodCte: String =
    s"""$ledgerPrelude,
      |$balanceCte,
      |eod AS (
      |  SELECT tienda_id, art_id, d, balance AS eod FROM (
      |    SELECT tienda_id, art_id, CAST(fecha AS DATE) AS d, balance,
      |      row_number() OVER (PARTITION BY tienda_id, art_id, CAST(fecha AS DATE)
      |                         ORDER BY fecha DESC, id_origen DESC) AS rn
      |    FROM bal) t WHERE rn = 1),
      |cal AS (
      |  SELECT CAST(unnest(generate_series(
      |    (SELECT min(CAST(fecha AS DATE)) FROM ledger),
      |    (SELECT max(CAST(fecha AS DATE)) FROM ledger),
      |    INTERVAL 1 DAY)) AS DATE) AS d),
      |keys AS (SELECT DISTINCT tienda_id, art_id FROM ledger),
      |dense AS (
      |  SELECT k.tienda_id, k.art_id, c.d, e.eod
      |  FROM keys k CROSS JOIN cal c
      |  LEFT JOIN eod e ON e.tienda_id = k.tienda_id
      |    AND e.art_id = k.art_id AND e.d = c.d),
      |filled AS (
      |  SELECT *,
      |    COALESCE(last_value(eod IGNORE NULLS) OVER wf, 0) AS eod_f
      |  FROM dense
      |  WINDOW wf AS (PARTITION BY tienda_id, art_id ORDER BY d
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |sodt AS (
      |  SELECT *, COALESCE(lag(eod_f) OVER (
      |    PARTITION BY tienda_id, art_id ORDER BY d), 0) AS sod
      |  FROM filled)""".stripMargin

  /** q13 — R7 change-point compression of the dense SOD series: keep a row
    * iff SOD differs from the previous value, with the previous value
    * DEFAULTING TO 0 (reference seed_stock_points.py:119-127 also emits a
    * first-day row when the value is 0; we suppress those zero baselines so
    * the series is a pure delta encoding — "no point yet" ≡ 0 on read, and
    * incremental reprocessing windows (Pipelines.refreshStockPoints) emit
    * byte-identical points regardless of where the window starts).
    */
  def stockPoints(spark: SparkSession, dir: String): DataFrame =
    // cached: q13 returns it and q14's as-of lookup re-reads it — one
    // materialization of the whole replay lineage serves both (the
    // parametric stockPointsFrom used by the pipelines stays uncached)
    stockPointsFrom(Tables.ledger(spark, dir)).cache()

  /** Parametric form over any ledger frame. */
  def stockPointsFrom(ledger: DataFrame): DataFrame = {
    val wFill = Window.partitionBy(col("tienda_id"), col("art_id"))
      .orderBy(col("d"))
    denseSodFrom(ledger)
      .withColumn("prev_sod", lag(col("sod"), 1).over(wFill))
      .filter(col("sod") =!= coalesce(col("prev_sod"), lit(0L)))
      .select(col("tienda_id").as("store_id"), col("art_id"),
        col("d").cast("timestamp").as("point_date"),
        col("sod").as("sod_stock"))
      .orderBy(col("store_id"), col("art_id"), col("point_date"))
  }

  val stockPointsSql: String =
    s"""WITH $denseSodCte,
      |cp AS (
      |  SELECT *, lag(sod) OVER (
      |    PARTITION BY tienda_id, art_id ORDER BY d) AS prev_sod
      |  FROM sodt)
      |SELECT tienda_id AS store_id, art_id,
      |  CAST(d AS TIMESTAMP) AS point_date, sod AS sod_stock
      |FROM cp
      |WHERE sod != COALESCE(prev_sod, 0)
      |ORDER BY store_id, art_id, point_date""".stripMargin

  /** q14 — J9 as-of lookup: latest stock point per (store, SKU) at or before
    * a date, via the reference's exact window shape
    * (update_stock_points.py:47-69).
    */
  def asOfLookup(spark: SparkSession, dir: String): DataFrame = {
    val asOf = lit("2024-01-20").cast("timestamp")
    val w = Window.partitionBy(col("store_id"), col("art_id"))
      .orderBy(col("point_date").desc)
    stockPoints(spark, dir)
      .filter(col("point_date") <= asOf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("store_id"), col("art_id"), col("point_date"),
        col("sod_stock"))
      .orderBy(col("store_id"), col("art_id"))
  }

  /** q54 — SCD2 validity intervals from the change-point series: each
    * stock point's value is valid over [point_date, next point_date), the
    * latest point per key is open-ended (`valid_to` null, `is_current`).
    * One `lead` over the same (store, SKU) partitioning the series
    * already has — the standard warehouse "type-2 dimension" read shape,
    * derived on demand instead of stored (storing both is redundant: the
    * interval IS the next change point).
    */
  def stockIntervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("store_id"), col("art_id"))
      .orderBy(col("point_date"))
    stockPoints(spark, dir)
      .withColumn("valid_to", lead(col("point_date"), 1).over(w))
      .select(col("store_id"), col("art_id"),
        col("point_date").as("valid_from"), col("valid_to"),
        col("sod_stock"), col("valid_to").isNull.as("is_current"))
      .orderBy(col("store_id"), col("art_id"), col("valid_from"))
  }

  val stockIntervalsSql: String =
    s"""WITH $denseSodCte,
      |cp AS (
      |  SELECT *, lag(sod) OVER (
      |    PARTITION BY tienda_id, art_id ORDER BY d) AS prev_sod
      |  FROM sodt),
      |points AS (
      |  SELECT tienda_id AS store_id, art_id,
      |    CAST(d AS TIMESTAMP) AS point_date, sod AS sod_stock
      |  FROM cp WHERE sod != COALESCE(prev_sod, 0))
      |SELECT store_id, art_id, point_date AS valid_from,
      |  lead(point_date) OVER (PARTITION BY store_id, art_id
      |                         ORDER BY point_date) AS valid_to,
      |  sod_stock,
      |  lead(point_date) OVER (PARTITION BY store_id, art_id
      |                         ORDER BY point_date) IS NULL AS is_current
      |FROM points
      |ORDER BY store_id, art_id, valid_from""".stripMargin

  val asOfLookupSql: String =
    s"""WITH $denseSodCte,
      |cp AS (
      |  SELECT *, lag(sod) OVER (
      |    PARTITION BY tienda_id, art_id ORDER BY d) AS prev_sod
      |  FROM sodt),
      |points AS (
      |  SELECT tienda_id AS store_id, art_id,
      |    CAST(d AS TIMESTAMP) AS point_date, sod AS sod_stock
      |  FROM cp WHERE sod != COALESCE(prev_sod, 0)),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY store_id, art_id ORDER BY point_date DESC) AS rn
      |  FROM points WHERE point_date <= TIMESTAMP '2024-01-20')
      |SELECT store_id, art_id, point_date, sod_stock
      |FROM ranked WHERE rn = 1
      |ORDER BY store_id, art_id""".stripMargin

  /** q15 — R8/J7/A8 reconciliation: the window-replay's final balance per
    * SKU vs an independent "production stock" formulation (last absolute
    * snapshot + deltas after it), full-outer joined with zero defaults and
    * summarized (reference stock_points_helpers.py:44-79). mismatch_skus
    * must be 0 — the two formulations are differential tests of each other.
    */
  def reconcile(spark: SparkSession, dir: String): DataFrame = {
    val ledger = Tables.ledger(spark, dir)
    // simulated: last per-event balance per key
    val wLast = Window.partitionBy(col("tienda_id"), col("art_id"))
      .orderBy(col("fecha").desc, col("id_origen").desc)
    val sim = withBalance(ledger)
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("tienda_id"), col("art_id"), col("balance").as("sim_stock"))
    // production: latest absolute + sum of deltas strictly after it
    val lastAbs = ledger.filter(col("is_absolute"))
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("tienda_id").as("a_tid"), col("art_id").as("a_art"),
        col("fecha").as("a_fecha"), col("id_origen").as("a_id"),
        col("abs_stock_after").as("a_abs"))
    val prod = ledger.filter(!col("is_absolute"))
      .join(lastAbs,
        col("tienda_id") === col("a_tid") && col("art_id") === col("a_art"),
        "left")
      .withColumn("after_reset",
        col("a_fecha").isNull || col("fecha") > col("a_fecha") ||
          (col("fecha") === col("a_fecha") && col("id_origen") > col("a_id")))
      .groupBy(col("tienda_id"), col("art_id"))
      .agg(
        (max(coalesce(col("a_abs"), lit(0L))) +
          sum(when(col("after_reset"), col("delta_cantidad")).otherwise(lit(0L))))
          .as("prod_stock"))
    // abs-only keys never appear in prod's delta scan — union them in
    val absOnly = lastAbs.join(prod,
        col("a_tid") === prod("tienda_id") && col("a_art") === prod("art_id"),
        "left_anti")
      .select(col("a_tid").as("tienda_id"), col("a_art").as("art_id"),
        col("a_abs").as("prod_stock"))
    val prodAll = prod.unionByName(absOnly)
    sim.join(prodAll, Seq("tienda_id", "art_id"), "full_outer")
      .na.fill(0L, Seq("sim_stock", "prod_stock"))
      .withColumn("diff", col("sim_stock") - col("prod_stock"))
      .agg(
        count(lit(1)).as("total_skus"),
        count(when(col("diff") =!= 0, lit(1))).as("mismatch_skus"),
        max(abs(col("diff"))).as("max_abs_diff"))
  }

  val reconcileSql: String =
    s"""WITH $ledgerPrelude,
      |$balanceCte,
      |sim AS (
      |  SELECT tienda_id, art_id, balance AS sim_stock FROM (
      |    SELECT tienda_id, art_id, balance,
      |      row_number() OVER (PARTITION BY tienda_id, art_id
      |                         ORDER BY fecha DESC, id_origen DESC) AS rn
      |    FROM bal) t WHERE rn = 1),
      |last_abs AS (
      |  SELECT tienda_id AS a_tid, art_id AS a_art, fecha AS a_fecha,
      |    id_origen AS a_id, abs_stock_after AS a_abs FROM (
      |    SELECT *, row_number() OVER (PARTITION BY tienda_id, art_id
      |                                 ORDER BY fecha DESC, id_origen DESC) AS rn
      |    FROM ledger WHERE is_absolute) t WHERE rn = 1),
      |prod AS (
      |  SELECT l.tienda_id, l.art_id,
      |    CAST(max(COALESCE(a.a_abs, 0)) +
      |      sum(CASE WHEN a.a_fecha IS NULL OR l.fecha > a.a_fecha
      |                 OR (l.fecha = a.a_fecha AND l.id_origen > a.a_id)
      |               THEN l.delta_cantidad ELSE 0 END) AS BIGINT) AS prod_stock
      |  FROM ledger l
      |  LEFT JOIN last_abs a ON l.tienda_id = a.a_tid AND l.art_id = a.a_art
      |  WHERE NOT l.is_absolute
      |  GROUP BY l.tienda_id, l.art_id),
      |abs_only AS (
      |  SELECT a.a_tid AS tienda_id, a.a_art AS art_id, a.a_abs AS prod_stock
      |  FROM last_abs a
      |  WHERE NOT EXISTS (SELECT 1 FROM prod p
      |    WHERE p.tienda_id = a.a_tid AND p.art_id = a.a_art)),
      |prod_all AS (SELECT * FROM prod UNION ALL SELECT * FROM abs_only),
      |cmp AS (
      |  SELECT COALESCE(s.sim_stock, 0) - COALESCE(p.prod_stock, 0) AS diff
      |  FROM sim s FULL OUTER JOIN prod_all p
      |    ON s.tienda_id = p.tienda_id AND s.art_id = p.art_id)
      |SELECT count(*) AS total_skus,
      |  count(CASE WHEN diff != 0 THEN 1 END) AS mismatch_skus,
      |  CAST(max(abs(diff)) AS BIGINT) AS max_abs_diff
      |FROM cmp""".stripMargin
}
