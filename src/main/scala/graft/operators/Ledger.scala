package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stock-movement ledger operators (reference etl_inventory/).
  *
  * The 7-branch movement extraction (U1,
  * etl_inventory/sql/extract_stock_movements.sql) is re-expressed over the
  * `events` fixture: each event_type feeds a branch with its own CASE
  * sign/label logic (F7), dimension joins (J3) and one theta join (J4); the
  * re-filter (U2, extract_filter_raw_stock_movements.sql) layers the
  * earliest-cancel dedup (J5) and the EXISTS guard (J6) on top.
  *
  * Scale notes: branches are parallel scans of the same parquet (Spark reads
  * it once per branch but each scan prunes to its predicate; at 100 TB these
  * would be partition-pruned by event_type). Dimension joins are
  * broadcast — no shuffle. The union-distinct is one shuffle; the window
  * dedup re-uses the art_id partitioning.
  */
object Ledger {

  private def evPrepared(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      (col("user_id") % 3).cast("int").as("tid"),
      floor(col("value")).cast("long").as("q"),
      regexp_extract(col("props"), "([0-9]+)", 1).cast("int").as("k"))

  private val outCols: Seq[String] = Seq(
    "id_origen", "art_id", "tienda_id", "fecha", "tipo_movimiento",
    "is_absolute", "delta_cantidad", "abs_stock_after")

  private def branch(ev: DataFrame, tipo: Column, isAbs: Column,
                     delta: Column, absAfter: Column): DataFrame =
    ev.select(
      col("event_id").as("id_origen"),
      col("user_id").as("art_id"),
      col("tid").as("tienda_id"),
      col("ts").as("fecha"),
      tipo.as("tipo_movimiento"),
      isAbs.as("is_absolute"),
      delta.as("delta_cantidad"),
      absAfter.as("abs_stock_after"))

  private val nullLong = lit(null).cast("long")

  /** U1: 6-branch UNION (distinct) movement ledger with F7 CASE sign/label
    * logic, J3 equi joins to a users dimension, and the J4 theta join
    * (reference extract_stock_movements.sql:6-233; theta join `:65`).
    */
  def unionLedger(spark: SparkSession, dir: String): DataFrame = {
    val ev = evPrepared(spark, dir)
    val users = ev.select(col("user_id")).distinct()
    val stores = ev.select(col("tid").as("store_id")).distinct()
    val even = col("k") % 2 === 0

    // sales: cancel reverses the sign (extract_stock_movements.sql:9-22)
    val venta = branch(
      ev.filter(col("event_type") === "click")
        .join(broadcast(users), Seq("user_id"), "inner"),
      when(even, "Venta").otherwise("Venta Cancelada"),
      lit(0), when(even, -col("q")).otherwise(col("q")), nullLong)

    val compra = branch(
      ev.filter(col("event_type") === "purchase")
        .join(broadcast(users), Seq("user_id"), "inner"),
      when(even, "Compra").otherwise("Compra Cancelada"),
      lit(0), when(even, col("q")).otherwise(-col("q")), nullLong)

    val salida = branch(
      ev.filter(col("event_type") === "signup"),
      when(even, "Traspaso Salida").otherwise("Traspaso Salida Cancelado"),
      lit(0), when(even, -col("q")).otherwise(col("q")), nullLong)

    // transfer-in: theta join — origin store differs from the configured one
    // (reference extract_stock_movements.sql:65 `ON t.sucOri != n.sucId`)
    val entrada = branch(
      ev.filter(col("event_type") === "view")
        .join(broadcast(stores),
          col("tid") =!= col("store_id") && col("store_id") === 0, "inner"),
      lit("Traspaso Entrada"), lit(0), col("q"), nullLong)

    val ajuste = branch(
      ev.filter(col("event_type") === "error" && col("k") < 50),
      lit("Ajuste de Inventario"), lit(1), nullLong, col("q"))

    val importar = branch(
      ev.filter(col("event_type") === "error" && col("k") >= 50),
      lit("Importar Articulo"), lit(0), col("q"), nullLong)

    Seq(venta, compra, salida, entrada, ajuste, importar)
      .reduce(_ unionByName _)
      .distinct() // bare SQL UNION = distinct semantics (SURVEY.md §2.6 U1)
      // cached: q08 returns this frame and q09's re-filter reads it from
      // SIX branches (plain/salida/cancel/keys/entrada/ajuste) — uncached,
      // every branch replays the whole 6-way union-of-scans subplan
      .cache()
  }

  /** Shared DuckDB CTE prelude defining `ledger` (same six branches). */
  val ledgerCte: String =
    """ev AS (SELECT event_id, ts, user_id, event_type,
      |  CAST(user_id % 3 AS INTEGER) AS tid,
      |  CAST(FLOOR(value) AS BIGINT) AS q,
      |  CAST(regexp_extract(props, '([0-9]+)', 1) AS INTEGER) AS k
      |  FROM events),
      |users AS (SELECT DISTINCT user_id FROM events),
      |stores AS (SELECT DISTINCT CAST(user_id % 3 AS INTEGER) AS store_id FROM events),
      |ledger AS (
      |  SELECT e.event_id AS id_origen, e.user_id AS art_id, e.tid AS tienda_id,
      |    e.ts AS fecha,
      |    CASE WHEN e.k % 2 = 0 THEN 'Venta' ELSE 'Venta Cancelada' END AS tipo_movimiento,
      |    0 AS is_absolute,
      |    CASE WHEN e.k % 2 = 0 THEN -e.q ELSE e.q END AS delta_cantidad,
      |    CAST(NULL AS BIGINT) AS abs_stock_after
      |  FROM ev e JOIN users u ON e.user_id = u.user_id
      |  WHERE e.event_type = 'click'
      |  UNION
      |  SELECT e.event_id, e.user_id, e.tid, e.ts,
      |    CASE WHEN e.k % 2 = 0 THEN 'Compra' ELSE 'Compra Cancelada' END,
      |    0,
      |    CASE WHEN e.k % 2 = 0 THEN e.q ELSE -e.q END,
      |    CAST(NULL AS BIGINT)
      |  FROM ev e JOIN users u ON e.user_id = u.user_id
      |  WHERE e.event_type = 'purchase'
      |  UNION
      |  SELECT e.event_id, e.user_id, e.tid, e.ts,
      |    CASE WHEN e.k % 2 = 0 THEN 'Traspaso Salida' ELSE 'Traspaso Salida Cancelado' END,
      |    0,
      |    CASE WHEN e.k % 2 = 0 THEN -e.q ELSE e.q END,
      |    CAST(NULL AS BIGINT)
      |  FROM ev e WHERE e.event_type = 'signup'
      |  UNION
      |  SELECT e.event_id, e.user_id, e.tid, e.ts,
      |    'Traspaso Entrada', 0, e.q, CAST(NULL AS BIGINT)
      |  FROM ev e JOIN stores s ON e.tid != s.store_id AND s.store_id = 0
      |  WHERE e.event_type = 'view'
      |  UNION
      |  SELECT e.event_id, e.user_id, e.tid, e.ts,
      |    'Ajuste de Inventario', 1, CAST(NULL AS BIGINT), e.q
      |  FROM ev e WHERE e.event_type = 'error' AND e.k < 50
      |  UNION
      |  SELECT e.event_id, e.user_id, e.tid, e.ts,
      |    'Importar Articulo', 0, e.q, CAST(NULL AS BIGINT)
      |  FROM ev e WHERE e.event_type = 'error' AND e.k >= 50
      |)""".stripMargin

  def unionLedgerQuery(spark: SparkSession, dir: String): DataFrame =
    unionLedger(spark, dir).orderBy(col("id_origen"))

  val unionLedgerSql: String =
    s"""WITH $ledgerCte
      |SELECT * FROM ledger ORDER BY id_origen""".stripMargin

  /** U2 + J5 + J6: union-all re-filter feeding the balance replay (reference
    * extract_filter_raw_stock_movements.sql): plain delta branches pass
    * through; `Traspaso Salida Cancelado` keeps only the EARLIEST cancel per
    * (art_id, tienda_id) (J5, `:52-74`) and only when a prior matching
    * non-cancel exists (J6 EXISTS → inequality left-semi join, `:79-91`);
    * ordered by (art_id, fecha, id_origen) — R2 with explicit tiebreaker.
    */
  def refilterLedger(spark: SparkSession, dir: String): DataFrame = {
    val ledger = unionLedger(spark, dir)
    val plain = ledger.filter(col("tipo_movimiento").isin(
      "Venta", "Venta Cancelada", "Compra", "Compra Cancelada",
      "Importar Articulo"))
    val salida = ledger.filter(col("tipo_movimiento") === "Traspaso Salida")
    val wFirst = Window.partitionBy(col("art_id"), col("tienda_id"))
      .orderBy(col("fecha"), col("id_origen"))
    val cancelFirst = ledger
      .filter(col("tipo_movimiento") === "Traspaso Salida Cancelado")
      .withColumn("rn", row_number().over(wFirst))
      .filter(col("rn") === 1).drop("rn")
    val salidaKeys = salida.select(
      col("art_id").as("s_art"), col("tienda_id").as("s_tid"),
      col("fecha").as("s_fecha"))
    val cancelOk = cancelFirst.join(salidaKeys,
      col("art_id") === col("s_art") && col("tienda_id") === col("s_tid") &&
        col("s_fecha") <= col("fecha"),
      "left_semi")
    val entrada = ledger.filter(col("tipo_movimiento") === "Traspaso Entrada")
    val ajuste = ledger.filter(col("tipo_movimiento") === "Ajuste de Inventario")
    Seq(plain, salida, cancelOk, entrada, ajuste)
      .reduce(_ unionByName _) // UNION ALL — no distinct (SURVEY.md §2.6 U2)
      .orderBy(col("art_id"), col("fecha"), col("id_origen"))
  }

  val refilterLedgerSql: String =
    s"""WITH $ledgerCte,
      |plain AS (SELECT * FROM ledger WHERE tipo_movimiento IN
      |  ('Venta','Venta Cancelada','Compra','Compra Cancelada','Importar Articulo')),
      |salida AS (SELECT * FROM ledger WHERE tipo_movimiento = 'Traspaso Salida'),
      |cancel_first AS (
      |  SELECT id_origen, art_id, tienda_id, fecha, tipo_movimiento,
      |         is_absolute, delta_cantidad, abs_stock_after
      |  FROM (SELECT l.*, row_number() OVER (
      |          PARTITION BY art_id, tienda_id ORDER BY fecha, id_origen) AS rn
      |        FROM ledger l WHERE tipo_movimiento = 'Traspaso Salida Cancelado') t
      |  WHERE rn = 1),
      |cancel_ok AS (
      |  SELECT c.* FROM cancel_first c
      |  WHERE EXISTS (SELECT 1 FROM salida s
      |    WHERE s.art_id = c.art_id AND s.tienda_id = c.tienda_id
      |      AND s.fecha <= c.fecha)),
      |entrada AS (SELECT * FROM ledger WHERE tipo_movimiento = 'Traspaso Entrada'),
      |ajuste AS (SELECT * FROM ledger WHERE tipo_movimiento = 'Ajuste de Inventario')
      |SELECT * FROM plain
      |UNION ALL SELECT * FROM salida
      |UNION ALL SELECT * FROM cancel_ok
      |UNION ALL SELECT * FROM entrada
      |UNION ALL SELECT * FROM ajuste
      |ORDER BY art_id, fecha, id_origen""".stripMargin

  /** A6/J5 in the reference's original groupBy-MIN + join-back shape
    * (extract_filter_raw_stock_movements.sql:53-69): earliest event per
    * (user, day) joined back on key + min timestamp.
    */
  def earliestPerDay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).as("e")
    val mins = Tables.events(spark, dir)
      .groupBy(col("user_id").as("m_uid"), to_date(col("ts")).as("d"))
      .agg(min(col("ts")).as("min_ts"))
    ev.join(mins,
        col("e.user_id") === col("m_uid") && col("e.ts") === col("min_ts"),
        "inner")
      .select(col("e.event_id").as("id_origen"),
        col("e.user_id").as("art_id"),
        col("e.ts").as("fecha"),
        col("e.event_type").as("tipo_movimiento"),
        col("e.value").as("valor"))
      .orderBy(col("id_origen"))
  }

  val earliestPerDaySql: String =
    """SELECT e.event_id AS id_origen, e.user_id AS art_id, e.ts AS fecha,
      |  e.event_type AS tipo_movimiento, e.value AS valor
      |FROM events e
      |JOIN (SELECT user_id, CAST(ts AS DATE) AS d, min(ts) AS min_ts
      |      FROM events GROUP BY user_id, CAST(ts AS DATE)) m
      |  ON e.user_id = m.user_id AND e.ts = m.min_ts
      |ORDER BY id_origen""".stripMargin
}
