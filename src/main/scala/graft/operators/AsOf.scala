package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic backward as-of join — the canonical time-series operator Spark
  * has no built-in for (the reference's as-of READ, J9 in
  * etl_inventory/update_stock_points.py:47-69, is the degenerate
  * single-probe-date case; this is the full two-table form).
  *
  * Formulation ((a)-tier per the extension ladder — composed from existing
  * ops, no custom plan node needed): union the tagged sides, then one
  * running `last(payload, ignoreNulls)` window per key ordered by
  * (ts, side) fills every left row with the latest right payload at or
  * before its timestamp.
  *
  * Scale design: ONE shuffle on the join key and one sort — same cost as
  * the sort-merge join Spark would plan for an equi-join, with no range
  * condition blow-up (a naive `l.ts >= r.ts` join explodes to O(|L|·|R|)
  * per key before aggregation). Skewed keys behave like any window — AQE
  * cannot split a single key, so a pathological key needs salting by
  * coarse time bucket (carry the last value across bucket boundaries);
  * not needed at fixture scale.
  *
  * Right-side ties on (key, ts) must be resolved by the caller (e.g.
  * pre-aggregate to one row per key+ts) — as-of is only well-defined for a
  * keyed series. Ties between a left and right row at the SAME ts resolve
  * to "right visible" (ts <= leftTs, inclusive), matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`.
  */
object AsOf {

  /** For each `left` row, attach `payload` columns from the latest `right`
    * row with `right(ts) <= left(ts)` and equal `key`; nulls when no such
    * row exists. Column sets of the two sides must be disjoint apart from
    * `key` and `ts`.
    *
    * The payload travels as ONE nullable struct: a right row contributes a
    * non-null struct even when every payload FIELD is null, so
    * `last(ignoreNulls)` picks whole right rows atomically — a latest row
    * with a null value correctly yields null (not an older non-null value),
    * and multi-column payloads never mix fields from different right rows.
    * Right rows with a null `ts` are dropped to match SQL comparison
    * semantics (`left.ts >= NULL` is never true).
    */
  def joinBackward(left: DataFrame, right: DataFrame, key: Seq[String],
                   ts: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p).copy(name = p)))
    val l = left
      .select((key.map(col) ++ Seq(col(ts)) ++
        Seq(lit(null).cast(payloadType).as("__p")) ++
        leftCols.filterNot(c => key.contains(c) || c == ts).map(col) ++
        Seq(lit(1).as("__side"))): _*)
    val r = right
      .filter(col(ts).isNotNull)
      .select((key.map(col) ++ Seq(col(ts)) ++
        Seq(struct(payload.map(col): _*).as("__p")) ++
        leftCols.filterNot(c => key.contains(c) || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"))): _*)
    // right rows sort before left rows at equal ts => inclusive as-of
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.map(p => col("__p").getField(p).as(p))): _*)
  }

  /** q38 — as-of join over the events fixture: every `click` is annotated
    * with the user's latest `error` snapshot (`floor(value)`) at or before
    * the click — "stock level known at sale time". The right side is
    * pre-deduped to one row per (user, ts) (max snap) so the as-of value
    * is well-defined. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  def asOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val snaps = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), floor(col("value")).cast("long").as("snap"))
      .groupBy(col("user_id"), col("ts")).agg(max(col("snap")).as("snap"))
    joinBackward(clicks, snaps, Seq("user_id"), "ts", Seq("snap"))
      .select(col("event_id"), col("user_id"), col("ts"), col("snap"))
      .orderBy(col("event_id"))
  }

  val asOfJoinSql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |snaps AS (
      |  SELECT user_id, ts, max(CAST(FLOOR(value) AS BIGINT)) AS snap
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, c.ts, s.snap
      |FROM clicks c ASOF LEFT JOIN snaps s
      |  ON c.user_id = s.user_id AND c.ts >= s.ts
      |ORDER BY c.event_id""".stripMargin
}
