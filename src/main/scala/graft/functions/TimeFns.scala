package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timezone normalization (F12). The reference pins "now" to
  * America/Mexico_City local midnight before comparing stock snapshots
  * (etl_inventory/stock_points_helpers.py:7-8 —
  * `pd.Timestamp.now(tz).normalize()`). The oracle harness pins the
  * session to UTC (documented deviation, SURVEY §1.2), so these helpers
  * are the production seam a port would otherwise re-invent, not part of
  * any oracle-checked query.
  */
object TimeFns {

  val MexicoCity = "America/Mexico_City"

  /** The UTC instant of the local midnight of `ts`'s day in `tz` — the
    * Spark twin of pandas' `Timestamp.now(tz).normalize()`: render the
    * instant on the zone's wall clock, truncate to the day, convert the
    * wall-clock midnight back to its UTC instant.
    */
  def localMidnight(ts: Column, tz: String): Column =
    to_utc_timestamp(date_trunc("DAY", from_utc_timestamp(ts, tz)), tz)

  /** The local calendar date of a UTC instant in `tz` — the reference's
    * day key for "today's" stock comparison window
    * (stock_points_helpers.py:30-31 compares [today, tomorrow)).
    */
  def localDate(ts: Column, tz: String): Column =
    to_date(from_utc_timestamp(ts, tz))
}
