package graft

import graft.functions.TimeFns
import org.apache.spark.sql.functions._

/** F12 timezone normalization — the reference's
  * `pd.Timestamp.now("America/Mexico_City").normalize()` twin
  * (stock_points_helpers.py:7-8). The session (like the harness) runs
  * UTC; the helper must still land on the ZONE's midnight.
  */
class TimeFnsSpec extends SparkSpec {

  test("localMidnight/localDate pin a UTC instant to the zone's day") {
    import spark.implicits._
    // 2025-06-15 03:00 UTC is 2025-06-14 21:00 in Mexico City (fixed
    // UTC-6; Mexico abolished DST in 2022) → the local midnight of that
    // instant's local day is 2025-06-14 00:00 local = 06:00 UTC.
    val out = Seq("2025-06-15 03:00:00").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
      .select(
        TimeFns.localMidnight(col("ts"), TimeFns.MexicoCity)
          .cast("string").as("m"),
        TimeFns.localDate(col("ts"), TimeFns.MexicoCity)
          .cast("string").as("d"))
      .head()
    assert(out.getString(0) == "2025-06-14 06:00:00")
    assert(out.getString(1) == "2025-06-14")

    // an instant already past local midnight stays on its own day
    val noon = Seq("2025-06-15 19:00:00").toDF("s")
      .select(TimeFns.localDate(to_timestamp(col("s")), TimeFns.MexicoCity)
        .cast("string"))
      .head().getString(0)
    assert(noon == "2025-06-15")
  }
}
