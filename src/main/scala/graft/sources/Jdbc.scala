package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC extraction builders (reference S1–S5). The harness has no MySQL,
  * so these are the config-level API: the pure window/predicate logic is
  * unit-tested, and [[read]] wires it into `spark.read.jdbc` unchanged.
  *
  * The key Spark-first upgrade over the reference: its per-window loop
  * (one serial query per month/day — etl_inventory/
  * seed_raw_stock_movements.py:38-60, update_raw_stock_movements.py:41-54)
  * becomes the `predicates` array of ONE jdbc read, so every window is a
  * partition and all windows extract in parallel. The per-store loop over
  * databases (etl_sales/extract.py:21-38) becomes a union of per-store
  * reads with the store literal stamped per branch (S6).
  */
object Jdbc {

  final case class Source(url: String, user: String, password: String,
                          driver: String = "com.mysql.cj.jdbc.Driver") {
    def properties: java.util.Properties = {
      val p = new java.util.Properties()
      p.setProperty("user", user)
      p.setProperty("password", password)
      p.setProperty("driver", driver)
      p
    }
  }

  /** S4: monthly half-open windows [start-of-month, start-of-next-month)
    * covering [from, to] — the seed batching.
    */
  def monthlyWindows(from: LocalDate, to: LocalDate): Seq[(LocalDate, LocalDate)] = {
    val first = from.withDayOfMonth(1)
    Iterator.iterate(first)(_.plusMonths(1))
      .takeWhile(!_.isAfter(to))
      .map { m0 =>
        val lo = if (m0.isBefore(from)) from else m0
        val hi0 = m0.plusMonths(1)
        val hi = if (hi0.isAfter(to.plusDays(1))) to.plusDays(1) else hi0
        (lo, hi)
      }
      .toSeq
  }

  /** S5: daily half-open windows [d, d+1) covering [from, to]. */
  def dailyWindows(from: LocalDate, to: LocalDate): Seq[(LocalDate, LocalDate)] =
    Iterator.iterate(from)(_.plusDays(1))
      .takeWhile(!_.isAfter(to))
      .map(d => (d, d.plusDays(1)))
      .toSeq

  /** P6-shaped predicate per window: `fecha >= lo AND fecha < hi` —
    * exactly one predicate matches any row, so the partitioned read is a
    * disjoint cover (no dup, no loss).
    */
  def windowPredicates(col: String, windows: Seq[(LocalDate, LocalDate)]): Array[String] =
    windows.map { case (lo, hi) => s"$col >= '$lo' AND $col < '$hi'" }.toArray

  /** S2/S3: one parallel jdbc read, one partition per window. */
  def read(spark: SparkSession, src: Source, table: String,
           timeCol: String, windows: Seq[(LocalDate, LocalDate)]): DataFrame =
    spark.read.jdbc(src.url, table, windowPredicates(timeCol, windows), src.properties)
}
