package graft

import java.nio.file.Files
import java.time.LocalDate

import graft.sources.{Csv, Jdbc}
import org.apache.spark.sql.functions._

/** CSV side-channel (S11–S13) and JDBC window-builder (S4/S5) semantics. */
class SourcesSpec extends SparkSpec {

  // --- JDBC batch windows (pure logic) ------------------------------------

  test("monthly windows form a disjoint half-open cover of the range") {
    val from = LocalDate.parse("2024-10-26")
    val to = LocalDate.parse("2025-01-15")
    val ws = Jdbc.monthlyWindows(from, to)
    assert(ws.head._1 == from)
    assert(ws.last._2 == to.plusDays(1))
    // adjacent windows chain exactly: no gap, no overlap
    ws.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi == lo2)
      case _ =>
    }
    assert(ws.size == 4) // oct(part), nov, dec, jan(part)
  }

  test("daily windows cover every day exactly once") {
    val ws = Jdbc.dailyWindows(LocalDate.parse("2024-01-30"), LocalDate.parse("2024-02-02"))
    assert(ws == Seq(
      (LocalDate.parse("2024-01-30"), LocalDate.parse("2024-01-31")),
      (LocalDate.parse("2024-01-31"), LocalDate.parse("2024-02-01")),
      (LocalDate.parse("2024-02-01"), LocalDate.parse("2024-02-02")),
      (LocalDate.parse("2024-02-02"), LocalDate.parse("2024-02-03"))))
  }

  test("window predicates are disjoint half-open ranges") {
    val ps = Jdbc.windowPredicates("fecha",
      Jdbc.dailyWindows(LocalDate.parse("2024-01-01"), LocalDate.parse("2024-01-02")))
    assert(ps.toSeq == Seq(
      "fecha >= '2024-01-01' AND fecha < '2024-01-02'",
      "fecha >= '2024-01-02' AND fecha < '2024-01-03'"))
  }

  // --- CSV side-channels ---------------------------------------------------

  test("dedup-append keeps first occurrence per uniq key and is idempotent") {
    val sql = spark.sqlContext
    import sql.implicits._
    val path = Files.createTempDirectory("graft-csv").toString + "/log"

    val b1 = Seq(("k1", "a"), ("k2", "b")).toDF("uniq", "detail")
    assert(Csv.dedupAppend(spark, path, b1) == 2)

    // k2 re-detected with different detail → existing row must win;
    // k3 is new → appended
    val b2 = Seq(("k2", "CHANGED"), ("k3", "c")).toDF("uniq", "detail")
    assert(Csv.dedupAppend(spark, path, b2) == 3)
    val rows = Csv.readAllStrings(spark, path, Seq("uniq", "detail"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows == Map("k1" -> "a", "k2" -> "b", "k3" -> "c"))

    // replaying the same batch changes nothing
    assert(Csv.dedupAppend(spark, path, b2) == 3)
    assert(Csv.readAllStrings(spark, path, Seq("uniq", "detail")).count() == 3)
  }

  test("all-strings read fills missing values with empty string") {
    val sql = spark.sqlContext
    import sql.implicits._
    val path = Files.createTempDirectory("graft-csv").toString + "/s"
    Seq(("x", null: String), ("y", "v")).toDF("uniq", "detail")
      .write.option("header", "true").csv(path)
    val back = Csv.readAllStrings(spark, path, Seq("uniq", "detail"))
    assert(back.filter(col("detail").isNull).isEmpty)
    assert(back.filter(col("uniq") === "x").first().getString(1) == "")
  }

  test("dq exclusion log round-trips through the CSV side-channel") {
    val path = Files.createTempDirectory("graft-csv").toString + "/dq"
    val excl = graft.operators.Dq.dqExclusions(spark, "/root/testdata/sf0.001")
      .select(col("store_id").cast("string"), col("art_id").cast("string"),
        col("hist_id").cast("string"), col("fecha_iso"), col("reason"), col("uniq"))
    val n1 = Csv.dedupAppend(spark, path, excl)
    assert(n1 == excl.count())
    // second detection run: byte-identical log
    assert(Csv.dedupAppend(spark, path, excl) == n1)
  }
}
