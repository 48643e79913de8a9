package graft

import java.sql.Timestamp
import graft.operators.Stock
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R4 running-balance-with-resets semantics (reference
  * etl_inventory/seed_stock_points.py:74-85) + R7 change-point round-trip
  * (seed_stock_points.py:119-127), differential-tested against a naive
  * in-memory fold.
  */
case class Ev(id_origen: Long, art_id: Long, tienda_id: Int,
              fecha: Timestamp, is_absolute: Boolean,
              delta_cantidad: Option[Long], abs_stock_after: Option[Long])

class StockSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(1704067200000L + s * 1000)

  private def ledgerDf(evs: Seq[Ev]): DataFrame =
    evs.toDF().withColumn("tipo_movimiento", lit("x"))

  /** The reference's replay loop, verbatim in Scala. A null-valued
    * absolute (out-of-contract input) resets to the last non-null
    * absolute or 0 — the semantics the window plan produces.
    */
  private def naiveFold(evs: Seq[Ev]): Map[(Int, Long), Seq[(Long, Long)]] =
    evs.groupBy(e => (e.tienda_id, e.art_id)).map { case (k, g) =>
      var running = 0L
      var lastAbs = 0L
      val out = g.sortBy(e => (e.fecha.getTime, e.id_origen)).map { e =>
        if (e.is_absolute) {
          lastAbs = e.abs_stock_after.getOrElse(lastAbs)
          running = lastAbs
        } else running += e.delta_cantidad.getOrElse(0L)
        (e.id_origen, running)
      }
      k -> out
    }

  private def check(evs: Seq[Ev]): Unit = {
    val got = Stock.withBalance(ledgerDf(evs))
      .select($"tienda_id", $"art_id", $"id_origen", $"balance")
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    val want = naiveFold(evs).view.mapValues(_.sortBy(_._1)).toMap
    assert(got == want)
  }

  test("delta-only sequence") {
    check(Seq(
      Ev(1, 10, 0, ts(1), false, Some(5), None),
      Ev(2, 10, 0, ts(2), false, Some(-3), None),
      Ev(3, 10, 0, ts(3), false, Some(7), None)))
  }

  test("absolute-first resets the seed") {
    check(Seq(
      Ev(1, 10, 0, ts(1), true, None, Some(100)),
      Ev(2, 10, 0, ts(2), false, Some(-3), None)))
  }

  test("absolute mid-stream snaps the balance") {
    check(Seq(
      Ev(1, 10, 0, ts(1), false, Some(5), None),
      Ev(2, 10, 0, ts(2), true, None, Some(50)),
      Ev(3, 10, 0, ts(3), false, Some(2), None),
      Ev(4, 10, 0, ts(4), true, None, Some(-7)),
      Ev(5, 10, 0, ts(5), false, Some(1), None)))
  }

  test("same-timestamp events break ties by id_origen") {
    check(Seq(
      Ev(2, 10, 0, ts(1), true, None, Some(9)),
      Ev(1, 10, 0, ts(1), false, Some(5), None),
      Ev(3, 10, 0, ts(1), false, Some(1), None)))
  }

  test("randomized differential vs naive fold") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val evs = (1 to 200).map { i =>
        val isAbs = rnd.nextInt(5) == 0
        Ev(i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(2),
          ts(rnd.nextInt(50).toLong), isAbs,
          if (isAbs) None else Some(rnd.nextInt(21).toLong - 10),
          if (isAbs) Some(rnd.nextInt(201).toLong - 100) else None)
      }
      check(evs)
    }
  }

  test("scalacheck: window plan == typed flatMapGroups fold == naive fold") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEv: Gen[Int => Ev] = for {
      art <- Gen.choose(0L, 3L)
      tid <- Gen.choose(0, 1)
      t <- Gen.choose(0L, 30L)
      isAbs <- Gen.prob(0.25)
      nullAbs <- Gen.prob(0.15) // out-of-contract: absolute with NULL value
      d <- Gen.choose(-10L, 10L)
      a <- Gen.choose(-50L, 50L)
    } yield (i: Int) =>
      Ev(i.toLong, art, tid, ts(t), isAbs,
        if (isAbs) None else Some(d),
        if (isAbs && !nullAbs) Some(a) else None)
    val genEvs = Gen.listOfN(60, genEv).map(_.zipWithIndex.map { case (f, i) => f(i + 1) })
    val prop = Prop.forAll(genEvs) { evs =>
      val df = ledgerDf(evs)
      val window = Stock.withBalance(df)
        .select($"tienda_id", $"art_id", $"id_origen", $"balance")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val typed = Stock.withBalanceTyped(df)
        .collect().map(b => (b.tienda_id, b.art_id, b.id_origen, b.balance)).toSet
      val naive = naiveFold(evs).flatMap { case ((tid, art), rows) =>
        rows.map { case (id, bal) => (tid, art, id, bal) }
      }.toSet
      window == naive && typed == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("change-point compression round-trips to the dense series") {
    // dense per-key daily series → compress → as-of expand → must equal dense
    val dense = Seq(
      (0, 10L, "2024-01-01", 5L), (0, 10L, "2024-01-02", 5L),
      (0, 10L, "2024-01-03", 8L), (0, 10L, "2024-01-04", 8L),
      (0, 10L, "2024-01-05", 0L),
      (1, 20L, "2024-01-01", 0L), (1, 20L, "2024-01-02", 0L))
      .toDF("store_id", "art_id", "d", "sod")
      .withColumn("d", to_date($"d"))
    val w = Window.partitionBy($"store_id", $"art_id").orderBy($"d")
    val points = dense
      .withColumn("prev", lag($"sod", 1).over(w))
      .filter($"prev".isNull || $"sod" =!= $"prev")
      .drop("prev")
    // expand: join each dense day to latest point <= day
    val expanded = dense.select($"store_id", $"art_id", $"d")
      .join(points.withColumnRenamed("d", "pd").withColumnRenamed("sod", "psod"),
        Seq("store_id", "art_id"))
      .filter($"pd" <= $"d")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"store_id", $"art_id", $"d").orderBy($"pd".desc)))
      .filter($"rn" === 1)
      .select($"store_id", $"art_id", $"d", $"psod".as("sod"))
    val a = dense.collect().map(r => (r.getInt(0), r.getLong(1), r.getDate(2).toString, r.getLong(3))).toSet
    val b = expanded.collect().map(r => (r.getInt(0), r.getLong(1), r.getDate(2).toString, r.getLong(3))).toSet
    assert(a == b)
    assert(points.count() == 4) // 3 change days for key (0,10), 1 for (1,20)
  }
}
