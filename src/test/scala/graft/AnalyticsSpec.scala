package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** OLAP-surface operators: rank-quantile correctness against direct array
  * indexing, rollup level consistency, pivot row/column totals.
  */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rank-based quantiles equal direct sorted-array indexing per group") {
    val got = Analytics.tokenQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val counts = Tables.documents(spark, dir)
      .select(col("lang"),
        size(graft.functions.TextFns.toks(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    for ((lang, vals) <- counts) {
      def q(p: Double) = vals(math.floor((vals.size - 1) * p).toInt)
      assert(got(lang) == ((q(0.5), q(0.9), q(0.99))), s"lang=$lang")
    }
  }

  test("rollup levels are mutually consistent") {
    val rows = Analytics.langSourceRollup(spark, dir).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3)))
    val leaf = rows.filter(r => r._1.isDefined && r._2.isDefined)
    val langTot = rows.filter(r => r._1.isDefined && r._2.isEmpty)
    val grand = rows.filter(r => r._1.isEmpty && r._2.isEmpty)
    assert(grand.length == 1)
    assert(grand.head._3 == leaf.map(_._3).sum)
    assert(grand.head._4 == leaf.map(_._4).sum)
    for ((Some(lang), None, n, chars) <- langTot) {
      val l = leaf.filter(_._1.contains(lang))
      assert(n == l.map(_._3).sum && chars == l.map(_._4).sum, s"lang=$lang")
    }
  }

  test("cube contains the rollup and its slices are mutually consistent") {
    val cube = Analytics.langSourceCube(spark, dir).collect()
      .map(r => ((Option(r.get(0)), Option(r.get(1)), r.getLong(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    val detail = cube.filter(_._1._3 == 0L)
    // grand total (gid=3) == sum of all detail cells
    val grand = cube(((None, None, 3L)))
    assert(grand._1 == detail.values.map(_._1).sum)
    assert(grand._2 == detail.values.map(_._2).sum)
    // the source-marginal slice (gid=1) aggregates detail rows per lang
    val perLang = detail.groupBy(_._1._1)
      .map { case (l, m) => l -> ((m.values.map(_._1).sum, m.values.map(_._2).sum)) }
    perLang.foreach { case (l, want) =>
      assert(cube(((l, None, 1L))) == want, s"lang $l")
    }
  }

  test("pivot cells sum to the total event count") {
    val rows = Analytics.eventTypePivot(spark, dir).collect()
    val cells = rows.map(r => (1 to 5).map(r.getLong(_)).sum).sum
    val total = Tables.events(spark, dir).count()
    assert(cells == total)
  }

  test("linear interpolation: observed rows verbatim, gaps linear, edges flat") {
    val sql = spark.sqlContext
    import sql.implicits._
    // observations on days 3, 6, 7, 12 of a 1..15 calendar padded by a
    // second store (fixes the calendar span and exercises edge extension)
    def d(day: Int) = java.sql.Date.valueOf(f"2025-06-$day%02d")
    val sparse = Seq(
      (1, d(3), 30L), (1, d(6), 90L), (1, d(7), 10L), (1, d(12), 60L),
      (2, d(1), 5L), (2, d(15), 5L)
    ).toDF("tienda_id", "dia", "net")
    val rows = Analytics.interpolateFrom(sparse)
      .filter(col("tienda_id") === 1).orderBy(col("dia"))
      .collect().map(r => (r.getTimestamp(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length == 15)
    assert(rows.exists(!_._3), "no gap days — spec would be vacuous")
    val obs = rows.zipWithIndex.filter(_._1._3).map(_._2)
    // before the first / after the last observation: flat extension
    rows.take(obs.head).foreach { case (_, v, _) => assert(v == rows(obs.head)._2) }
    rows.drop(obs.last + 1).foreach { case (_, v, _) => assert(v == rows(obs.last)._2) }
    // inside each gap the values are linear between the bracketing points
    obs.toSeq.sliding(2).filter(_.length == 2).foreach { case Seq(i, j) =>
      val (vi, vj) = (rows(i)._2, rows(j)._2)
      (i + 1 until j).foreach { k =>
        val want = vi + (vj - vi) * ((k - i).toDouble / (j - i).toDouble)
        assert(math.abs(rows(k)._2 - want) < 1e-9, s"gap row $k")
      }
    }
  }

  test("approx quantile tier tracks the exact tier at tolerance") {
    // labelCentroidsProd pattern: the production sketch path is not
    // oracle-checkable, so it is differentially bounded by the exact
    // tier. GK rank error at accuracy=10000 over ~170-doc groups is
    // sub-rank: the approx value must land within the group's exact
    // neighboring order statistics — enforced here as a 5% relative
    // envelope around the interpolated exact quantile, far wider than
    // the sketch's guarantee and far narrower than any group's spread.
    val exact = Analytics.tokenQuantilesCont(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Analytics.tokenQuantilesApprox(spark, dir).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (e50, e90, e99) = exact(r.getString(0))
      def ok(a: Double, e: Double) = math.abs(a - e) <= 0.05 * math.abs(e)
      assert(ok(r.getLong(1).toDouble, e50), s"p50 ${r.getString(0)}")
      assert(ok(r.getLong(2).toDouble, e90), s"p90 ${r.getString(0)}")
      assert(ok(r.getLong(3).toDouble, e99), s"p99 ${r.getString(0)}")
    }
  }

  test("rolling mean window is correct at series edges") {
    val rows = Analytics.rollingDailyNet(spark, dir)
      .filter(col("tienda_id") === 0).orderBy(col("dia"))
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    // day k (0-based) averages over min(k+1, 7) trailing days
    rows.zipWithIndex.foreach { case ((_, ma), k) =>
      val frame = rows.slice(math.max(0, k - 6), k + 1).map(_._1)
      assert(ma == frame.sum.toDouble / frame.length, s"day $k")
    }
  }
}
