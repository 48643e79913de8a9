package graft

import graft.operators.{AsOf, Sessions, Sketch}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Event-shaping + sketch operators: as-of join semantics (backward,
  * inclusive ties, no-match nulls), gap sessionization boundaries, and the
  * KMV estimator's behavior on a known universe.
  */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before each left ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 10L, ts("2024-01-01 08:00:00")), // before any right row -> null
      (4L, 20L, ts("2024-01-01 10:00:00"))  // tie with right at same ts
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 100L),
      (10L, ts("2024-01-01 11:30:00"), 200L),
      (20L, ts("2024-01-01 10:00:00"), 300L) // equal ts: must be visible
    ).toDF("user_id", "ts", "snap")

    val out = AsOf.joinBackward(left, right, Seq("user_id"), "ts", Seq("snap"))
      .orderBy("event_id")
      .select("event_id", "snap")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

    assert(out(1L).contains(100L)) // 10:00 sees 09:00
    assert(out(2L).contains(200L)) // 12:00 sees 11:30
    assert(out(3L).isEmpty)        // nothing at or before 08:00
    assert(out(4L).contains(300L)) // inclusive: equal-ts right row counts
  }

  test("as-of join carries null payloads and whole rows atomically") {
    // latest right row has a NULL snap: the as-of value must be NULL, not
    // the older non-null value; with two payload columns the result must
    // come from ONE right row, never a field mix; null right ts never
    // matches (SQL `left.ts >= NULL` semantics)
    val left = Seq(
      (1L, 10L, ts("2024-01-01 12:00:00")),
      (2L, 20L, ts("2024-01-01 12:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, Some(ts("2024-01-01 10:00:00")), Some(5L), Option.empty[Long]),
      (10L, Some(ts("2024-01-01 11:00:00")), None, Some(7L)),
      (20L, Option.empty[java.sql.Timestamp], Some(9L), Some(9L))
    ).toDF("user_id", "ts", "a", "b")

    val out = AsOf.joinBackward(left, right, Seq("user_id"), "ts", Seq("a", "b"))
      .orderBy("event_id")
      .select("event_id", "a", "b")
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
         (if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap

    assert(out(1L) == (None, Some(7L))) // latest row verbatim, no chimera
    assert(out(2L) == (None, None))     // null-ts right row never matches
  }

  test("as-of join matches a naive per-row lookup on random data") {
    val rnd = new scala.util.Random(7)
    val lRows = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
    val rRows = (1 to 80).map(i =>
      ((rnd.nextInt(5) + 1).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        i.toLong))
      // as-of needs one row per (key, ts): keep max payload like the query
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val left = lRows.toDF("event_id", "user_id", "ts")
    val right = rRows.toDF("user_id", "ts", "snap")

    val got = AsOf.joinBackward(left, right, Seq("user_id"), "ts", Seq("snap"))
      .select("event_id", "snap").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val want = lRows.map { case (id, k, t) =>
      val cands = rRows.filter(r => r._1 == k && !r._2.after(t))
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(r => (r._2.getTime, r._3))._3))
    }.toMap
    assert(got == want)
  }

  test("sessionize splits strictly-greater-than-gap idle periods") {
    val rows = Seq(
      // user 1: 3 events, second exactly at the 6h boundary (same session,
      // split is strict >), third 6h+1s later (new session)
      (1L, 1L, ts("2024-01-01 00:00:00"), "click"),
      (2L, 1L, ts("2024-01-01 06:00:00"), "purchase"),
      (3L, 1L, ts("2024-01-01 12:00:01"), "click"),
      // user 2: single event
      (4L, 2L, ts("2024-01-01 00:00:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    rows.createOrReplaceTempView("___sess_in")

    // run the same plan shape as the query but over the crafted frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val out = rows
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess", when(col("prev_ts").isNull ||
        col("ts") > col("prev_ts") + expr(Sessions.GapSql), 1L).otherwise(0L))
      .withColumn("session_no", sum(col("new_sess"))
        .over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === "purchase", lit(1))).as("np"))
      .orderBy("user_id", "session_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(out.toSeq == Seq((1L, 1L, 2L, 1L), (1L, 2L, 1L, 0L), (2L, 1L, 1L, 0L)))
  }

  test("window funnel: chain, window boundary, expiry restart, mid-chain view") {
    import spark.implicits._
    val base = 1700000000L // fixed epoch anchor
    def ev(u: Long, offSec: Long, t: String): (Long, java.sql.Timestamp, String) =
      (u, new java.sql.Timestamp((base + offSec) * 1000L), t)
    val rows = Seq(
      // u1: clean 3-step chain inside the window
      ev(1, 0, "view"), ev(1, 100, "click"), ev(1, 200, "purchase"),
      // u2: purchase lands EXACTLY at the window bound — inclusive
      ev(2, 0, "view"), ev(2, 10, "click"),
      ev(2, Sessions.FunnelWindowSec, "purchase"),
      // u3: purchase one second PAST the bound — depth stalls at 2
      ev(3, 0, "view"), ev(3, 10, "click"),
      ev(3, Sessions.FunnelWindowSec + 1, "purchase"),
      // u4: first chain expires at depth 1; a later view restarts and
      // the SECOND chain completes — best is 3
      ev(4, 0, "view"),
      ev(4, Sessions.FunnelWindowSec + 100, "view"),
      ev(4, Sessions.FunnelWindowSec + 200, "click"),
      ev(4, Sessions.FunnelWindowSec + 300, "purchase"),
      // u5: a mid-chain view must NOT destroy progress (the live chain
      // keeps its start and still completes)
      ev(5, 0, "view"), ev(5, 50, "click"), ev(5, 60, "view"),
      ev(5, 70, "purchase"),
      // u6: steps out of order never chain (purchase before click)
      ev(6, 0, "view"), ev(6, 10, "purchase"), ev(6, 20, "click"),
      // u8: the documented greedy-vs-ClickHouse divergence case — a
      // second view while the first chain is LIVE does not restart, so
      // the click past the FIRST start's window cannot chain: depth 1
      // (ClickHouse's per-level re-stamping would read 2)
      ev(8, 0, "view"), ev(8, 100, "view"),
      ev(8, Sessions.FunnelWindowSec + 50, "click"),
      // u7: only non-funnel events — absent from the output
      (7L, new java.sql.Timestamp(base * 1000L), "error"))
      .toDF("user_id", "ts", "event_type")
    val got = Sessions.windowFunnelOf(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 3L, 5L -> 3L,
      6L -> 2L, 8L -> 1L), got.toString)
  }

  test("q103 secondary-sort funnel == in-array funnel on the fixture, the edge cases, and a whale") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // fixture-wide differential: every user, both strategies, bit-equal
    val a = Sessions.windowFunnel(spark, dir).collect().map(_.mkString("|")).toSeq
    val b = Sessions.windowFunnelProd(spark, dir).collect().map(_.mkString("|")).toSeq
    assert(a == b && a.nonEmpty, "prod fold diverged on the fixture")

    // the hand edge cases (window bound, expiry restart, mid-chain view,
    // greedy divergence) through the prod seam too
    val base = 1700000000L
    def ev(u: Long, offSec: Long, t: String): (Long, java.sql.Timestamp, String) =
      (u, new java.sql.Timestamp((base + offSec) * 1000L), t)
    val edge = Seq(
      ev(2, 0, "view"), ev(2, 10, "click"),
      ev(2, Sessions.FunnelWindowSec, "purchase"),
      ev(3, 0, "view"), ev(3, 10, "click"),
      ev(3, Sessions.FunnelWindowSec + 1, "purchase"),
      ev(4, 0, "view"), ev(4, Sessions.FunnelWindowSec + 100, "view"),
      ev(4, Sessions.FunnelWindowSec + 200, "click"),
      ev(4, Sessions.FunnelWindowSec + 300, "purchase"),
      ev(8, 0, "view"), ev(8, 100, "view"),
      ev(8, Sessions.FunnelWindowSec + 50, "click"))
      .toDF("user_id", "ts", "event_type")
    assert(Sessions.windowFunnelProdOf(edge).collect().map(r =>
      r.getLong(0) -> r.getLong(1)).toMap ==
      Map(2L -> 3L, 3L -> 2L, 4L -> 3L, 8L -> 1L))

    // the whale: one user with 60k funnel events (2k full chains + a
    // spam tail) riding alongside a normal user — the in-array fold is
    // the oracle here, the prod fold must match it exactly while never
    // materializing the 60k-row array
    val whale = spark.range(0, 60000L).select(
      lit(99L).as("user_id"),
      to_timestamp(from_unixtime(lit(base) + col("id") * 40)).as("ts"),
      when(col("id") % 30 === 0, "view")
        .when(col("id") % 30 === 1, "click")
        .when(col("id") % 30 === 2, "purchase")
        .otherwise("view").as("event_type"))
    val mixed = whale.unionByName(
      Seq(ev(1, 0, "view"), ev(1, 100, "click"), ev(1, 200, "purchase"))
        .toDF("user_id", "ts", "event_type"))
    val ref = Sessions.windowFunnelOf(mixed).collect().map(_.mkString("|")).toSeq
    val prod = Sessions.windowFunnelProdOf(mixed).collect().map(_.mkString("|")).toSeq
    assert(prod == ref && prod.size == 2, "prod fold diverged on the whale")
  }

  test("q104 retention cohorts: driver-side triangle recompute; offset-0 rows are exactly 1.0") {
    val dir = "/root/testdata/sf0.001"
    val got = Sessions.retentionCohorts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got.nonEmpty)
    // independent reference from the raw rows
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / 86400))
    val fd = ev.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val act = ev.map { case (u, d) => (u, fd(u) / 7, (d - fd(u)) / 7) }.distinct
    val cells = act.groupBy(a => (a._2, a._3)).map { case (k, as) => k -> as.size.toLong }
    val sizes = act.filter(_._3 == 0L).groupBy(_._2).map { case (c, as) => c -> as.size.toLong }
    val expect = cells.toSeq.map { case ((c, o), n) =>
      (c, o, n, sizes(c), n.toDouble / sizes(c).toDouble) }
      .sortBy(x => (x._1, x._2))
    assert(got == expect, s"engine:\n$got\nvs reference:\n$expect")
    // every user is active in their own first week: the triangle's
    // leading edge is EXACTLY 1.0 (integer identity, not approximation)
    assert(got.filter(_._2 == 0L).forall(r => r._3 == r._4 && r._5 == 1.0))
  }

  test("q105 session transitions: gap breaks the chain; rows normalize to 1; fixture recompute") {
    import spark.implicits._
    val base = 1700000000L
    def ev(id: Long, u: Long, offSec: Long, t: String) =
      (id, u, new java.sql.Timestamp((base + offSec) * 1000L), t)
    // u1: view->click->view in one session, then a >6h gap (chain broken:
    // view after the gap pairs with nothing), then purchase 10s later
    val rows = Seq(
      ev(1, 1, 0, "view"), ev(2, 1, 100, "click"), ev(3, 1, 200, "view"),
      ev(4, 1, 200 + 6 * 3600 + 1, "view"), ev(5, 1, 200 + 6 * 3600 + 11, "purchase"),
      // u2: a single transition
      ev(6, 2, 0, "view"), ev(7, 2, 50, "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Sessions.sessionTransitionsOf(rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got == Seq(
      ("click", "view", 1L, 1L, 1.0),
      ("view", "click", 1L, 3L, 1.0 / 3.0),
      ("view", "purchase", 1L, 3L, 1.0 / 3.0),
      ("view", "view", 1L, 3L, 1.0 / 3.0)), got.toString)

    // fixture: row-normalized probabilities sum to 1 per from_type
    // (exact ratio algebra) and totals match a driver recompute
    val dir = "/root/testdata/sf0.001"
    val fx = Sessions.sessionTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(fx.nonEmpty)
    fx.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sum == rs.head._4, "marginal must equal the pair sum")
    }
    // microsecond epochs: fixture timestamps carry sub-second fractions,
    // and the engine orders/compares at full precision (the q47 lesson)
    val raw = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("es"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expectPairs = raw.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Array(a, b) if b._2 - a._2 <= 6L * 3600 * 1000000 => (a._4, b._4)
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(fx.map(r => (r._1, r._2) -> r._3).toMap == expectPairs,
      "fixture pair counts must match the driver recompute")
  }

  test("q106 sequence conversion: every depth, ordering strictness, unbounded window") {
    import spark.implicits._
    val base = 1700000000L
    def ev(u: Long, offSec: Long, t: String): (Long, java.sql.Timestamp, String) =
      (u, new java.sql.Timestamp((base + offSec) * 1000L), t)
    val rows = Seq(
      // u1: full chain — and FAR outside q101's 24h window (unbounded)
      ev(1, 0, "view"), ev(1, 10 * 86400, "click"), ev(1, 20 * 86400, "purchase"),
      // u2: click BEFORE the first view never chains; no later click
      ev(2, 0, "click"), ev(2, 10, "view"), ev(2, 20, "purchase"),
      // u3: view then purchase, no click — depth 1 (strict order)
      ev(3, 0, "view"), ev(3, 100, "purchase"),
      // u4: purchase-only — depth 0 (funnel-typed but viewless)
      ev(4, 0, "purchase"),
      // u5: view+click, purchase BEFORE the click — depth 2
      ev(5, 0, "view"), ev(5, 5, "purchase"), ev(5, 10, "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Sessions.sequenceConvertOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    // depths: u4=0, u2=1 (its view converts nothing), u3=1, u5=2, u1=3
    assert(got == Seq((0L, 1L, -1L), (1L, 2L, -1L), (2L, 1L, -1L),
      (3L, 1L, 20L * 86400)), got.toString)
    // the depth-3 conversion time is first-view -> first valid purchase
    val conv = Sessions.sequenceConvertOf(rows)
      .filter(col("funnel_depth") === 3).collect().head
    assert(conv.getLong(3) == 20L * 86400 && conv.getDouble(4) == 20.0 * 86400)
  }

  test("q107 peak concurrency: closed-interval ties, singleton, hour carry, day split") {
    // base lands at second 80000 of its day and second 800 of its hour —
    // the t=0..6399 boundaries are one day, t>=6400 the next
    val base = 1700000000L
    val day0 = base / 86400 // 19675
    def ev(u: Long, offSec: Long): (Long, Long, java.sql.Timestamp, String) =
      (u * 1000 + offSec, u, new java.sql.Timestamp((base + offSec) * 1000L), "view")
    val rows = Seq(
      ev(1, 0), ev(1, 3600),      // session A = [0, 3600]
      ev(2, 1800),                // singleton B = [1800, 1800]
      ev(3, 3600), ev(3, 7200),   // C = [3600, 7200] — starts AS A ends
      ev(4, 0), ev(4, 18000))     // D = [0, 18000] — spans 5 hour buckets
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Sessions.peakConcurrencyOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    TransientCache.drain()
    // global running sum over (0:+A +D, 1800:+B -B, 3600:+C -A, 7200:-C,
    // 18000:-D) = 1,2,3,2,3,2,1,0 — the closed-interval rule keeps the
    // singleton at >=1 and counts A and C together at t=3600; D's -1
    // five hours later must see the carry from hour 0
    assert(got == Seq((day0, 3L, 4L, 2L), (day0 + 1, 1L, 0L, 2L)), got.toString)
  }

  test("q107 two-tier cumsum == a driver-side global scan on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val got = Sessions.peakConcurrency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    TransientCache.drain()
    // independent recompute: sessionize in driver memory, then ONE global
    // ordered scan (what the distributed two-tier plan must equal exactly)
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gap = 6L * 3600
    val bounds = evs.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3)).map(_._2)
      val sess = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var (ss, se) = (sorted.head, sorted.head)
      sorted.tail.foreach { t =>
        if (t > se + gap) { sess += ((ss, se)); ss = t; se = t } else se = t
      }
      sess += ((ss, se))
      sess.flatMap { case (a, b) => Seq((a, 1L), (b, -1L)) }
    }
    var run = 0L
    val conc = bounds.sortBy { case (t, d) => (t, -d) }
      .map { case (t, d) => run += d; (t / 86400, run, d) }
    val want = conc.groupBy(_._1).toSeq.sortBy(_._1).map { case (day, rs) =>
      (day, rs.map(_._2).max, rs.count(_._3 == 1L).toLong,
        rs.count(_._3 == -1L).toLong)
    }
    assert(got == want, s"two-tier ${got.take(5)} vs global ${want.take(5)}")
  }

  test("KMV estimate is close on a known universe and exact-count sane") {
    // 5000 distinct strings through the production hash; k = 64
    val n = 5000
    val h = (1 to n).map(i => s"value-$i").toDF("s")
      .select(TextFns.hash60(col("s")).as("sh_h")).distinct()
    val hk = h.orderBy(col("sh_h")).limit(Sketch.K)
      .agg(max(col("sh_h"))).head().getLong(0)
    val est = (Sketch.K - 1).toDouble * 1152921504606846976.0 / hk.toDouble
    // KMV standard error is ~1/sqrt(k-2) ≈ 13%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.52, s"estimate $est too far from $n")
  }

  test("stratified sample is invariant under repartitioning") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.operators.TextOps.stratifiedSample(spark, dir).collect().toSeq
    val b = graft.operators.TextOps.stratifiedSample(spark, dir)
      .repartition(7).orderBy("doc_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  // ---------------- q113: incremental retention (at-rest user-weeks)

  test("q113 delta retention == q104 full rebuild bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    Sessions.clearRetentionIndex(spark)
    val delta = Sessions.deltaRetention(spark, dir).collect().toSeq
    val full = Sessions.retentionCohorts(spark, dir).collect().toSeq
    assert(delta == full,
      s"incremental must equal rebuild exactly (delta rows ${delta.size})")
  }

  test("q113 reads the at-rest tables: a poisoned index changes the cells") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft_retpoison_").toString
    val wh = new graft.pipelines.Warehouse(spark, root)
    // one phantom user with an fd far before any real event and a week-0
    // activation — a cohort no real corpus produces
    wh.write("ret_user", Seq((-1L, 0L)).toDF("user_id", "fd"))
    wh.write("ret_weeks", Seq((-1L, 0L)).toDF("user_id", "week_offset"))
    Sessions.clearRetentionIndex(spark)
    // split below any real day: the whole event log becomes the batch,
    // so every true cell must still emerge PLUS the phantom cohort
    Sessions.installRetentionIndex(spark, dir, root, 0L)
    try {
      val got = Sessions.deltaRetention(spark, dir).collect()
      assert(got.exists(r => r.getLong(0) == 0L && r.getLong(1) == 0L &&
          r.getLong(3) == 1L),
        "the phantom cohort must surface — if not, the query is not " +
          "reading the at-rest tables")
    } finally {
      Sessions.clearRetentionIndex(spark)
      graft.pipelines.Fs.delete(spark, root)
    }
  }

  test("q113 advance: nightly appends == rebuild at every night boundary; replay and crash windows converge") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft_retadv_").toString
    try {
      val ev = graft.Tables.events(spark, dir)
        .select(col("user_id"), col("ts"),
          expr("unix_timestamp(ts) DIV 86400").as("day"))
      val bounds = ev.agg(min(col("day")), max(col("day"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val cut1 = lo + (hi - lo) / 3
      val cut2 = lo + 2 * (hi - lo) / 3
      val corpus = ev.filter(col("day") < cut1)
      val night1 = ev.filter(col("day") >= cut1 && col("day") < cut2)
      val night2 = ev.filter(col("day") >= cut2)
      val wh = new graft.pipelines.Warehouse(spark, root)
      def stateNow(): (Seq[(Long, Long)], Seq[(Long, Long)]) = (
        wh.read("ret_user").collect().map(r => (r.getLong(0), r.getLong(1)))
          .sorted.toSeq,
        wh.read("ret_weeks").collect().map(r => (r.getLong(0), r.getLong(1)))
          .sorted.toSeq)
      def rebuilt(upTo: org.apache.spark.sql.DataFrame)
          : (Seq[(Long, Long)], Seq[(Long, Long)]) = {
        val r2 = java.nio.file.Files.createTempDirectory("graft_retrb_").toString
        Sessions.retentionIndexAt(spark, r2, upTo)
        val w2 = new graft.pipelines.Warehouse(spark, r2)
        val out = (
          w2.read("ret_user").collect().map(r => (r.getLong(0), r.getLong(1)))
            .sorted.toSeq,
          w2.read("ret_weeks").collect().map(r => (r.getLong(0), r.getLong(1)))
            .sorted.toSeq)
        graft.pipelines.Fs.delete(spark, r2)
        out
      }
      Sessions.retentionIndexAt(spark, root, corpus)
      Sessions.advanceRetentionIndex(spark, root, night1)
      assert(stateNow() == rebuilt(ev.filter(col("day") < cut2)),
        "night-1 advance != rebuild")
      // crash window 1: ret_user committed for night 2, ret_weeks not —
      // simulate by appending night 2's new users only, then REPLAY the
      // whole night
      val n2days = night2.select(col("user_id"), col("day"))
        .dropDuplicates("user_id", "day")
      wh.append("ret_user",
        n2days.groupBy(col("user_id")).agg(min(col("day")).as("fd"))
          .join(wh.read("ret_user"), Seq("user_id"), "left_anti"))
      Sessions.advanceRetentionIndex(spark, root, night2)
      val advanced = stateNow()
      assert(advanced == rebuilt(ev), "crash-window replay != rebuild")
      // at-least-once: a replayed night is a no-op (row-level anti-joins)
      Sessions.advanceRetentionIndex(spark, root, night2)
      assert(stateNow() == advanced, "replayed advance must be a no-op")
    } finally graft.pipelines.Fs.delete(spark, root)
  }

  // ------------- q115: incremental transitions (additive delta ledger)

  test("q115 delta transitions == q105 full rebuild bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    Sessions.clearTransitionsIndex(spark)
    val delta = Sessions.deltaTransitions(spark, dir).collect().toSeq
    val full = Sessions.sessionTransitions(spark, dir).collect().toSeq
    assert(delta == full,
      s"incremental must equal rebuild exactly (delta rows ${delta.size})")
  }

  test("q115 reads the at-rest ledger: a poisoned delta row changes the matrix") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft_trpoison_").toString
    val wh = new graft.pipelines.Warehouse(spark, root)
    // a transition pair no real event log produces, plus an empty carry
    // stamped with an impossible night key
    wh.write("tr_deltas",
      Seq((0L, "zz_from", "zz_to", 7L))
        .toDF("batch_key", "from_type", "to_type", "n"))
    wh.write("tr_last",
      spark.emptyDataFrame.select(lit(0L).as("user_id"),
          current_timestamp().as("ts"), lit(0L).as("event_id"),
          lit("x").as("event_type"), lit(0L).as("night_key"))
        .limit(0))
    Sessions.clearTransitionsIndex(spark)
    Sessions.installTransitionsIndex(spark, dir, root, 0L)
    try {
      val got = Sessions.deltaTransitions(spark, dir).collect()
      assert(got.exists(r => r.getString(0) == "zz_from" &&
          r.getString(1) == "zz_to" && r.getLong(2) == 7L),
        "the poisoned cell must surface — if not, the query is not " +
          "reading the at-rest ledger")
    } finally {
      Sessions.clearTransitionsIndex(spark)
      graft.pipelines.Fs.delete(spark, root)
    }
  }

  test("q115 advance: nightly deltas == rebuild at every boundary; marker, partial-append and pre-swap crash windows converge") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft_tradv_").toString
    try {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          expr("unix_timestamp(ts) DIV 86400").as("day"))
      val bounds = ev.agg(min(col("day")), max(col("day"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val cut1 = lo + (hi - lo) / 3
      val cut2 = lo + 2 * (hi - lo) / 3
      def slice(p: org.apache.spark.sql.Column) = ev.filter(p)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val wh = new graft.pipelines.Warehouse(spark, root)
      def cellsNow(): Map[(String, String), Long] =
        wh.read("tr_deltas").groupBy(col("from_type"), col("to_type"))
          .agg(sum(col("n")).as("n")).collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      def rebuilt(p: org.apache.spark.sql.Column): Map[(String, String), Long] =
        Sessions.sessionTransitionsOf(ev.filter(p)).collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

      Sessions.advanceTransitionsIndex(spark, root, slice(col("day") < cut1))
      Sessions.advanceTransitionsIndex(spark, root,
        slice(col("day") >= cut1 && col("day") < cut2))
      assert(cellsNow() == rebuilt(col("day") < cut2),
        "night-1 advance != rebuild (boundary pairs must ride the carry)")

      // crash window A (mid step 3): a PARTIAL delta file set for night 2
      // — simulate by appending a strict subset of night 2's delta rows
      // under the true night key, then REPLAY the whole advance
      val night2 = slice(col("day") >= cut2)
      val carry = wh.read("tr_last")
      val lastBefore = carry.collect().map(_.toString).sorted.toSeq
      val d2 = Sessions.transitionDelta(Some(carry), night2)
      val k2 = Sessions.eventSetKey(night2)
      assert(d2.count() >= 2, "fixture too small to split a delta")
      wh.append("tr_deltas", d2.limit(1).crossJoin(broadcast(k2))
        .select(col("batch_key"), col("from_type"), col("to_type"), col("n")))
      Sessions.advanceTransitionsIndex(spark, root, night2)
      val advanced = cellsNow()
      assert(advanced == rebuilt(lit(true)),
        "partial-append replay != rebuild")

      // crash window B would be "delta complete, tr_last not swapped" —
      // covered by construction: window A's replay ran the whole step-3
      // anti-join against a half-committed ledger and then swapped.
      // Marker: a DIRECT replay of the completed night 2 is a full no-op
      // (step 2 short-circuits on the stamped key)
      val lastAfter = wh.read("tr_last").collect().map(_.toString).sorted.toSeq
      Sessions.advanceTransitionsIndex(spark, root, night2)
      assert(cellsNow() == advanced, "replayed completed night moved cells")
      assert(wh.read("tr_last").collect().map(_.toString).sorted.toSeq ==
        lastAfter, "replayed completed night moved the carry")
      assert(lastBefore != lastAfter, "night 2 must have advanced the carry")
    } finally {
      graft.pipelines.Fs.delete(spark, root)
    }
  }

  test("q113 seed crash window: ret_user committed, ret_weeks missing — the replay re-seeds (never wedges on the advance path)") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft_retseedcrash_").toString
    val rb = java.nio.file.Files.createTempDirectory("graft_retseedclean_").toString
    try {
      val batch = Tables.events(spark, dir).select(col("user_id"), col("ts"))
      val wh = new graft.pipelines.Warehouse(spark, root)
      // simulate the crash BETWEEN the seed's two writes: commit the
      // first table only
      wh.write("ret_user", batch
        .select(col("user_id"), expr("unix_timestamp(ts) DIV 86400").as("day"))
        .groupBy(col("user_id")).agg(min(col("day")).as("fd")))
      assert(wh.exists("ret_user") && !wh.exists("ret_weeks"))
      assert(!Sessions.retentionIndexSeeded(wh),
        "a half-committed seed must read as UNSEEDED")
      // the streaming twin's replay must route to the SEED path (a
      // ret_user-only guard would take the advance path and die on the
      // missing ret_weeks read forever)
      graft.streaming.StreamingRetentionIndex.processBatch(wh, batch, 0L)
      Sessions.retentionIndexAt(spark, rb, batch)
      val w2 = new graft.pipelines.Warehouse(spark, rb)
      def tbl(w: graft.pipelines.Warehouse, t: String): Seq[(Long, Long)] =
        w.read(t).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(tbl(wh, "ret_user") == tbl(w2, "ret_user") &&
        tbl(wh, "ret_weeks") == tbl(w2, "ret_weeks"),
        "the re-seed must equal a clean seed on both tables")
    } finally {
      graft.pipelines.Fs.delete(spark, root)
      graft.pipelines.Fs.delete(spark, rb)
    }
  }

  test("q115 advance: a cold warehouse seeded by an EMPTY first batch does not wedge the marker read") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft_trempty_").toString
    try {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      // empty first micro-batch on a cold warehouse: commits a zero-row
      // tr_last — the marker read must treat it as "no carry, no
      // completed night", not throw
      Sessions.advanceTransitionsIndex(spark, root, ev.limit(0))
      val wh = new graft.pipelines.Warehouse(spark, root)
      assert(wh.exists("tr_last") && wh.read("tr_last").isEmpty,
        "the empty seed commits an empty carry")
      // the NEXT advance must work and converge to the rebuild
      Sessions.advanceTransitionsIndex(spark, root, ev)
      val cells = wh.read("tr_deltas").groupBy(col("from_type"), col("to_type"))
        .agg(sum(col("n")).as("n")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val full = Sessions.sessionTransitionsOf(ev).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(cells == full, "advance after an empty seed != rebuild")
    } finally graft.pipelines.Fs.delete(spark, root)
  }
}
