package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("quota sample: exact quota per stratum, subset, deterministic") {
    val docs = Tables.documents(spark, dir)
    val got = Sampling.quotaSample(spark, dir).collect()
    TransientCache.drain()
    val ns = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = got.groupBy(_.getString(1)).view.mapValues(_.length.toLong)
    // exact ceil(0.3 * n_s) per stratum — every stratum present
    assert(bySource.keySet == ns.keySet)
    for ((s, n) <- ns)
      assert(bySource(s) == (3 * n + 9) / 10, s"stratum $s: ${bySource(s)}")
    // subset of the input universe, no duplicates
    val ids = got.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    val universe = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(universe))
    // deterministic: a second run is byte-identical
    val again = Sampling.quotaSample(spark, dir).collect()
    TransientCache.drain()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("quota sample: membership equals a driver-side per-stratum hash sort") {
    // the two-tier threshold vs the naive formulation, on the engine's
    // own hash values (mode-agnostic differential)
    val docs = Tables.documents(spark, dir)
    val base = docs.select(col("source"), col("doc_id"),
      graft.functions.TextFns.hash60(
        concat(lit("samp|"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = base.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val k = (3 * rows.length + 9) / 10
      rows.sortBy(r => (r._3, r._2)).take(k).toSeq
    }.map(r => (r._2, r._1)).toSet
    val got = Sampling.quotaSample(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    TransientCache.drain()
    assert(got == want)
  }

  test("quota sample: quota structure is hash-mode invariant") {
    // membership legitimately differs by hash tier; the structural
    // contract (exact quotas) must not
    val before = System.getProperty("graft.hashMode")
    try {
      System.setProperty("graft.hashMode", "md5")
      val docs = Tables.documents(spark, dir)
      val ns = docs.groupBy(col("source")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bySource = Sampling.quotaSample(spark, dir).collect()
        .groupBy(_.getString(1)).view.mapValues(_.length.toLong)
      TransientCache.drain()
      for ((s, n) <- ns)
        assert(bySource(s) == (3 * n + 9) / 10, s"stratum $s (md5)")
    } finally {
      if (before == null) System.clearProperty("graft.hashMode")
      else System.setProperty("graft.hashMode", before)
    }
  }

  test("mix sample: per-source counts equal a driver-side largest-remainder apportionment") {
    val docs = Tables.documents(spark, dir)
    val ns = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.mixQuotaSample(spark, dir).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    TransientCache.drain()
    // driver recompute in the exact same IEEE op order: sqrt shares,
    // source-ordered norm fold, weight*budget, floor + largest-remainder
    val total = ns.values.sum
    val w = ns.view.mapValues(n => math.sqrt(n.toDouble / total)).toMap
    val norm = w.toSeq.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _)
    val bn = total / Sampling.MixDiv
    val ap = ns.keys.toSeq.sorted.map { s =>
      val raw = (w(s) / norm) * bn
      val fl = math.floor(raw).toLong
      (s, fl, raw - fl)
    }
    val lv = bn - ap.map(_._2).sum
    val bump = ap.sortBy { case (s, _, frac) => (-frac, s) }
      .take(lv.toInt).map(_._1).toSet
    val want = ap.map { case (s, fl, _) =>
      s -> (fl + (if (bump(s)) 1L else 0L))
    }.toMap
    // at this data no source saturates, so round 1 IS the fixpoint and
    // the budget is drawn exactly (the cap path is forced in the next
    // test)
    assert(want.forall { case (s, k) => k <= ns(s) },
      "fixture drifted: a capped source makes this one-round recompute stale")
    assert(want.values.sum == bn, "the fixpoint draw must be exactly N")
    assert(got == want.filter(_._2 > 0L), s"$got vs $want")
  }

  test("mix sample: an up-weighted tiny source caps at its own size; the leftover re-apportions to fixpoint (forced cap path)") {
    val sql = spark.sqlContext
    import sql.implicits._
    // A: 1000 docs, B: 4 docs. alpha=0.5 up-weights B far past 4 docs'
    // worth of a 200-doc budget, so B saturates at 4 in round 1 and the
    // 196-doc leftover re-apportions over {A} in round 2 — the draw is
    // exactly N, never a silent shortfall
    val docs = ((1 to 1000).map(i => (i.toLong, "A")) ++
      (2001 to 2004).map(i => (i.toLong, "B")))
      .toDF("doc_id", "source")
    val got = Sampling.mixQuotaSampleOf(docs).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    TransientCache.drain()
    val total = 1004L
    val bn = total / Sampling.MixDiv // 200
    val wA = math.sqrt(1000.0 / total); val wB = math.sqrt(4.0 / total)
    val rawB = wB / (wA + wB) * bn
    assert(rawB > 4.0, s"fixture must force the cap: rawB=$rawB")
    assert(got("B") == 4L, s"B must saturate at its 4 docs: $got")
    // round 2 over {A} alone: norm = wA, raw = (wA/wA)·196 = 196 exact
    assert(got("A") == bn - 4L,
      s"the capped leftover must re-apportion to A: $got")
    assert(got("A") + got("B") == bn,
      "fixpoint re-apportionment must draw the budget exactly")
  }

  test("quota sample: rejects a rate outside (0, 1]") {
    intercept[IllegalArgumentException] {
      Sampling.quotaSampleOf(Tables.documents(spark, dir),
        col("source"), 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.quotaSampleOf(Tables.documents(spark, dir),
        col("source"), 11)
    }
  }

  /** Brute-force systematic-PPS on the engine's own hash values:
    * single-threaded cumulative sum in (h, doc_id) order + the same
    * integer threshold arithmetic.
    */
  private def ppsBrute(rows: Seq[(Long, Long)]): (Seq[(Long, Long, Long)], Long) = {
    import spark.implicits._
    val hs = rows.toDF("doc_id", "w")
      .select(col("doc_id"), col("w"), graft.functions.TextFns.hash60(
        concat(lit("pps|"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bigW = hs.map(_._2).sum
    val m = hs.length / Sampling.PpsDiv
    var c = 0L
    val drawn = hs.sortBy(r => (r._3, r._1)).flatMap { case (id, w, _) =>
      val c0 = c; c += w
      val d = (c * m + bigW / 2) / bigW - (c0 * m + bigW / 2) / bigW
      if (d > 0) Some((id, w, d)) else None
    }
    (drawn.sortBy(_._1).toSeq, m)
  }

  test("pps sample: exact total, whale multi-drawn, zero-weight undrawable") {
    import spark.implicits._
    // 60 light docs + a whale holding exactly 2 strides (w·m = 2W) +
    // two zero-weight docs → n = 63, m = 3, W = 1800, stride = 600
    val rows = (1L to 60L).map(i => (i, 10L)) ++
      Seq((90L, 0L), (91L, 0L), (99L, 1200L))
    val got = Sampling.ppsSampleOf(rows.toDF("doc_id", "w")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    TransientCache.drain()
    val (want, m) = ppsBrute(rows)
    assert(got.toSeq == want)
    assert(m == 3 && got.map(_._3).sum == m, "Σ draws must equal m exactly")
    // the whale spans two whole strides → exactly 2 draws wherever the
    // hash order lands it; zero-weight docs structurally undrawable
    assert(got.find(_._1 == 99L).map(_._3).contains(2L))
    assert(!got.exists(r => r._1 == 90L || r._1 == 91L))
  }

  test("pps sample: fixture run matches brute force, partition-invariant") {
    import graft.functions.TextFns.toks
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(toks(col("text"))).cast("long").as("w"))
    val rows = docs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Sampling.ppsSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    TransientCache.drain()
    val (want, m) = ppsBrute(rows)
    assert(got.toSeq == want)
    assert(got.map(_._3).sum == m)
    // partitioning must not leak into the two-tier prefix sums
    val again = Sampling.ppsSampleOf(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    TransientCache.drain()
    assert(again.toSeq == want)
  }
}
