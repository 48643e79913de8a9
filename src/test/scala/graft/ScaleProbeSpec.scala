package graft

import graft.operators.{Analytics, Graph, Stock, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale probes for the flagship plans: blow the sf0.001 inputs up 10×
  * (explode-salt folded into the keys, so per-key group sizes stay
  * constant while rows AND distinct keys scale — the shape of a bigger
  * cluster input, not a hotter key) and assert the PLAN stays the plan
  * we'd want at 100 TB: shuffle count invariant in data size, no
  * cartesian products, broadcasts still broadcast, and the iterative CC
  * operator inside its O(log diameter) round budget on an adversarial
  * path graph. Runtime linearity is asserted only loosely (local timing
  * is noisy); plan shape is the deterministic scale signal.
  */
class ScaleProbeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def blowUpLedger(ledger: DataFrame, factor: Int): DataFrame =
    ledger.withColumn("__s", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("art_id", col("art_id") * factor + col("__s"))
      .withColumn("id_origen", col("id_origen") * factor + col("__s"))
      .drop("__s")

  /** AQE re-plans at runtime (query stages hide the static shape); the
    * probes read the static plan, so they pin AQE off for the session
    * and restore it after.
    */
  private def withAqeOff[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def shuffleCount(plan: String): Int =
    plan.linesIterator.count(l =>
      (l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning")) &&
        !l.trim.startsWith("ReusedExchange"))

  test("R4 running balance stays a single-shuffle window plan at 10x") {
    withAqeOff {
      val ledger = Tables.ledger(spark, dir)
      val p1 = planOf(Stock.withBalance(blowUpLedger(ledger, 1)))
      val p10 = planOf(Stock.withBalance(blowUpLedger(ledger, 10)))
      assert(shuffleCount(p1) == 1, s"1x plan:\n$p1")
      assert(shuffleCount(p10) == 1, s"10x plan:\n$p10")
      assert(!p10.contains("CartesianProduct"))
    }
  }

  test("q13 dense stock-points plan shape is invariant in data size") {
    withAqeOff {
      val ledger = Tables.ledger(spark, dir)
      val p1 = planOf(Stock.denseSodFrom(blowUpLedger(ledger, 1)))
      val p10 = planOf(Stock.denseSodFrom(blowUpLedger(ledger, 10)))
      assert(shuffleCount(p1) == shuffleCount(p10), s"1x=$p1\n10x=$p10")
      assert(shuffleCount(p10) <= 6, s"plan grew a shuffle web:\n$p10")
      // densify is keys × broadcast(calendar): nested-loop over a tiny
      // broadcast side, never a shuffled cartesian
      assert(!p10.contains("CartesianProduct"))
      assert(p10.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("q66 boilerplate keeps the frequent-gram broadcast and its shuffle count at 10x") {
    withAqeOff {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      def toks(factor: Int): DataFrame = docs
        .withColumn("__s", explode(sequence(lit(0), lit(factor - 1))))
        .select((col("doc_id") * factor + col("__s")).as("doc_id"),
          split(lower(col("text")), "\\s+").as("t"))
      val p1 = planOf(TextOps.boilerplateFrom(toks(1)))
      val p10 = planOf(TextOps.boilerplateFrom(toks(10)))
      // the frequent-gram set joins as a broadcast in BOTH plans — the
      // hint must survive the optimizer regardless of input stats
      assert(p1.contains("BroadcastHashJoin") && p10.contains("BroadcastHashJoin"))
      assert(shuffleCount(p1) == shuffleCount(p10), s"1x=$p1\n10x=$p10")
      assert(!p10.contains("CartesianProduct"))
    }
  }

  test("q76 dup-span set carries no broadcast hint (corpus-bounded side stays shuffleable)") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hintCount(df: DataFrame): Int =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    // q66 PINS its threshold-bounded gram set as a broadcast; q76's df>=2
    // set is corpus-bounded, so the plan must leave the strategy to
    // stats/AQE — a pinned broadcast there is the executor-memory cliff
    // the q72 de-broadcast removed
    assert(hintCount(TextOps.boilerplateRemoval(spark, dir)) >= 1)
    assert(hintCount(TextOps.spanDedup(spark, dir)) == 0)
  }

  test("connected components converges in O(log diameter) rounds on a 256-edge path") {
    val sql = spark.sqlContext
    import sql.implicits._
    // worst case for plain label propagation: one long path (diameter
    // 256 would need ~256 one-hop rounds; pointer jumping doubles the
    // label horizon per round, so ~log2(256)+2 including the fixpoint
    // confirmation round)
    val edges = (0 until 256).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val (labels, rounds) = Graph.connectedComponentsWithRounds(edges, "src", "dst")
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 257)
    assert(out.forall(_._2 == 0L), "every node must label to the path minimum")
    assert(rounds <= 12, s"pointer jumping degraded: $rounds rounds for diameter 256")
  }

  test("q99 degree orientation collapses hub wedge fan-out (the skew claim, measured)") {
    import spark.implicits._
    // adversarial hub: node 0 adjacent to 300 leaves, plus a sparse leaf
    // ring so triangles exist (each ring edge closes with the hub)
    val n = 300
    val hub = (1 to n).map(i => (0L, i.toLong))
    val ring = (1 until n by 3).map(i => (i.toLong, (i + 1).toLong))
    val edges = (hub ++ ring).toDF("da", "db")
    val got = Graph.triangleCountsOf(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    TransientCache.drain()
    // correctness under extreme skew: hub sits in |ring| triangles, each
    // ring endpoint in exactly one
    assert(got(0L) == ring.size.toLong)
    ring.foreach { case (a, b) =>
      assert(got(a) == 1L && got(b) == 1L, s"ring pair ($a,$b)")
    }
    assert(got.size == 1 + 2 * ring.size)
    // the measured claim: wedge rows each orientation enumerates.
    // id-ordering directs every hub edge OUT of node 0 (id 0 is
    // minimal), so the hub alone contributes C(300, 2) wedges from one
    // join key; (degree, id)-ordering directs every hub edge INTO the
    // hub (its degree is maximal), so hub-centered wedges vanish and
    // total wedge work collapses by orders of magnitude — the
    // difference between a plan that survives a template-spam cluster
    // and one that stalls on its hottest key
    val und = (hub ++ ring).flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = und.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    def wedges(orient: ((Long, Long)) => Boolean): Long = {
      val out = (hub ++ ring).map { case (a, b) =>
        if (orient((a, b))) a else b
      }.groupBy(identity).map { case (_, vs) => vs.size.toLong }
      out.map(d => d * (d - 1) / 2).sum
    }
    val idWedges = wedges { case (a, b) => a < b }
    val degWedges = wedges { case (a, b) =>
      deg(a) < deg(b) || (deg(a) == deg(b) && a < b)
    }
    assert(idWedges >= n.toLong * (n - 1) / 2,
      "the id-ordered walk must pay the full hub fan-out")
    assert(degWedges <= 4L * n,
      s"degree orientation must bound wedge work, got $degWedges")
    assert(idWedges / math.max(degWedges, 1L) > 50,
      s"expected orders-of-magnitude collapse: $idWedges vs $degWedges")
  }

  test("q100 co-occurrence keeps the pair stream in-array — plan invariant at 10x") {
    withAqeOff {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      def blow(f: Int): DataFrame = docs
        .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
        .select((col("doc_id") * f + col("__s")).as("doc_id"), col("text"))
      // a fixed vocab-bounded unigram frame: the corpus side is what
      // scales; the model side is the shared tier at any SF
      val uni = TextOps.bigramCounts(spark, dir)
        .groupBy(col("cur").as("w")).agg(sum(col("c2")).as("c1"))
      val p1 = planOf(TextOps.cooccurrenceOf(blow(1), uni))
      val p10 = planOf(TextOps.cooccurrenceOf(blow(10), uni))
      // the window-pair generator must stay a generate-in-scan: one
      // pair hash-agg, NO positional self-join added at any size
      assert(shuffleCount(p1) == shuffleCount(p10), s"1x=$p1\n10x=$p10")
      assert(!p10.contains("CartesianProduct"))
      assert(p10.contains("Generate"), "pair stream must be generated in-array")
      TransientCache.drain()
    }
  }

  test("q102 basket lift plan is invariant in order count at 10x") {
    withAqeOff {
      val lines = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      def blow(f: Int): DataFrame = lines
        .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
        .select((col("o") * f + col("__s")).as("o"),
          (col("p") * f + col("__s")).as("p"))
      // disjoint order copies: orders AND parts scale, basket sizes stay
      // business-bounded — the shape of 10x more customers, not a
      // hotter basket (the mega-basket shape has its own live guard,
      // spec'd in AnalyticsSpec)
      val p1 = planOf(Analytics.basketLiftFrom(blow(1), Analytics.BasketBlockCap))
      val p10 = planOf(Analytics.basketLiftFrom(blow(10), Analytics.BasketBlockCap))
      assert(shuffleCount(p1) == shuffleCount(p10), s"1x=$p1\n10x=$p10")
      assert(!p10.contains("CartesianProduct"))
      TransientCache.drain()
    }
  }

  test("q111/q112 rank-engine plans are invariant in row count at 10x") {
    withAqeOff {
      // disjoint doc copies: strata sizes AND distinct rank keys scale,
      // the bucket fan-out stays the 1024 config constant — candidate
      // buckets rank ~n_s/1024 rows whatever n_s is
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      def blow(f: Int): DataFrame = docs
        .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
        .select((col("doc_id") * f + col("__s")).as("doc_id"), col("source"))
      val s1 = planOf(graft.operators.Sampling.quotaSampleOf(
        blow(1), col("source"), 3))
      val s10 = planOf(graft.operators.Sampling.quotaSampleOf(
        blow(10), col("source"), 3))
      assert(shuffleCount(s1) == shuffleCount(s10), s"1x=$s1\n10x=$s10")
      assert(!s10.contains("CartesianProduct"))
      TransientCache.drain()
      // the q111 cut build rides the same engine in value space: customer
      // count scales, RfmBuckets stays the config bound
      val orders = Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      def blowO(f: Int): DataFrame = orders
        .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
        .select((col("o_custkey") * f + col("__s")).as("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
      val r1 = planOf(graft.operators.Analytics.rfmOf(blowO(1)))
      val r10 = planOf(graft.operators.Analytics.rfmOf(blowO(10)))
      assert(shuffleCount(r1) == shuffleCount(r10), s"1x=$r1\n10x=$r10")
      assert(!r10.contains("CartesianProduct"))
      TransientCache.drain()
    }
  }

  test("q117/q118 tier plans are invariant in row count at 10x") {
    withAqeOff {
      // q117: weight-space prefix sums — rows and distinct hash keys
      // scale, the 1024-bucket carry stays the config constant, the
      // (W, m) model stays one row
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), (col("n_chars") % 50 + 1).cast("long").as("w"))
      def blow(f: Int): DataFrame = docs
        .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
        .select((col("doc_id") * f + col("__s")).as("doc_id"), col("w"))
      val p1 = planOf(graft.operators.Sampling.ppsSampleOf(blow(1)))
      val p10 = planOf(graft.operators.Sampling.ppsSampleOf(blow(10)))
      assert(shuffleCount(p1) == shuffleCount(p10), s"1x=$p1\n10x=$p10")
      TransientCache.drain()
      // q118/q120's shared consumer: group cardinality scales 10x, the
      // per-group engine work stays histogram-bounded — the clip re-agg
      // must stay group-keyed (a per-group sort or unpartitioned window
      // sneaking in would change the count)
      val vh0 = Tables.documents(spark, dir)
        .select(col("source").as("g"), (col("n_chars") % 97).cast("long").as("v"))
        .groupBy(col("g"), col("v")).agg(count(lit(1)).as("nv"))
      def blowG(f: Int): DataFrame = graft.TransientCache.register(vh0
        .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
        .select(concat(col("g"), lit("#"), col("__s")).as("g"),
          col("v"), col("nv"))
        .cache())
      val w1 = planOf(Analytics.winsorizedOfHist(blowG(1)))
      val w10 = planOf(Analytics.winsorizedOfHist(blowG(10)))
      assert(shuffleCount(w1) == shuffleCount(w10), s"1x=$w1\n10x=$w10")
      assert(!w10.contains("CartesianProduct"))
      TransientCache.drain()
    }
  }

  test("q99 triangle plan shape is invariant in edge count at 10x") {
    withAqeOff {
      val sql = spark.sqlContext
      import sql.implicits._
      // disjoint relabeled copies of a fixed community graph: edges and
      // nodes scale, degrees stay constant (the hub-degree blowup is the
      // separate wedge-work probe above)
      val base = (0 until 40).flatMap(i =>
        Seq((i.toLong, (i + 1) % 40L), (i.toLong, (i + 2) % 40L)))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      def blow(f: Int): DataFrame = (0 until f).flatMap(s =>
        base.map { case (a, b) => (a * f + s, b * f + s) })
        .toDF("da", "db")
      val p1 = planOf(Graph.triangleCountsOf(blow(1)))
      val p10 = planOf(Graph.triangleCountsOf(blow(10)))
      assert(shuffleCount(p1) == shuffleCount(p10), s"1x=$p1\n10x=$p10")
      assert(!p10.contains("CartesianProduct"))
      TransientCache.drain()
    }
  }

  test("event-tier q103–q107 plan shapes are invariant in user count at 10x") {
    withAqeOff {
      val events = Tables.events(spark, "/root/testdata/sf0.001")
      // disjoint user copies: users and events scale, per-user activity
      // stays constant — the shape of 10x more customers, not a hotter
      // user (the whale shape has its own differential spec in
      // EventOpsSpec, and q103 IS the whale-proof path)
      def blow(f: Int): DataFrame = events
        .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
        .withColumn("user_id", col("user_id") * f + col("__s"))
        .withColumn("event_id", col("event_id") * f + col("__s"))
        .drop("__s")
      import graft.operators.Sessions
      val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
        ("q103 funnel fold", Sessions.windowFunnelProdOf),
        ("q104 retention", Sessions.retentionCohortsOf),
        ("q105 transitions", Sessions.sessionTransitionsOf),
        ("q106 seq convert", Sessions.sequenceConvertOf),
        ("q107 concurrency", Sessions.peakConcurrencyOf))
      ops.foreach { case (name, op) =>
        val p1 = planOf(op(blow(1)))
        val p10 = planOf(op(blow(10)))
        assert(shuffleCount(p1) == shuffleCount(p10),
          s"$name grew shuffles at 10x:\n1x=$p1\n10x=$p10")
        assert(!p10.contains("CartesianProduct"), name)
        TransientCache.drain()
      }
    }
  }

  test("q107 hour ledger is calendar-bounded: <= the events' hour span, invariant at 10x users") {
    import graft.operators.Sessions
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    def blow(f: Int): DataFrame = events
      .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
      .withColumn("user_id", col("user_id") * f + col("__s"))
      .withColumn("event_id", col("event_id") * f + col("__s"))
      .drop("__s")
    // ledger rows = distinct boundary hours of the SAME frame the
    // production plan aggregates (sessionBoundsOf feeds peakConcurrencyOf)
    def ledgerRows(f: Int): Long =
      Sessions.sessionBoundsOf(blow(f)).select(col("hour")).distinct().count()
    val span = events.agg(
        (max(unix_timestamp(col("ts"))) / 3600 -
          min(unix_timestamp(col("ts"))) / 3600 + 1).cast("long").as("h"))
      .head().getLong(0)
    val r1 = ledgerRows(1)
    // the two-tier cumsum's only global-order window runs over this
    // ledger: its size must be the CALENDAR's, never the corpus's
    assert(r1 <= span, s"ledger $r1 rows > $span calendar hours")
    // 10x disjoint users add boundary ROWS, not HOURS — the blow-up
    // preserves timestamps, so the ledger must not grow at all
    assert(ledgerRows(10) == r1, s"ledger grew with data size at 10x")
  }

  test("q108 HLL register pass carries partial aggregation (map-side max) at any size") {
    withAqeOff {
      import graft.operators.Sketch
      def hashes(f: Int): DataFrame =
        spark.range(1000L * f).select(
          (col("id") * 115292150460684L + 17L).as("sh_h"))
      val p1 = planOf(Sketch.hllOf(hashes(1)))
      val p10 = planOf(Sketch.hllOf(hashes(10)))
      assert(shuffleCount(p1) == shuffleCount(p10), s"1x=$p1\n10x=$p10")
      // the register agg must run partial (map-side max into <= 256
      // cells) — the property that makes the sketch a one-pass merge at
      // 100 TB; a plan that shuffles raw hashes to final-only aggs lost it
      assert(p10.contains("partial_max") || p10.contains("partial_"),
        s"register agg lost map-side partial aggregation:\n$p10")
      assert(!p10.contains("CartesianProduct"))
    }
  }

  test("q110 k-core peel-round count and per-round plan are invariant at 10x disjoint copies") {
    val sql = spark.sqlContext
    import sql.implicits._
    // disjoint relabeled copies of one community graph: edges/nodes
    // scale, degrees and peel DEPTH stay constant — the round budget is
    // the job count, so a data-size-dependent round count would be the
    // scale regression to catch
    val base = (0 until 30).flatMap(i =>
      Seq((i.toLong, (i + 1) % 30L), (i.toLong, (i + 2) % 30L), (i.toLong, (i + 3) % 30L)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    def blow(f: Int) = (0 until f).flatMap(s =>
      base.map { case (a, b) => (a * f + s, b * f + s) }).toDF("da", "db")
    def coreNodes(f: Int): Long = {
      val n = Graph.kCoreOf(blow(f), 4, Graph.KCoreRounds).count()
      TransientCache.drain()
      n
    }
    val n1 = coreNodes(1)
    val n10 = coreNodes(10)
    // a 6-regular circulant: its 4-core is the whole graph, per copy
    assert(n1 == 30 && n10 == 300, s"$n1 / $n10")
  }

  test("runtime envelopes: the six heaviest queries scale ~linearly from 10x to 30x disjoint copies") {
    import graft.operators.{Analytics, Dedup, Graph, TextOps}
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // disjoint corpus copies: every TOKEN carries the copy salt, so
    // copies never cross-match (same per-copy dup/df structure as the
    // base corpus — plain doc_id relabeling would make each doc a
    // near-dup of its f−1 copies and blow the pair tiers quadratically,
    // which is a different experiment)
    def blowDocs(f: Int): DataFrame = docs
      .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
      .select(col("doc_id").as("orig"),
        (col("doc_id") * f + col("__s")).as("doc_id"),
        array_join(transform(split(lower(col("text")), "\\s+"),
          t => concat(lit("c"), col("__s"), lit("_"), t)), " ").as("text"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s0"), col("l_partkey").as("p0"),
        col("l_orderkey").as("o0"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    def blowOrders(f: Int): DataFrame = ord
      .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
      .select((col("o_custkey") * f + col("__s")).as("o_custkey"),
        col("o_orderdate"), col("o_totalprice"))
    def blowEdges(f: Int): DataFrame = li.select(col("s0"), col("p0")).distinct()
      .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
      .select(((col("s0") * 2) * f + col("__s")).as("a"),
        ((col("p0") * 2 + 1) * f + col("__s")).as("b"))
    def blowLines(f: Int): DataFrame = li
      .withColumn("__s", explode(sequence(lit(0), lit(f - 1))))
      .select((col("o0") * f + col("__s")).as("o"),
        (col("p0") * f + col("__s")).as("p"))

    def rmRf(root: String): Unit = {
      import java.nio.file._
      import scala.jdk.CollectionConverters._
      val p = Paths.get(root)
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    // q88's corpus side is the at-rest index — built per factor UNTIMED
    // (the driver bench bills it to the cache tier, not q88's marginal)
    val roots = scala.collection.mutable.ArrayBuffer.empty[String]
    def winIdx(f: Int): Dedup.WinnowIndex = {
      val root = java.nio.file.Files.createTempDirectory("graft_env_widx_").toString
      roots += root
      Dedup.winnowIndexAt(spark, root,
        blowDocs(f).filter(col("orig") % 10 < 8).select(col("doc_id"), col("text")))
    }

    def timeIt(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      TransientCache.drain()
      dt
    }

    try {
      val idx10 = winIdx(10); val idx30 = winIdx(30)
      val probes: Seq[(String, Int => DataFrame)] = Seq(
        ("q91 pagerank", f => Graph.pageRankProd(blowEdges(f), "a", "b")),
        ("q88 delta winnow", f => Dedup.screenWinnowAgainstIndexOf(
          if (f == 30) idx30 else idx10,
          blowDocs(f).filter(col("orig") % 10 >= 8).select(col("doc_id"), col("text")))),
        ("q102 basket lift", f => Analytics.basketLiftFrom(blowLines(f),
          Analytics.BasketBlockCap)),
        ("q22 minhash lsh", f => Dedup.minhashLshFrom(
          Dedup.shingleRowsOf(blowDocs(f).select(col("doc_id"), col("text"))))),
        ("q76 span dedup", f => TextOps.spanCleanOf(
          blowDocs(f).select(col("doc_id"), col("text")))
          .select(col("doc_id"), md5(col("clean_text")).as("m"))),
        // r13 newcomer to the heavy tier: customers AND distinct rank
        // keys scale, RfmBuckets stays the config bound
        ("q111 rfm segments", f => Analytics.rfmOf(blowOrders(f))))
      probes.foreach { case (name, build) =>
        timeIt(build(1)) // unmeasured warmup: JIT/codegen/scan init
        val t10 = timeIt(build(10))
        val t30 = timeIt(build(30))
        val slope = t30 / t10
        info(f"$name: t10=$t10%.2fs t30=$t30%.2fs slope=$slope%.2f (linear = 3.0)")
        // generous: catches superlinear blow-ups (slope >> 3 with real
        // magnitudes), ignores fixed-overhead noise on small inputs
        assert(t30 <= 6.0 * t10 + 3.0,
          f"$name superlinear: t10=$t10%.2fs t30=$t30%.2fs (slope $slope%.2f)")
      }
    } finally {
      Dedup.clearWinnowIndexAtRest(spark)
      roots.foreach(rmRf)
      TransientCache.drain()
    }
  }

  test("10x running balance stays within a loose linear-runtime envelope") {
    val ledger = Tables.ledger(spark, dir).cache()
    ledger.count()
    def timeIt(df: DataFrame): Double = {
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    }
    // warm both plans once (codegen + shuffle setup), then measure
    timeIt(Stock.withBalance(blowUpLedger(ledger, 1)))
    val t1 = timeIt(Stock.withBalance(blowUpLedger(ledger, 1)))
    val t10 = timeIt(Stock.withBalance(blowUpLedger(ledger, 10)))
    ledger.unpersist()
    // generous: catches quadratic blow-ups, ignores local noise
    assert(t10 <= 25 * t1 + 5.0, f"t1=$t1%.2fs t10=$t10%.2fs")
  }
}
