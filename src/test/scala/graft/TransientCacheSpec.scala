package graft

import graft.operators.{Contamination, Dedup, Graph, Sessions, Sketch, TextOps}

/** Eviction hygiene for per-query transient caches: after a query is
  * materialized and [[TransientCache.drain]] runs, none of its cached
  * frames may survive (a long-lived session running the dedup /
  * contamination tier repeatedly would otherwise pin blocks until
  * session stop). Shared cross-query caches (the shingle index) are
  * explicitly OUT of scope — they are the bench's `cache` tier, so each
  * test materializes them FIRST and asserts the persisted-RDD set
  * returns exactly to that baseline.
  */
class TransientCacheSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def checkDrains(build: => org.apache.spark.sql.DataFrame,
                          expectTransients: Int): Unit = {
    TransientCache.drain() // clean slate from other tests
    // baseline: every shared cache the queries under test consume,
    // already warm — anything beyond this after drain is a leak
    Dedup.shingleIndex(spark, dir).count()
    val baseline = persistedIds
    build.collect()
    val n = TransientCache.drain()
    assert(n >= expectTransients,
      s"expected >= $expectTransients registered transients, got $n")
    // unpersist(blocking=false): the persistent-RDD registry update is
    // synchronous on the driver, but give the listener bus a moment
    val deadline = System.nanoTime() + 10e9.toLong
    while ((persistedIds -- baseline).nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert((persistedIds -- baseline).isEmpty,
      s"transient cached RDDs survived drain: ${persistedIds -- baseline}")
  }

  test("q72 fuzzyContamination transients (cand, docSets) drain") {
    checkDrains(Contamination.fuzzyContamination(spark, dir), 2)
  }

  test("q99 triangleCounts transients (edge list, oriented list) drain") {
    // the simhash signature frame is a shared bench tier (q23/q24/q45's
    // input) — warm it into the baseline like the shingle index
    Dedup.simhash(spark, dir).count()
    checkDrains(Graph.triangleCounts(spark, dir), 2)
  }

  test("q87 splitLeakage transients (bands, cand, docSets) drain") {
    checkDrains(Contamination.splitLeakage(spark, dir), 3)
  }

  test("q86 winnowPairs transient (df-guarded keep projection) drains") {
    // q86's shared winnow index is a bench cache tier (out of scope, like
    // the shingle index) — warm it into the baseline first
    Dedup.winnowIndex(spark, dir).count()
    checkDrains(Dedup.winnowPairs(spark, dir), 1)
  }

  test("q88 deltaWinnow transients (batch fp, keep, shared, cand fp) drain") {
    // the at-rest winnow index writes parquet, no persisted RDDs — build
    // it first so its one-time cost stays out of the drain accounting
    Dedup.winnowIndexAtRest(spark, dir)
    checkDrains(Dedup.deltaWinnow(spark, dir), 4)
  }

  test("q40 kmvDistinct transient (distinct hash frame) drains") {
    checkDrains(Sketch.kmvDistinct(spark, dir), 1)
  }

  test("q111 rfmSegments transients (customer base + stacked value histogram) drain") {
    checkDrains(graft.operators.Analytics.rfmSegments(spark, dir), 2)
  }

  test("q112 quotaSample transient (salted rank base) drains") {
    checkDrains(graft.operators.Sampling.quotaSample(spark, dir), 1)
  }

  test("q114 mixQuotaSample transients (weight counts + round quota frame + salted rank base) drain") {
    checkDrains(graft.operators.Sampling.mixQuotaSample(spark, dir), 3)
  }

  test("q116 groupedQuantiles transient (tie-collapsed value histogram) drains") {
    checkDrains(graft.operators.Analytics.groupedQuantiles(spark, dir), 1)
  }

  test("q107 peakConcurrency transient (boundary stream) drains") {
    checkDrains(Sessions.peakConcurrency(spark, dir), 1)
  }

  test("q22 minhashLsh transients (cand, docSets) drain") {
    checkDrains(Dedup.minhashLsh(spark, dir), 2)
  }

  test("q51 fuzzyTitles transient (titled projection) drains") {
    checkDrains(Dedup.fuzzyTitles(spark, dir), 1)
  }

  test("q74 deltaMinhash transients (batch shingles, cand) drain") {
    checkDrains(Dedup.deltaMinhash(spark, dir), 2)
  }

  test("q66 boilerplate transients (token frame, gram stream) drain") {
    checkDrains(TextOps.boilerplateRemoval(spark, dir), 2)
  }

  test("q76 spanDedup transients (token frame, gram stream) drain") {
    checkDrains(TextOps.spanDedup(spark, dir), 2)
  }

  test("q77 unigramLikelihood transients (token stream, vocab) drain") {
    checkDrains(TextOps.unigramLikelihood(spark, dir), 2)
  }

  test("q73 semDedup transient (cluster assignment) drains") {
    checkDrains(graft.operators.Similarity.semDedup(spark, dir), 1)
  }

  test("unigramLikelihoodProd transients (token stream, vocab) drain") {
    checkDrains(TextOps.unigramLikelihoodProd(spark, dir), 2)
  }

  test("q78 mixtureWeights transient (source counts) drains") {
    checkDrains(TextOps.mixtureWeights(spark, dir), 1)
  }

  test("q80 minhashEstimate transient (signature frame) drains") {
    checkDrains(Dedup.minhashEstimate(spark, dir), 1)
  }

  test("q82 cmsHeavyHitters transient (hashed token stream) drains") {
    checkDrains(Sketch.cmsHeavyHitters(spark, dir), 1)
  }

  test("q91 pageRank transients (edges, degrees, annotated edges) drain") {
    checkDrains(graft.operators.Graph.supplierPartRank(spark, dir), 3)
  }

  test("deep-budget pageRank's final lineage checkpoint drains (r11 advice)") {
    // 12 iterations crosses the truncation cadence twice: the superseded
    // checkpoint is dropped inline, the FINAL one (round 10) stays pinned
    // for the caller and must be reclaimed by the harness drain — 3
    // cached transients + 1 registered checkpoint
    import org.apache.spark.sql.functions.col
    val edges = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").cast("long").as("s"),
        col("l_partkey").cast("long").as("p"))
    checkDrains(
      graft.operators.Graph.pageRankImpl(edges, "s", "p",
        iters = 12, orderedFold = false, assumeDeduped = false),
      4)
  }

  test("q95 bpeMerges transients (vocab chain + winners) drain") {
    // v0 + 4 winner frames + 3 intermediate merged vocabs
    checkDrains(TextOps.bpeMerges(spark, dir), 8)
  }

  test("q96 sourceDrift transient (source-token counts) drains") {
    checkDrains(TextOps.sourceDrift(spark, dir), 1)
  }

  test("q97 bpeSegment transients (doc-word frame + trainer chain) drain") {
    // dw + v0 + 4 winners + 3 intermediate merged vocabs (the round-4
    // applied vocab is deliberately uncached)
    checkDrains(TextOps.bpeSegment(spark, dir), 9)
  }

  test("q98 sourceOverlap transients (source-gram frame, guarded frame) drain") {
    checkDrains(Dedup.sourceOverlap(spark, dir), 2)
  }

  test("q92 bigramLikelihood transients (bigram stream, unigram) drain") {
    // the c2 model is the shared `bigram` cache tier now (out of scope,
    // like the shingle index) — warm it into the baseline first
    TextOps.bigramCounts(spark, dir).count()
    checkDrains(TextOps.bigramLikelihood(spark, dir), 2)
  }

  test("q94 collocations transient (word counts) drains") {
    TextOps.bigramCounts(spark, dir).count()
    checkDrains(TextOps.collocations(spark, dir), 1)
  }

  test("q100 cooccurrence transient (unigram marginal) drains") {
    TextOps.bigramCounts(spark, dir).count()
    checkDrains(TextOps.cooccurrence(spark, dir), 1)
  }

  test("q102 basketLift transient (distinct basket frame) drains") {
    checkDrains(graft.operators.Analytics.basketLift(spark, dir), 1)
  }

  test("drained query recomputes correctly (no dangling reuse)") {
    val a = Contamination.fuzzyContamination(spark, dir).collect().toSeq
    TransientCache.drain()
    val b = Contamination.fuzzyContamination(spark, dir).collect().toSeq
    TransientCache.drain()
    assert(a == b)
  }
}
