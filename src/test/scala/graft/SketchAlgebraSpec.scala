package graft

import graft.functions.{BloomSketch, CmsSketch, KmvSketch}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws for the sketch family's merge algebra — the
  * exact guarantees Spark's partial aggregation relies on: `merge` must
  * be associative and commutative (partials combine in arbitrary tree
  * order across executors), `zero` must be an identity, and the result
  * must equal folding the whole stream through `reduce` (what a single
  * partition computes). Checked on driver-side buffers with scalacheck
  * inputs — no Spark session needed; the distributed twin (repartition
  * invariance) lives in the per-sketch specs.
  *
  * Buffers are mutated by reduce/merge (Aggregator contract), so every
  * law clones its inputs before combining.
  */
class SketchAlgebraSpec extends AnyFunSuite {

  private val hashes: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, (1L << 60) - 1)).map(_.take(200))

  private def run(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, s"$name: $r")
  }

  // --- shared driver: fold a stream into a buffer through reduce -------

  private def kmvOf(k: Int, xs: Seq[Long]): Array[Long] = {
    val agg = new KmvSketch(k)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
  }

  private def cmsOf(xs: Seq[Long]): Array[Long] = {
    val agg = new CmsSketch(4, 64)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b.clone(), x))
  }

  private def bloomOf(xs: Seq[Long]): Array[Long] = {
    val agg = new BloomSketch(512, 3)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b.clone(), x))
  }

  test("KMV: merge is associative/commutative with zero identity, and equals the one-pass fold") {
    val agg = new KmvSketch(16)
    run("kmv", Prop.forAll(hashes, hashes, hashes) { (a, b, c) =>
      def m(x: Array[Long], y: Array[Long]) = agg.merge(x.clone(), y.clone())
      val (sa, sb, sc) = (kmvOf(16, a), kmvOf(16, b), kmvOf(16, c))
      m(m(sa, sb), sc).sameElements(m(sa, m(sb, sc))) &&
      m(sa, sb).sameElements(m(sb, sa)) &&
      m(sa, agg.zero).sameElements(sa) &&
      m(sa, sb).sameElements(kmvOf(16, a ++ b))
    })
  }

  test("CMS: merge is associative/commutative with zero identity, and equals the one-pass fold") {
    val agg = new CmsSketch(4, 64)
    run("cms", Prop.forAll(hashes, hashes, hashes) { (a, b, c) =>
      def m(x: Array[Long], y: Array[Long]) = agg.merge(x.clone(), y.clone())
      val (sa, sb, sc) = (cmsOf(a), cmsOf(b), cmsOf(c))
      m(m(sa, sb), sc).sameElements(m(sa, m(sb, sc))) &&
      m(sa, sb).sameElements(m(sb, sa)) &&
      m(sa, agg.zero).sameElements(sa) &&
      m(sa, sb).sameElements(cmsOf(a ++ b))
    })
  }

  test("Bloom: merge is associative/commutative/IDEMPOTENT with zero identity, equals the fold") {
    val agg = new BloomSketch(512, 3)
    run("bloom", Prop.forAll(hashes, hashes, hashes) { (a, b, c) =>
      def m(x: Array[Long], y: Array[Long]) = agg.merge(x.clone(), y.clone())
      val (sa, sb, sc) = (bloomOf(a), bloomOf(b), bloomOf(c))
      m(m(sa, sb), sc).sameElements(m(sa, m(sb, sc))) &&
      m(sa, sb).sameElements(m(sb, sa)) &&
      m(sa, agg.zero).sameElements(sa) &&
      m(sa, sa).sameElements(sa) && // OR-idempotence: re-ingest is free
      m(sa, sb).sameElements(bloomOf(a ++ b))
    })
  }

  /** Domain-consistent keyed rows: h and v are FUNCTIONS of the row id
    * (in production h = salted hash60 of the id, v its column value), so
    * a repeated id is a redelivery of the same triplet — never two
    * values under one sample key. The 8-bit pseudo-hash forces real
    * (h, id) tiebreak work. The sketch algebra is only claimed on this
    * domain; that is the keyed-source contract its callers satisfy.
    */
  private val keyedRows: Gen[List[(Long, Long, Long)]] =
    Gen.listOf(Gen.choose(0L, 300L))
      .map(_.take(200).map(id => ((id * 37) % 256, id, id * 7 - 50)))

  private def qsOf(agg: graft.functions.QuantileSketch,
                   xs: Seq[(Long, Long, Long)]): Array[Long] =
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))

  test("Quantile: merge is associative/commutative/idempotent with zero identity, equals the fold") {
    val agg = new graft.functions.QuantileSketch(16, Seq(0.25, 0.5, 0.75))
    run("quantile", Prop.forAll(keyedRows, keyedRows, keyedRows) { (a, b, c) =>
      def m(x: Array[Long], y: Array[Long]) = agg.merge(x.clone(), y.clone())
      val (sa, sb, sc) = (qsOf(agg, a), qsOf(agg, b), qsOf(agg, c))
      m(m(sa, sb), sc).sameElements(m(sa, m(sb, sc))) &&
      m(sa, sb).sameElements(m(sb, sa)) &&
      m(sa, agg.zero).sameElements(sa) &&
      m(sa, sa).sameElements(sa) && // keyed sample: re-ingest is free
      m(sa, sb).sameElements(qsOf(agg, a ++ b)) // partials == one pass
    })
  }

  test("Quantile: exact rank selection below capacity, under any split") {
    val agg = new graft.functions.QuantileSketch(64, Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    run("quantile-exact", Prop.forAll(keyedRows, Gen.choose(0, 200)) { (xs0, cut) =>
      // unique ids => a keyed stream; ≤ 64 rows => the buffer IS the group
      val xs = xs0.zipWithIndex.map { case ((h, _, v), i) => (h, i.toLong, v) }.take(64)
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val merged = agg.merge(qsOf(agg, l), qsOf(agg, r))
      val sorted = xs.map(_._3).sorted
      val expect =
        if (sorted.isEmpty) Seq.empty
        else Seq(0.0, 0.25, 0.5, 0.75, 1.0)
          .map(p => sorted(math.floor(p * (sorted.size - 1)).toInt))
      agg.finish(merged) == expect
    })
  }

  private def hllOf(xs: Seq[Long]): Array[Int] = {
    val agg = new graft.functions.HllSketch(64)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
  }

  test("HLL: merge is associative/commutative/IDEMPOTENT with zero identity, equals the fold") {
    val agg = new graft.functions.HllSketch(64)
    run("hll", Prop.forAll(hashes, hashes, hashes) { (a, b, c) =>
      def m(x: Array[Int], y: Array[Int]) = agg.merge(x.clone(), y.clone())
      val (sa, sb, sc) = (hllOf(a), hllOf(b), hllOf(c))
      m(m(sa, sb), sc).sameElements(m(sa, m(sb, sc))) &&
      m(sa, sb).sameElements(m(sb, sa)) &&
      m(sa, agg.zero).sameElements(sa) &&
      m(sa, sa).sameElements(sa) && // idempotent: the q109 replay guard
      m(sa, sb).sameElements(hllOf(a ++ b))
    })
  }

  test("HLL: out-of-contract hashes fail fast at the seam, not mid-array") {
    val agg = new graft.functions.HllSketch(64)
    for (bad <- Seq(-1L, Long.MinValue, 1L << 60)) {
      val e = intercept[IllegalArgumentException](agg.reduce(agg.zero, bad))
      assert(e.getMessage.contains("sub-2^60"), s"for $bad: ${e.getMessage}")
    }
  }

  test("CMS/Bloom point guarantees hold under any merge order") {
    run("guarantees", Prop.forAll(hashes, hashes) { (a, b) =>
      val cms = new CmsSketch(4, 64)
      val merged = cms.merge(cmsOf(a).clone(), cmsOf(b))
      val all = a ++ b
      val counts = all.groupBy(identity).view.mapValues(_.size).toMap
      val neverUnder = counts.forall { case (x, n) => cms.estimate(merged, x) >= n }
      val bloom = new BloomSketch(512, 3)
      val bm = bloom.merge(bloomOf(a).clone(), bloomOf(b))
      val noFalseNeg = all.forall(x => BloomSketch.contains(bm, x, 3))
      neverUnder && noFalseNeg
    })
  }
}
