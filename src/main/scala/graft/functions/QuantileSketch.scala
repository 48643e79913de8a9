package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed sampled-quantile sketch as a Spark `Aggregator` — the GROUPED
  * production shape of q90's relational global estimator, completing the
  * sketch family's symmetry (KMV distinct-count, CMS frequency, Bloom
  * membership each pair a relational oracle-checked form with a typed
  * mergeable twin): per-group quantiles in ONE hash-agg, no per-group
  * sort, bounded state per group.
  *
  * Buffer: the (≤ k) smallest rows by (hash, id), as a flat Long array of
  * interleaved (h, id, v) triplets kept sorted lexicographically by
  * (h, id) — a value-carrying KMV. The id tiebreak (the caller's unique
  * row id) makes the kept sample EXACTLY the relational
  * `ORDER BY h, id LIMIT k` set even under hash collisions, which is
  * what lets QuantileSketchSpec assert bit-identity against q90's
  * relational form rather than approximate agreement. `reduce`/`merge`
  * are associative/commutative with the empty identity (the algebra
  * Spark's partial aggregation requires), so the sample — and therefore
  * every estimate — is independent of row order, partitioning and merge
  * tree.
  *
  * Estimate: sort the ≤ k sample values, read each probe p at the exact
  * rank `floor((n−1)·p)` (0-based) — q41/q90's interpolation-free rank
  * formula; exact while the group is smaller than k (the buffer IS the
  * group), DKW-bounded O(1/√k) rank error beyond it.
  */
class QuantileSketch(k: Int, ps: Seq[Double])
    extends Aggregator[(Long, Long, Long), Array[Long], Seq[Long]] {
  require(k >= 1, "quantile sketch needs k >= 1")
  require(ps.forall(p => p >= 0.0 && p <= 1.0), "probe points must be in [0, 1]")

  override def zero: Array[Long] = Array.empty

  // lexicographic (h, id) compare of triplet t (0-based) in b vs (h, id)
  private def cmp(b: Array[Long], t: Int, h: Long, id: Long): Int = {
    val ch = java.lang.Long.compare(b(3 * t), h)
    if (ch != 0) ch else java.lang.Long.compare(b(3 * t + 1), id)
  }

  /** Insert one (h, id, v) row keeping the k smallest distinct (h, id). */
  override def reduce(b: Array[Long], row: (Long, Long, Long)): Array[Long] = {
    val (h, id, v) = row
    val n = b.length / 3
    // binary search for (h, id)
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(b, mid, h, id) < 0) lo = mid + 1 else hi = mid
    }
    if (lo < n && cmp(b, lo, h, id) == 0) b // exact redelivery: keep first
    else if (n < k || lo < k) {
      val outN = math.min(n + 1, k)
      val out = new Array[Long](3 * outN)
      System.arraycopy(b, 0, out, 0, 3 * lo)
      out(3 * lo) = h; out(3 * lo + 1) = id; out(3 * lo + 2) = v
      System.arraycopy(b, 3 * lo, out, 3 * (lo + 1), 3 * (outN - lo - 1))
      out
    } else b // beyond the current k-th minimum: not in the sketch
  }

  /** Keep the k smallest distinct (h, id) of the union — a sorted merge. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val na = a.length / 3; val nb = b.length / 3
    val outN = math.min(na + nb, k)
    val out = new Array[Long](3 * outN)
    var i = 0; var j = 0; var n = 0
    var lastH = 0L; var lastId = 0L
    while (n < outN && (i < na || j < nb)) {
      val takeA = j >= nb || (i < na && cmp(a, i, b(3 * j), b(3 * j + 1)) <= 0)
      val src = if (takeA) a else b
      val t = if (takeA) i else j
      val (h, id, v) = (src(3 * t), src(3 * t + 1), src(3 * t + 2))
      if (takeA) i += 1 else j += 1
      if (n == 0 || h != lastH || id != lastId) {
        out(3 * n) = h; out(3 * n + 1) = id; out(3 * n + 2) = v
        n += 1; lastH = h; lastId = id
      }
    }
    if (n == outN) out else java.util.Arrays.copyOf(out, 3 * n)
  }

  override def finish(b: Array[Long]): Seq[Long] = {
    val n = b.length / 3
    if (n == 0) Seq.empty
    else {
      val vals = new Array[Long](n)
      var i = 0
      while (i < n) { vals(i) = b(3 * i + 2); i += 1 }
      java.util.Arrays.sort(vals)
      ps.map(p => vals(math.floor(p * (n - 1)).toInt))
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object QuantileSketch {
  /** Typed-column form over (hash, id, value) rows:
    * `rows.as[(Long, Long, Long)].select(QuantileSketch.estimates(256, ps))`
    * or per-group via `groupByKey(...).agg(...)`.
    */
  def estimates(k: Int, ps: Seq[Double])
      : org.apache.spark.sql.TypedColumn[(Long, Long, Long), Seq[Long]] =
    new QuantileSketch(k, ps).toColumn
}
