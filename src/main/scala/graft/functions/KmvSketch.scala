package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed k-minimum-values distinct-count sketch as a Spark `Aggregator` —
  * the (b)-tier custom-aggregation surface (SURVEY.md §2.10), and the
  * production shape of q40's relational KMV demonstrator: a BOUNDED,
  * MERGEABLE buffer that flows through Spark's partial aggregation
  * (map-side partials, merge at the exchange) exactly like a built-in.
  *
  * Buffer: the (≤ k) smallest DISTINCT hash values seen, kept sorted
  * ascending. `reduce`/`merge` are associative and commutative, so the
  * estimate is independent of row order and partitioning — the property
  * that makes sketches composable across 1000 executors (and mergeable
  * across days in an incremental pipeline, which a relational top-k is
  * not without re-unioning raw values).
  *
  * Estimate: exact size while the universe is smaller than k (the buffer
  * IS the distinct set); otherwise n̂ = (k−1)·H/h_k with H = 2^60 — the
  * same estimator as [[graft.operators.Sketch]], bit-for-bit.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2, "KMV needs k >= 2")

  private val HashSpace = 1152921504606846976.0 // 2^60, exact in double

  override def zero: Array[Long] = Array.empty

  /** Insert `h` keeping the buffer the sorted distinct k-minimum set. */
  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b // h >= current k-th minimum: not in the sketch
    }
  }

  /** Keep the k smallest of the (distinct) union — a sorted-array merge. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0; var last = 0L
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || v != last) { out(n) = v; n = n + 1; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): Double =
    if (b.length < k) b.length.toDouble // exact below sketch capacity
    else (k - 1).toDouble * HashSpace / b(k - 1).toDouble

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvSketch {
  /** Typed-column form, applied to a `Dataset[Long]` of hash values:
    * `hashes.as[Long].select(KmvSketch.distinctEstimate(64))`.
    */
  def distinctEstimate(k: Int): org.apache.spark.sql.TypedColumn[Long, Double] =
    new KmvSketch(k).toColumn
}
