package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed HyperLogLog register sketch as a Spark `Aggregator` — the
  * production twin of q108's relational register pass, completing the
  * typed sketch family (KMV / CMS / Bloom / quantile / HLL). The buffer
  * IS the sketch: m register maxima in a dense `Array[Int]` (1 KB at
  * m = 256), folded map-side by partial aggregation and merged at the
  * exchange by ELEMENT-WISE MAX — idempotent and commutative, so the
  * result is independent of row order, partitioning, duplication, and
  * merge tree shape (the union algebra q109's at-rest advance leans on,
  * here as executor-side partials).
  *
  * Register/rank arithmetic is bit-identical to
  * [[graft.operators.Sketch.registersOf]]: register = the hash's low
  * log2(m) bits, rank = leftmost-1-bit position in the remaining
  * w = 60 − log2(m) bits (computed via numberOfLeadingZeros — the same
  * ⌊log2⌋+1 identity the relational tier's `length(bin(hq))` encodes),
  * all-zero window ⇒ the standard w+1 sentinel. Output is the raw
  * register array (the CmsSketch convention: bounded driver state, the
  * caller derives estimates), with [[HllSketch.estimate]] reproducing
  * q108's exact-integer-then-one-division estimate bit-for-bit
  * (differential-spec'd on the shared fixture).
  */
class HllSketch(m: Int) extends Aggregator[Long, Array[Int], Array[Int]] {
  require(m >= 2 && (m & (m - 1)) == 0, "m must be a power of two")

  private val w = 60 - java.lang.Integer.numberOfTrailingZeros(m)
  private val sentinel = w + 1

  override def zero: Array[Int] = new Array[Int](m)

  override def reduce(b: Array[Int], h: Long): Array[Int] = {
    // The 60-bit contract enforced at the seam: a raw 64-bit (possibly
    // negative) hash would make (h % m) negative and throw an opaque
    // array exception mid-job — fail fast with the contract instead.
    require(h >= 0 && h < (1L << 60),
      s"HllSketch expects nonnegative sub-2^60 hashes (the registersOf " +
        s"contract: hash64 & ((1<<60)-1)); got $h")
    val reg = (h % m).toInt
    val hq = h / m
    val rk =
      if (hq > 0) sentinel - (64 - java.lang.Long.numberOfLeadingZeros(hq))
      else sentinel
    if (rk > b(reg)) b(reg) = rk
    b
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(b: Array[Int]): Array[Int] = b

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()

  override def outputEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
}

object HllSketch {

  /** Typed-column form over a `Dataset[Long]` of 60-bit hash values:
    * `hashes.as[Long].select(HllSketch.registers(256)).head()` — the
    * m-int register array as bounded driver state.
    */
  def registers(m: Int): org.apache.spark.sql.TypedColumn[Long, Array[Int]] =
    new HllSketch(m).toColumn

  /** The q108 estimate off a register array — the SAME operation order
    * as the relational `hllEstimate` (exact BIGINT harmonic sum scaled
    * by 2^(w+1), one double division against the alpha·m²·2^(w+1)
    * constant), so typed and relational estimates agree bit-for-bit.
    */
  def estimate(regs: Array[Int]): Double = {
    val m = regs.length
    val w1 = 61 - java.lang.Integer.numberOfTrailingZeros(m) // w + 1
    var sum = 0L
    regs.foreach(mj => sum += 1L << (w1 - mj))
    0.7213 / (1.0 + 1.079 / m) * (m.toDouble * m.toDouble) *
      (1L << w1).toDouble / sum.toDouble
  }
}
