package graft.funcs

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-buffer array aggregates for signature computation (MinHash bit
  * mins, SimHash bit balances). r1 computed these as 128 (resp. 64)
  * independent aggregate columns, which made the aggregation schema and the
  * generated code enormous; here ONE `Aggregator` keeps the whole signature
  * in one mutable `Array[Long]` buffer updated in place per input row
  * (ObjectHashAggregate keeps the buffer deserialized between updates, and
  * partial aggregation still applies across partitions — map-side combine on
  * the group key, exactly one shuffle).
  *
  * Public-API only: `Aggregator` + `functions.udaf`, no Catalyst internals.
  */
object ArrayAggregates {

  private val P31 = 2147483647L // 2^31 - 1, see Dedup

  private implicit val longArrayEnc: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  /** MinHash signature aggregate: for each permutation i, the running min of
    * `(a(i) * h + b(i)) mod P31` over all input hashes `h` of the group.
    * Identical math (and results) to the 128-column formulation it replaces.
    */
  final class MinHashAgg(a: Array[Long], b: Array[Long])
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val n = a.length
    override def zero: Array[Long] = Array.fill(n)(Long.MaxValue)
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < n) {
        val v = (a(i) * h + b(i)) % P31
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < n) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  /** SimHash bit-balance aggregate: input is a 64-bit hash split into two
    * 32-bit words (w0 = bits 0..31, w1 = bits 32..63, both non-negative);
    * buffer slot i accumulates +1 when bit i is set, -1 when clear. The
    * word split keeps every value non-negative so the same bit extraction
    * `(word >> bit) & 1` is expressible in ANSI SQL for the DuckDB oracle.
    */
  final class BitBalanceAgg extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](64)
    override def reduce(buf: Array[Long], w: (Long, Long)): Array[Long] = {
      var i = 0
      while (i < 32) {
        buf(i) += (((w._1 >>> i) & 1L) * 2L - 1L)
        buf(i + 32) += (((w._2 >>> i) & 1L) * 2L - 1L)
        i += 1
      }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 64) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    override def outputEncoder: Encoder[Array[Long]] = longArrayEnc
  }

  /** Column function: MinHash signature (array of mins) of a group of 31-bit
    * hashes under the given permutation coefficients. */
  def minhash(a: Array[Long], b: Array[Long])(h: Column): Column =
    udaf(new MinHashAgg(a, b)).apply(h)

  /** Column function: 64 bit-balance sums of a group of 64-bit hashes given
    * as (low word, high word) pairs. */
  def bitBalance(w0: Column, w1: Column): Column =
    udaf(new BitBalanceAgg).apply(w0, w1)
}
