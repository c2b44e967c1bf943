package graft.functions

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._

/** Deterministic hashing primitives for near-duplicate detection.
  *
  * The hash family is md5-based on purpose: md5 produces identical hex
  * strings in every engine, so MinHash signatures and SimHash bits are
  * exactly reproducible by the DuckDB oracle (and by any other system that
  * might re-verify results). All compositions are Spark built-ins →
  * whole-stage codegen, no UDFs.
  */
object HashFunctions {

  /** MinHash permutation family: one md5 per shingle parsed to a base
    * integer, then k affine permutations h_i(x) = (a_i·x + b_i) mod p over
    * the prime p = 2^31-1. One cryptographic hash per shingle instead of k —
    * the k permutations are integer arithmetic (codegen-cheap), and the
    * whole family reproduces exactly in any engine with 64-bit ints. */
  val MinhashPrime = 2147483647L // 2^31 - 1
  def minhashA(i: Int): Long = ((i + 1).toLong * 2654435761L) % MinhashPrime
  def minhashB(i: Int): Long = ((i + 1).toLong * 40503L) % MinhashPrime

  /** Base integer per shingle: first 15 hex chars of md5 → int64, mod p. */
  def shingleBase(shingleArr: Column): Column =
    transform(shingleArr,
      s => pmod(conv(substring(md5(s), 1, 15), 16, 10).cast("long"), lit(MinhashPrime)))

  /** Signature from a pre-computed base array (array<long> of length k). */
  def minhashSignatureFromBase(baseArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(baseArr,
        h => pmod(minhashAExpr(i) * h + minhashBExpr(i), lit(MinhashPrime)))))

  private def minhashAExpr(i: Column): Column =
    pmod((i + 1).cast("long") * lit(2654435761L), lit(MinhashPrime))
  private def minhashBExpr(i: Column): Column =
    pmod((i + 1).cast("long") * lit(40503L), lit(MinhashPrime))

  def minhashSignature(shingleArr: Column, k: Int): Column =
    minhashSignatureFromBase(shingleBase(shingleArr), k)

  /** LSH band keys over the integer signature: `b|sig[b·r+1]|…` strings. */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws("|", (b.cast("string") +:
        (0 until rows).map(r => element_at(sig, b * rows + r + 1).cast("string"))): _*))

  /** 32-bit SimHash over a token array, returned as a 32-char '0'/'1'
    * string (MSB first). Bit j comes from nibble j/4 of md5(token); the
    * per-token bit weight is +1/-1; the final bit is sign(sum).
    * Nibble→bits decoding uses position arithmetic on the hex alphabet so
    * the DuckDB oracle can mirror it exactly. */
  def simhash32(tokens: Column): Column = {
    val bitCols: Seq[Column] = (0 until 32).map { j =>
      val nib = j / 4          // which hex char of the md5 (1-based substr)
      val off = 3 - (j % 4)    // bit within the nibble, MSB first
      simhashBit(tokens, nib, off)
    }
    concat(bitCols: _*)
  }

  private def simhashBit(tokens: Column, nib: Int, off: Int): Column = {
    val votes = aggregate(tokens, lit(0),
      (acc, t) => {
        val nibVal = conv(substring(md5(t), nib + 1, 1), 16, 10).cast("int")
        val bit = shiftright(nibVal, off).bitwiseAND(1)
        acc + (bit * 2 - 1)
      })
    when(votes > 0, lit("1")).otherwise(lit("0"))
  }

  /** Hamming distance between two equal-length '0'/'1' bit strings. */
  def hammingBits(a: Column, b: Column): Column =
    aggregate(
      zip_with(split(a, ""), split(b, ""), (x, y) => when(x =!= y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
}
