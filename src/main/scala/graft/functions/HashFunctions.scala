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

  /** MinHash signature over a shingle array: element `i` is the
    * lexicographic min of `md5(i ":" shingle)` — a valid permutation-family
    * minhash (each seed induces an independent pseudo-random order). */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingleArr,
        s => md5(concat(seed.cast("string"), lit(":"), s)))))

  /** LSH band keys: split the k-element signature into `bands` groups of
    * `rows` and hash each group; docs sharing any band key are candidates. */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(b.cast("string"), lit("|"),
        md5(concat_ws(",", slice(sig, b * rows + 1, lit(rows))))))

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
