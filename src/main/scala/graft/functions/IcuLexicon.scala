package graft.functions

import com.ibm.icu.impl.ICUBinary
import com.ibm.icu.util.CharsTrie
import scala.jdk.CollectionConverters._

/** Loader for ICU4J's bundled CJK dictionary (`brkitr/cjdict.dict` inside
  * icu4j, ICU/Unicode license) — a REAL production-scale segmentation
  * lexicon (~350k entries with per-word frequency-derived costs, the data
  * ICU's own `CjkBreakEngine` segments Chinese/Japanese with). This is the
  * open-licensed "ship a real lexicon" slot of the reference's pluggable
  * analyzer registry (`hugegraph-server/hugegraph-core/.../analyzer/
  * AnalyzerFactory.java:34-53` constructs each segmenter with its bundled
  * dictionary); here the host jar on the Spark classpath already carries
  * the data, so no network or vendored copy is needed.
  *
  * Format (public ICU `dictionarydata.h` layout, read with PUBLIC ICUBinary
  * APIs only): ICU data header (format id "Dict"), 8 int32 indexes, then a
  * UChars-serialized [[CharsTrie]] mapping word → value. For cjdict the
  * value is a SCALED NEGATIVE LOG PROBABILITY (snlp, small = frequent) —
  * ICU's break engine minimizes Σ value over a segmentation; our Viterbi
  * maximizes Σ lp, so lp(w) = −value(w) plugs straight into the same
  * integer-exact DP contract as [[TextFunctions.microLogProbs]]. */
object IcuLexicon {

  private val DataFormat = 0x44696374 // "Dict"
  private val IxStringTrieOffset = 0
  private val IxTrieType = 4
  private val TrieTypeMask = 0x7
  private val TrieTypeUChars = 1

  /** (word, snlp value) for every entry of an ICU .dict resource. */
  def loadDict(name: String): Seq[(String, Int)] = {
    val bytes = ICUBinary.getRequiredData(s"brkitr/$name")
    ICUBinary.readHeader(bytes, DataFormat, null)
    val indexes = ICUBinary.getInts(bytes, 8, 0)
    require((indexes(IxTrieType) & TrieTypeMask) == TrieTypeUChars,
      s"$name: only UChars tries supported (cjdict is one)")
    // getInts consumed the 8 index ints (32 bytes); the trie starts at
    // IX_STRING_TRIE_OFFSET from the post-header data start
    ICUBinary.skipBytes(bytes, indexes(IxStringTrieOffset) - 32)
    val chars = ICUBinary.getString(bytes, bytes.remaining() / 2, 0)
    new CharsTrie(chars, 0).iterator().asScala
      .map(e => (e.chars.toString, e.value)).toSeq
  }

  /** The CJK lexicon as (word, lp) with lp = −snlp — additive integer
    * Viterbi scores, larger = more probable, exact under any sum order
    * (the [[TextFunctions.microLogProbs]] contract at a coarser scale).
    * Restricted to pure-Han words (cjdict also carries kana entries that
    * our Han-run segmenter never sees). Memoized: one trie walk per JVM. */
  lazy val cjkScoreLexicon: Seq[(String, Long)] = loadDict("cjdict.dict")
    .collect { case (w, v) if w.codePoints().allMatch(cp =>
      Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN) =>
      (w, -v.toLong) }

  /** Unknown-single-character score: one snlp step below the worst
    * lexicon entry, so any in-dictionary word beats falling back to
    * characters but the DP always has a route (ICU's own engine uses the
    * max-snlp cap the same way). */
  lazy val cjkUnknownScore: Long = cjkScoreLexicon.map(_._2).min - 1L
}
