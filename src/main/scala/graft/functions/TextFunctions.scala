package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines.
  *
  * Everything here is composed from codegen'd Spark built-ins (no UDFs)
  * so the whole pipeline stays inside whole-stage codegen and scales
  * linearly with executors — the hot path over 100 TB of documents is
  * a single narrow projection, no shuffle.
  *
  * Cross-engine determinism: hashing uses md5 (identical in every
  * engine) rather than engine-private hashes; scores use only
  * +,*,/,min,max (no transcendentals) so the DuckDB oracle reproduces
  * results bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokens of a document. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Word n-gram shingles (default 3). Mirrors 1-based list semantics:
    * shingle i = words[i] + " " + words[i+1] + " " + words[i+2] for
    * i in 1..len-2; empty array when the doc has < n words.
    */
  def wordShingles(c: Column, n: Int = 3): Column = {
    val words = tokens(c)
    val idx = when(size(words) >= n, sequence(lit(1), size(words) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(words, i + o)): _*))
  }

  /** One MinHash value: min over shingles of md5(shingle + "|" + seed).
    * String-ordered md5 hex is a uniform permutation proxy; md5 exists
    * identically in Spark, DuckDB, Trino → oracle-checkable.
    */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => md5(concat(s, lit("|" + seed)))))

  /** k-element MinHash signature. */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(minhash(shingles, _)): _*)

  /** LSH band keys: the signature split into bands of `rowsPerBand`,
    * each band hashed to one md5 key. Docs sharing any band key are
    * near-dup candidates (join on (band_idx, band_key) at scale).
    */
  def lshBands(sig: Column, k: Int, rowsPerBand: Int): Column = {
    require(k % rowsPerBand == 0, "k must be divisible by rowsPerBand")
    val bands = (0 until k / rowsPerBand).map { b =>
      md5(concat((0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1)): _*))
    }
    array(bands: _*)
  }

  /** Exact-duplicate fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(lower(trim(c)))

  /** 32-bit SimHash over whitespace tokens, md5-based so the oracle can
    * reproduce it: token hash = first 8 md5 hex chars as uint32; bit j
    * of the result is set iff sum over tokens of (+1 if bit j set else
    * -1) is positive.
    */
  def simhash32(c: Column): Column = {
    val toks = tokens(c)
    val h = transform(toks, w => conv(substring(md5(w), 1, 8), 16, 10).cast("long"))
    val bits = (0 until 32).map { j =>
      val bitSum = aggregate(h, lit(0),
        (acc, hv) => acc + when(shiftright(hv, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Marker-word count for one language. */
  def langScore(c: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(filter(tokens(c), t => t.isInCollection(markers)))
  }

  /** n-gram-heuristic language ID: argmax of marker-word counts with a
    * fixed tie-break order (en > es > fr > de), "und" when no markers.
    */
  def langId(c: Column): Column = {
    val Seq(en, es, fr, de) = langMarkers.map { case (l, _) => langScore(c, l) }
    when(en >= es && en >= fr && en >= de && en > 0, "en")
      .when(es >= fr && es >= de && es > 0, "es")
      .when(fr >= de && fr > 0, "fr")
      .when(de > 0, "de")
      .otherwise("und")
  }

  /** Deterministic quality score in [0, ~2]: length component + English
    * stopword-ratio component. Linear arithmetic only (no exp/log) so
    * every engine computes the identical double.
    */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val stopRatio = langScore(c, "en").cast("double") / nTok
    round(least(nTok, lit(200.0)) * 0.005 + stopRatio, 6)
  }
}
