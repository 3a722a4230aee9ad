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

  /** Whitespace tokens of a document.
    *
    * Empty/whitespace-only text yields `[""]` — ONE empty token, so
    * [[tokenCount]] reports 1, not 0. This is split()'s documented
    * edge in both Spark and DuckDB (`regexp_split_to_array`), and
    * every oracle replays it identically; "changing" it here without
    * changing all ~30 text oracles in lockstep would break the
    * cross-engine hash gates. Callers filtering blank documents
    * should test `length(trim(text)) > 0`, not `tokenCount > 0`.
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Word n-gram shingles (default 3) from a pre-computed words array.
    * Built with slice+zip_with (array-at-a-time) rather than
    * per-element element_at so the words subtree is evaluated O(1)
    * times per row — with per-element indexing, interpreted evaluation
    * re-evaluates the child expression for every element, which turned
    * a linear scan quadratic before this was restructured.
    * Semantics: shingle i = words[i]+" "+words[i+1]+" "+words[i+2],
    * i in 1..len-2; empty when the doc has < n words.
    */
  def shinglesFromTokens(words: Column, n: Int = 3): Column = {
    require(n == 3, "reference pipelines use 3-gram shingles")
    val len = size(words) - 2
    when(size(words) >= 3,
      zip_with(
        zip_with(slice(words, lit(1), len), slice(words, lit(2), len),
          (a, b) => concat(a, lit(" "), b)),
        slice(words, lit(3), len),
        (ab, cc) => concat(ab, lit(" "), cc)))
      .otherwise(array().cast("array<string>"))
  }

  /** Convenience: shingles straight from the text column. For hot
    * paths, stage `tokens` as its own column and use
    * [[shinglesFromTokens]].
    */
  def wordShingles(c: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(c), n)

  /** MinHash modulus and the per-permutation multipliers/offsets:
    * h_j(x) = (x * A_j + B_j) mod P over the base shingle hash
    * x ∈ [0, P). (P prime, odd multipliers → a universal-enough hash
    * family; (P-1) * maxA + maxB < 2^63 so no engine overflows.)
    */
  val MinhashMod = 1000000007L
  private[functions] def mhA(j: Int): Long = 2L * j + 1234567891L
  private[functions] def mhB(j: Int): Long = 98765431L * (j + 1)

  /** Base 60-bit shingle hash reduced mod P: one md5 per shingle, with
    * the k permutations derived arithmetically — 16× less hashing than
    * md5-per-seed, the difference between one pass and k passes over a
    * 100 TB corpus. md5 keeps it engine-reproducible.
    */
  def shingleBaseHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinhashMod

  /** One MinHash value. */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s =>
      (shingleBaseHash(s) * mhA(seed) + mhB(seed)) % MinhashMod))

  /** k-element MinHash signature over PRE-COMPUTED base hashes (stage
    * [[shingleBaseHash]] as its own column on hot paths; the hashes
    * argument appears once, permutations iterate inside a transform).
    */
  def minhashSignatureFromHashes(hashes: Column, k: Int): Column = {
    val as = typedLit((0 until k).map(mhA))
    val bs = typedLit((0 until k).map(mhB))
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(hashes, h =>
        (h * element_at(as, j + 1) + element_at(bs, j + 1)) % MinhashMod)))
  }

  /** k-element MinHash signature straight from shingles. */
  def minhashSignature(shingles: Column, k: Int): Column =
    minhashSignatureFromHashes(transform(shingles, s => shingleBaseHash(s)), k)

  /** LSH band keys: the signature split into bands of `rowsPerBand`,
    * each band md5-hashed over the comma-joined member values
    * (array_join(slice) keeps the sig argument referenced once).
    * Callers must exclude empty-shingle docs first — they have no
    * meaningful signature.
    */
  def lshBands(sig: Column, k: Int, rowsPerBand: Int): Column = {
    require(k % rowsPerBand == 0, "k must be divisible by rowsPerBand")
    transform(sequence(lit(0), lit(k / rowsPerBand - 1)), b =>
      md5(array_join(
        transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")), ",")))
  }

  /** Exact-duplicate fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(lower(trim(c)))

  /** BPE-ish token count: runs of letters, runs of digits, and single
    * non-alphanumeric marks each count as one token — the usual cheap
    * stand-in for subword tokenizer counts on ASCII-ish corpora.
    */
  def bpeTokenCount(c: Column): Column =
    regexp_count(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  private val FpMod = 1000000007L
  private val FpBase = 31L

  /** Order-sensitive rolling (Karp-Rabin-style) content fingerprint
    * over the token sequence: fold of (acc*31 + h) mod 1e9+7 with
    * token hashes pre-reduced mod p (keeps every intermediate < 2^36 —
    * no overflow in any engine, and engines whose fold seeds with the
    * first element instead of 0 still agree because f(0,h)=h once
    * h < p). Distinguishes permutations that set-based fingerprints
    * collapse.
    */
  def rollingFingerprint(words: Column): Column = {
    val hmod = transform(tokenHashes(words), h => h % FpMod)
    aggregate(hmod, lit(0L), (acc, h) => (acc * FpBase + h) % FpMod)
  }

  /** Per-token 32-bit hashes: first 8 md5 hex chars as uint32 (long).
    */
  def tokenHashes(words: Column): Column =
    transform(words, w => conv(substring(md5(w), 1, 8), 16, 10).cast("long"))

  /** Per-position n-gram rolling fingerprints: one Karp-Rabin fold
    * (same base/modulus as [[rollingFingerprint]]) per window of `n`
    * consecutive tokens — the duplicated-span signal for exact-
    * substring dedup. Documents shorter than `n` tokens yield an empty
    * array. Built from builtin higher-order functions only
    * (transform/sequence/slice/aggregate), so the whole gram expansion
    * stays inside whole-stage codegen; intermediate values stay < 2^36
    * because token hashes are pre-reduced mod p.
    */
  def gramFingerprints(words: Column, n: Int): Column = {
    val hmod = transform(tokenHashes(words), h => h % FpMod)
    // LET-BIND the hash array once per row (single-element transform:
    // `hm` is a lambda variable, so the per-position lambda reads the
    // materialized array): referencing `hmod` directly inside the
    // position transform re-evaluated the whole md5 pipeline once PER
    // POSITION in interpreted HOF evaluation — O(positions × tokens)
    // hashing, measured ~9 ms/doc on 54-token docs before this fix.
    element_at(transform(array(hmod), hm =>
      when(size(hm) >= n,
        transform(sequence(lit(0), size(hm) - n),
          i => aggregate(slice(hm, i + 1, lit(n)), lit(0L),
            (acc, h) => (acc * FpBase + h) % FpMod)))
        .otherwise(typedLit(Array.empty[Long]))), 1)
  }

  private val pow2: Column =
    typedLit((0 until 32).map(j => 1L << j))

  /** 32-bit SimHash from per-token hashes, computed in ONE pass over
    * the token array: the fold accumulates all 32 signed bit-counts as
    * an int array (zip_with inside aggregate), then the sign pattern
    * is packed. Bit j of a hash is extracted as (h / 2^j) mod 2 —
    * division by a power of two is exact in doubles for h < 2^53, so
    * this equals an arithmetic shift. A per-bit formulation (32
    * separate aggregates over an inline expression) re-evaluated the
    * tokenization per bit and was ~100× slower.
    */
  def simhashFromHashes(h: Column): Column = {
    val idx = sequence(lit(0), lit(31))
    val zeros = transform(idx, _ => lit(0))
    val bitsums = aggregate(h, zeros, (acc, hv) =>
      zip_with(acc, idx, (a, j) =>
        a + when((hv / element_at(pow2, j + 1)).cast("long") % 2 === 1, 1)
          .otherwise(-1)))
    aggregate(
      zip_with(bitsums, idx, (s, j) =>
        when(s > 0, element_at(pow2, j + 1)).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  /** 32-bit md5-SimHash of a text column: sub-expressions chain so the
    * tokenization and hashing each evaluate once per row.
    */
  def simhash32(c: Column): Column = simhashFromHashes(tokenHashes(tokens(c)))

  /** Marker vocabularies — the single source of truth for [[langId]]
    * AND the t03/t38 DuckDB oracles (PipelineQueries generates its IN
    * lists from here, so the classifier can never drift from its
    * cross-engine replay).
    */
  private[graft] val langMarkers: Seq[(String, Seq[String])] = Seq(
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

  /** Hashed-linear-classifier constants (shared with the t33 oracle):
    * the feature space is [[ClassifierBuckets]] hash buckets of the
    * md5 base hash; a bucket's weight is a fixed integer in
    * [-1000, 1000] derived arithmetically from the bucket id (Knuth
    * multiplicative constant mod 2001, shifted) — a stand-in for
    * trained fastText weights with the same runtime shape.
    */
  val ClassifierBuckets = 1024L
  private val ClassifierMult = 2654435761L
  private val ClassifierMod = 2001L

  /** fastText-style HASHED linear classifier score over the token
    * array (Joulin et al. 2017's bag-of-features trick): each token
    * maps to weight(h(token) mod D) and the document score is the
    * plain sum — the shape of every model-based quality filter run
    * over web-scale corpora (CCNet / DCLM fastText filtering).
    *
    * The hashing trick is the scale story: there is NO vocabulary to
    * broadcast and no dictionary join — the "model" is D integers
    * derivable in-row, so scoring 100 TB is one narrow codegen'd
    * projection, embarrassingly parallel. Integer weights and an
    * integer sum make the score bit-exact in any engine.
    */
  def hashedClassifierScore(words: Column): Column =
    aggregate(
      transform(words, w =>
        ((shingleBaseHash(w) % ClassifierBuckets) * ClassifierMult)
          % ClassifierMod - lit(1000L)),
      lit(0L), (acc, x) => acc + x)

  /** PII span patterns — the redaction stage every public
    * training-data pipeline runs before release (C4 / Dolma / RedPajama
    * all regex-scrub emails, phone numbers and IPs at minimum).
    * Deliberately RE2-compatible (no lookaround, no backreferences,
    * character classes spelled as [0-9] not \d) so the DuckDB oracle
    * replays the IDENTICAL pattern text verbatim.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Count of matches of one PII pattern (full-match group 0 — Spark's
    * regexp_extract_all defaults to group 1, DuckDB's to 0; pinning 0
    * keeps both engines on the whole span). Codegen'd, in-row.
    */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Redact all PII spans: each matched span is replaced by its typed
    * placeholder, non-overlapping left-to-right (the regex engine's
    * documented semantics in both engines — the t40 interval-union
    * discipline comes free because a regex scan IS a left-to-right
    * non-overlapping span walk). Pass ORDER is part of the contract:
    * emails first (an email body can contain digit runs and dotted
    * quads — the whole span must become [EMAIL] before the narrower
    * patterns see it), then phones, then IPs.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "[EMAIL]"),
        PhonePattern, "[PHONE]"),
      Ipv4Pattern, "[IP]")

  /** Text canonicalization — the normalization stage every pipeline
    * runs BEFORE fingerprinting, so that byte-level identity means
    * content identity downstream (exact-dedup md5, shingle MinHash,
    * BPE symbols all hash bytes): Unicode NFC (composed/decomposed
    * variants of the same text unify — the compiled
    * [[graft.functions.UnicodeExpressions.nfcNormalize]] expression),
    * then control characters stripped (C0 minus tab/newline/CR, plus
    * DEL — the explicit class keeps Java and RE2 semantics identical),
    * then whitespace runs collapsed to a single space, then trimmed.
    * Pass order is part of the contract: NFC first (a combining mark
    * is not whitespace, but normalization can only ever reduce the
    * code-point stream the later regexes see), strip before collapse
    * (a control char between spaces must not keep two runs apart).
    */
  def canonicalize(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(UnicodeExpressions.nfcNormalize(c),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "[ \\t\\n\\r]+", " "))

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS local document-fingerprinting algorithm):
    * over the per-position gram fingerprints `fps` (stage
    * [[gramFingerprints]] as its own column so the gram expansion
    * evaluates once per row), take the minimum of every `win`
    * consecutive values, then the distinct set. Guarantees any shared
    * substring of length ≥ win + gram − 1 tokens contributes at least
    * one common fingerprint, while keeping ~2/(win+1) of positions —
    * the bandwidth knob exact-substring dedup needs at corpus scale.
    * Documents with fewer than `win` gram positions yield an empty
    * set (too short to winnow). Pure array expressions — stays inside
    * whole-stage codegen, no shuffle, no UDF.
    */
  def winnowedFingerprints(fps: Column, win: Int): Column =
    // same let-binding discipline as [[gramFingerprints]]: the window
    // lambda reads the bound array `f`, so even a caller that passes a
    // full expression (or an optimizer that inlines the staged column)
    // evaluates it once per row, not once per window position
    element_at(transform(array(fps), f =>
      when(size(f) >= win,
        array_distinct(transform(sequence(lit(1), size(f) - (win - 1)),
          j => array_min(slice(f, j, lit(win))))))
        .otherwise(typedLit(Array.empty[Long]))), 1)
}
