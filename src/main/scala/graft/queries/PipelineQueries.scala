package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.dedup.Dedup
import graft.similarity.Similarity

/** Training-data pipeline operators (dedup / similarity / text
  * analysis) exposed as driver-checkable queries over the `documents`
  * and `embeddings` tables. Thin wrappers over the real library
  * surface: [[graft.functions.TextFunctions]], [[graft.dedup.Dedup]],
  * [[graft.similarity.Similarity]].
  *
  * Every oracle below reproduces the Spark computation exactly in
  * DuckDB SQL: hashing is md5-based, buckets are sign-pattern-based,
  * and scores use only exact/int-ratio arithmetic, so hash compares
  * are bit-exact (see SURVEY.md §5.2).
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  // --- shared DuckDB SQL fragments (mirror TextFunctions exactly) ---

  /** words CTE body: 1-based whitespace token list */
  private[queries] val W = "string_split_regex(trim(text), '\\s+')"

  /** 3-gram shingle list over `words` */
  private[queries] val SH =
    "list_transform(range(1, len(words) - 1), i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])"

  /** Mirrors TextFunctions: base hash = first 15 md5 hex chars mod P,
    * permutation j = (h * A_j + B_j) mod P (same constants).
    */
  private def mh(j: Int): String = {
    val a = 2L * j + 1234567891L
    val b = 98765431L * (j + 1)
    s"list_aggregate(list_transform(s, x -> ((CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000007) * $a + $b) % 1000000007), 'min')"
  }

  private[queries] def band(b: Int, rows: Int): String =
    "md5(" + (0 until rows).map(r => s"CAST(${mh(b * rows + r)} AS VARCHAR)")
      .mkString(" || ',' || ") + ")"

  /** IN-list for one language's markers, generated from the single
    * source of truth ([[TextFunctions.langMarkers]]).
    */
  private def markersIn(lang: String): String =
    TextFunctions.langMarkers.toMap.apply(lang)
      .map(w => s"'$w'").mkString("(", ", ", ")")

  private val enMarkers = markersIn("en")

  /** Per-language marker-count select items (the t03 scoring CTE body)
    * and the argmax CASE — both generated from langMarkers so the
    * t03/t38 oracles and the Scala classifier share one definition.
    */
  private lazy val langScoresSql: String =
    Seq("en", "es", "fr", "de").map(l =>
      s"len(list_filter(words, w -> w IN ${markersIn(l)})) AS $l")
      .mkString(",\n            ")

  private val langIdCaseSql: String =
    """CASE WHEN en >= es AND en >= fr AND en >= de AND en > 0 THEN 'en'
         WHEN es >= fr AND es >= de AND es > 0 THEN 'es'
         WHEN fr >= de AND fr > 0 THEN 'fr'
         WHEN de > 0 THEN 'de'
         ELSE 'und' END"""

  /** Fixed masking vocabulary for t12 (shared with its oracle below). */
  private val OovVocab: Seq[String] = Seq(
    "the", "data", "join", "merge", "table", "row", "sort", "scan",
    "key", "batch", "window", "stream", "filter", "group", "agg")

  private val oovVocabSql: String =
    OovVocab.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Deterministic split assignment — pure function of the id (shared
    * by t08 and t10; the SQL twin is [[splitSql]]).
    */
  private def splitOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    when(h < 80, "train").when(h < 90, "val").otherwise("test")
  }

  /** DuckDB twin of [[splitOf]] over a column reference. */
  private def splitSql(idCol: String): String =
    s"""CASE WHEN CAST('0x' || substr(md5(CAST($idCol AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 80 THEN 'train'
        WHEN CAST('0x' || substr(md5(CAST($idCol AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 90 THEN 'val'
        ELSE 'test' END"""

  /** The t41 oracle: [[graft.text.BpeTrainer.learnMerges]] unrolled
    * into `k` static CTE stages — stage i counts adjacent symbol
    * pairs of stage i−1's symbol table, picks the (count DESC, left,
    * right) winner as a 1-row relation, and cross-joins it into the
    * next stage's `passes`-fold replace. Mirrors the Spark side's
    * contract exactly (same padding, same non-overlapping replace,
    * same pass count), so the learned merge table hash-matches.
    *
    * Exhaustion safety: if the vocabulary runs out of mergeable pairs
    * before round i, p_i is empty — a bare LIMIT 1 would make b_i
    * empty and every cross join downstream would collapse the WHOLE
    * oracle (t41 truncates, t42 returns zero rows) while the trainer
    * gracefully applies the fewer learned merges. Each b_i therefore
    * unions a (chr(1), chr(2), 0) sentinel that loses to any real
    * pair (real pair counts are >= 1) and, when it survives, makes
    * the downstream replace a no-op — control chars never appear in
    * tokenized symbols. t41's emission filters sentinels on pc > 0.
    */
  private def bpeStages(k: Int, passes: Int,
                        src: String = "documents",
                        prefix: String = ""): String = {
    val sb = new StringBuilder
    val pre = if (prefix.isEmpty) "" else s"$prefix,\n       "
    sb ++= s"""WITH ${pre}wc AS (SELECT word, COUNT(*) AS cnt FROM (
         SELECT unnest($W) AS word FROM $src) GROUP BY word),
       s0 AS (SELECT cnt,
         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym FROM wc)"""
    for (i <- 1 to k) {
      val prev = s"s${i - 1}"
      val rep = (1 to passes).foldLeft("sym")((e, _) =>
        s"replace($e, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ')")
      sb ++= s""",
       p$i AS (SELECT l, r, SUM(cnt) AS pc FROM (
           SELECT cnt, syms[j] AS l, syms[j + 1] AS r FROM (
             SELECT cnt, syms, unnest(range(1, len(syms))) AS j FROM (
               SELECT cnt, string_split(trim(sym), ' ') AS syms FROM $prev)))
         GROUP BY l, r),
       b$i AS (SELECT l, r, pc FROM (
           (SELECT l, r, pc FROM p$i ORDER BY pc DESC, l ASC, r ASC LIMIT 1)
           UNION ALL (SELECT chr(1), chr(2), 0))
         ORDER BY pc DESC LIMIT 1),
       s$i AS (SELECT cnt, $rep AS sym FROM $prev, b$i)"""
    }
    sb.toString
  }

  /** The t51 oracle: the t41 seed stages leave s{seed} segmented,
    * then each prune round replays the integer-inverse-probability
    * loss — inv(c) = min(T·10⁶ // (c+1), 10¹²), char-sum saturated at
    * 10¹³, loss = min(c, 10⁵)·(chsum − inv(c)) — picks the (loss ASC,
    * piece ASC) winner, and re-splits " p " into the spaced
    * characters with the same pass count. The sentinel arm (control
    * -char piece, 2⁶² loss) keeps an exhausted vocabulary from
    * collapsing the chain, exactly the bpeStages discipline; emission
    * filters it on c > 0.
    */
  private def unigramOracleSql(seed: Int, rounds: Int, passes: Int): String = {
    val sb = new StringBuilder
    sb ++= bpeStages(seed, passes)
    sb ++= s""",
       u0 AS MATERIALIZED (SELECT cnt, sym FROM s$seed)"""
    for (j <- 1 to rounds) {
      val prev = s"u${j - 1}"
      val rep = (1 to passes).foldLeft("sym")((e, _) =>
        s"replace($e, ' ' || p || ' ', ' ' || regexp_replace(p, '(.)', '\\1 ', 'g'))")
      sb ++= s""",
       c$j AS MATERIALIZED (SELECT p, SUM(cnt) AS c FROM (
           SELECT cnt, unnest(string_split(trim(sym), ' ')) AS p FROM $prev)
         GROUP BY p),
       t$j AS MATERIALIZED (SELECT SUM(c) AS t FROM c$j),
       h$j AS (SELECT m.p, m.c,
           LEAST(SUM(LEAST(t$j.t * 1000000 // (COALESCE(cc.c, 0) + 1),
             1000000000000)), 10000000000000) AS chsum
         FROM (SELECT p, c, unnest(range(0, length(p))) AS i
             FROM c$j WHERE length(p) >= 2) m
         LEFT JOIN c$j cc ON cc.p = substr(m.p, CAST(m.i AS INT) + 1, 1)
         CROSS JOIN t$j
         GROUP BY m.p, m.c),
       l$j AS (SELECT p, c,
           LEAST(c, 100000) * (chsum -
             LEAST(t$j.t * 1000000 // (c + 1), 1000000000000)) AS loss
         FROM h$j CROSS JOIN t$j),
       pb$j AS MATERIALIZED (SELECT p, c, loss FROM (
           (SELECT p, c, loss FROM l$j ORDER BY loss ASC, p ASC LIMIT 1)
           UNION ALL (SELECT chr(1) || chr(1), 0, 4611686018427387904))
         ORDER BY loss ASC LIMIT 1),
       u$j AS MATERIALIZED (SELECT cnt, $rep AS sym FROM $prev, pb$j)"""
    }
    sb ++= (1 to rounds).map(j =>
      s"""SELECT CAST($j AS INT) AS iter, p AS pruned,
           CAST(c AS BIGINT) AS piece_count, CAST(loss AS BIGINT) AS loss
           FROM pb$j WHERE c > 0""")
      .mkString("\n", "\nUNION ALL\n", "")
    sb.toString
  }

  private def bpeOracleSql(k: Int, passes: Int,
                           src: String = "documents",
                           prefix: String = ""): String =
    // pc > 0 drops the exhaustion sentinel rows (see bpeStages) so an
    // exhausted vocabulary emits the same FEWER rows the trainer does
    bpeStages(k, passes, src, prefix) + (1 to k).map(i =>
      s"""SELECT CAST($i AS INT) AS iter, l AS merge_left,
           r AS merge_right, CAST(pc AS BIGINT) AS pair_count FROM b$i
           WHERE pc > 0""")
      .mkString("\n", "\nUNION ALL\n", "")

  /** The t42 oracle: the t41 stages produce the k winning pairs, a
    * 1-row cross join exposes them as l1/r1..lk/rk, and every doc's
    * words run the same symbolize → k×passes replace chain before a
    * symbol count — the apply replay of the learned tokenizer.
    */
  private def bpeApplyOracleSql(k: Int, passes: Int): String = {
    val mCols = (1 to k).map(i => s"b$i.l AS l$i, b$i.r AS r$i").mkString(", ")
    val mFrom = (1 to k).map(i => s"b$i").mkString(", ")
    val chain = (1 to k).foldLeft(
      "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')") { (e, i) =>
      (1 to passes).foldLeft(e)((e2, _) =>
        s"replace($e2, ' ' || l$i || ' ' || r$i || ' ', ' ' || l$i || r$i || ' ')")
    }
    bpeStages(k, passes) + s""",
       m AS (SELECT $mCols FROM $mFrom)
       SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(words,
           w -> len(string_split(trim($chain), ' ')))) AS BIGINT)
           AS n_bpe_tokens
       FROM (SELECT doc_id, $W AS words FROM documents), m"""
  }

  /** Guarded task-parallelism lift for CPU-bound per-row stages — the
    * shared [[graft.util.Spread]] implementation.
    */
  private def spreadCpu(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.util.Spread.toCpuParallelism(df)

  // --- UTF-8 multibyte corpus derivation (t43/t46) ---------------------
  //
  // The driver's testdata contract pins ASCII text, so the u-corpus is
  // DERIVED in-gate by substituting three high-frequency letters with
  // 2-, 3- and 4-byte code points (á U+00E1, € U+20AC, 𝐨 U+1D428 — the
  // last is supplementary-plane, a surrogate PAIR in the JVM, which is
  // exactly where code-unit-counting string code breaks). Plain
  // substring replace in both engines; none of the targets reintroduce
  // a source letter, so the chain is order-safe.

  private def utf8ify(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("replace",
      call_function("replace",
        call_function("replace", c, lit("a"), lit("á")),
        lit("e"), lit("€")),
      lit("o"), lit("𝐨"))

  /** DuckDB twin of [[utf8ify]] (chr() keeps the source ASCII). */
  private val Utf8ifySql =
    "replace(replace(replace(text, 'a', chr(225)), 'e', chr(8364)), 'o', chr(119848))"

  // --- fingerprint-once image hashes (d14/d15) ----------------------

  /** Per-(dataset, session) perceptual-hash table: the corpus is
    * encoded + really decoded + dHashed ONCE, and every image-dedup
    * consumer (d14 pairs, d15 clusters) reads the materialized
    * fingerprints — the production discipline (a pipeline hashes a
    * corpus once, then runs however many dedup passes over the
    * fingerprint table; re-decoding per pass would re-pay the codec
    * at every query). m11 keeps the full decode path — the decode IS
    * its operator.
    */
  private val phashTables =
    new graft.util.BuildOnce[org.apache.spark.sql.DataFrame]

  private def phashTableFor(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    phashTables.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      import graft.multimodal.Multimodal
      val png = Multimodal.withPngPayload(Tables.documents(s, d),
        "doc_id", "text", "n_chars")
      Multimodal.perceptualHashes(png).toDF()
        .select(col("id"), col("dh_hi"), col("dh_lo"))
        .localCheckpoint()
    })

  // --- t54's persisted sketch cube -----------------------------------

  /** Per-(dataset, session) PERCENTILE CUBE: one corpus pass computes
    * a kll_sketch struct per (l_returnflag × l_linestatus) cell and
    * lands the cells as rows of a graft table (sketch-as-data — the
    * struct column rides the ordinary segment parquet). The query
    * sides read THIS table, never re-sketching the corpus: t54 folds
    * every cell into one global sketch, t55 folds each returnflag's
    * cell SLICE into a per-group sketch — the mergeable-summary
    * payoff: any cube slice answers in O(cells·k·log) with zero
    * corpus rescans before the exact recount.
    */
  private val sketchCubes =
    new graft.util.BuildOnce[org.apache.spark.sql.DataFrame]

  private def sketchCubeFor(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    sketchCubes.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      val cells = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice").cast("double").as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(graft.functions.KllSketch.kllSketch(col("v"), 200).as("sk"))
      val root = graft.util.RunRoot.under(
        s"graft_tables/${d.replace('/', '_')}/sketch_cube")
      val t = graft.table.SegmentedTable.fresh(s, root, cells.schema)
      t.load(cells)
      t.read()
    })

  // --- fingerprint-once audio hashes (d17) --------------------------

  /** Per-(dataset, session) audio-fingerprint table — the audio twin
    * of [[phashTableFor]]: the corpus is WAV-encoded + really decoded
    * + envelope-hashed ONCE and the dedup consumer reads the
    * materialized fingerprints. m12 keeps the full decode path — the
    * decode IS its operator.
    */
  private val audioFpTables =
    new graft.util.BuildOnce[org.apache.spark.sql.DataFrame]

  private def audioFpTableFor(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    audioFpTables.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      import graft.multimodal.Multimodal
      val wav = Multimodal.withWavPayload(
        plantAudioDups(Tables.documents(s, d)), "doc_id", "text", "n_chars")
      Multimodal.audioFingerprints(wav).toDF()
        .select(col("id"), col("af_hi"), col("af_lo"))
        .localCheckpoint()
    })

  // --- planted-PII corpus (t44/st17) --------------------------------
  //
  // The corpus carries no PII by contract, so the scrub gates PLANT
  // it deterministically: doc_id-derived spans both engines
  // synthesize identically (email every 7th doc, phone every 5th,
  // IPv4 every 3rd).

  private[queries] def plantPii(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" reach user"), col("doc_id").cast("string"),
          lit("@example.com now"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 3 === 0,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string"),
          lit("."), ((col("doc_id") * 13) % 256).cast("string")))
        .otherwise(lit(""))).as("text"))

  /** DuckDB twin of [[plantPii]] — a CTE body over `src` (default the
    * raw documents table; t47 plants over the derived u-corpus).
    */
  private[queries] def plantPiiSql(src: String = "documents"): String =
    s"""SELECT doc_id, text ||
        CASE WHEN doc_id % 7 = 0 THEN ' reach user' ||
          CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
        CASE WHEN doc_id % 5 = 0 THEN ' call 555-' ||
          lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        CASE WHEN doc_id % 3 = 0 THEN ' from 10.' ||
          CAST(doc_id % 256 AS VARCHAR) || '.' ||
          CAST((doc_id * 7) % 256 AS VARCHAR) || '.' ||
          CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END AS text
      FROM $src"""

  /** The t45 oracle: [[graft.text.ClassifierTrainer.trainPerceptron]]
    * unrolled into `rounds` static CTE stages — round i scores every
    * train doc against w_{i−1}, the misclassified set (y·s <= 0)
    * contributes the batch update, and the final stage emits the
    * D-row model plus the (-1, accuracy_ppm) summary row. All
    * integer, so the hash compare is bit-exact.
    */
  private def perceptronCtes(buckets: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH docs0 AS (SELECT doc_id, $W AS words FROM documents
         WHERE ${splitSql("doc_id")} = 'train'),
       lab AS (SELECT doc_id,
         CASE WHEN len(list_filter(words, w -> w IN $enMarkers)) >= 2
           THEN 1 ELSE -1 END AS y FROM docs0),
       f AS (SELECT d.doc_id, lab.y,
           CAST((CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)
             % 1000000007) % $buckets AS INT) AS b, COUNT(*) AS cnt
         FROM (SELECT doc_id, unnest(words) AS w FROM docs0) d
         JOIN lab USING (doc_id) GROUP BY 1, 2, 3),
       w0 AS (SELECT CAST(r AS INT) AS bucket, CAST(0 AS BIGINT) AS w
         FROM range(0, $buckets) t(r))"""
    for (i <- 1 to rounds) {
      val prev = s"w${i - 1}"
      sb ++= s""",
       s$i AS (SELECT f.doc_id, f.y, SUM($prev.w * f.cnt) AS s
         FROM f JOIN $prev ON $prev.bucket = f.b GROUP BY 1, 2),
       m$i AS (SELECT doc_id FROM s$i WHERE y * s <= 0),
       u$i AS (SELECT f.b, SUM(f.y * f.cnt) AS d FROM f
         JOIN m$i USING (doc_id) GROUP BY f.b),
       w$i AS (SELECT $prev.bucket, $prev.w + COALESCE(u$i.d, 0) AS w
         FROM $prev LEFT JOIN u$i ON u$i.b = $prev.bucket)"""
    }
    sb.toString
  }

  private def perceptronOracleSql(buckets: Int, rounds: Int): String =
    perceptronCtes(buckets, rounds) + s""",
       sf AS (SELECT f.doc_id, f.y, SUM(w$rounds.w * f.cnt) AS s
         FROM f JOIN w$rounds ON w$rounds.bucket = f.b GROUP BY 1, 2),
       acc AS (SELECT CAST(SUM(CASE WHEN y * s > 0 THEN 1 ELSE 0 END)
           * 1000000 // COUNT(*) AS BIGINT) AS a FROM sf)
       SELECT CAST(bucket AS INT) AS bucket, CAST(w AS BIGINT) AS weight
       FROM w$rounds
       UNION ALL SELECT CAST(-1 AS INT), a FROM acc"""

  /** The t48 oracle: the t45 training CTEs, then the final model
    * evaluated on EVERY split (the train/val/test read a tokenizer-
    * training loop takes) — per split, doc count + accuracy ppm.
    */
  private def perceptronEvalOracleSql(buckets: Int, rounds: Int): String =
    perceptronCtes(buckets, rounds) + s""",
       alld AS (SELECT doc_id, ${splitSql("doc_id")} AS split,
           $W AS words FROM documents),
       lab2 AS (SELECT doc_id, split,
         CASE WHEN len(list_filter(words, w -> w IN $enMarkers)) >= 2
           THEN 1 ELSE -1 END AS y FROM alld),
       f2 AS (SELECT d.doc_id,
           CAST((CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)
             % 1000000007) % $buckets AS INT) AS b, COUNT(*) AS cnt
         FROM (SELECT doc_id, unnest(words) AS w FROM alld) d
         GROUP BY 1, 2),
       sc AS (SELECT f2.doc_id, SUM(w$rounds.w * f2.cnt) AS s
         FROM f2 JOIN w$rounds ON w$rounds.bucket = f2.b GROUP BY 1)
       SELECT lab2.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN lab2.y * sc.s > 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_correct,
         CAST(SUM(CASE WHEN lab2.y * sc.s > 0 THEN 1 ELSE 0 END)
           * 1000000 // COUNT(*) AS BIGINT) AS acc_ppm
       FROM sc JOIN lab2 USING (doc_id)
       GROUP BY 1"""

  /** Shared m11/d14 CTE: the dHash replayed from the PNG synthesis
    * rule (pixel(x, y) = text byte (y·w + x) mod len; 9×8 point grid;
    * horizontal gradient signs; hi = grid rows 0–3, lo = rows 4–7 —
    * mirrors [[graft.multimodal.Multimodal.perceptualHashes]]
    * bit-for-bit, which only holds because PNG is lossless).
    * v is 1-based: v[gy·9 + gx + 1] is the sample at grid (gy, gx).
    */
  private[queries] def phashSql(src: String = "documents"): String =
    s"""ph AS (
       SELECT doc_id,
         CAST(w AS INT) AS w, CAST(h AS INT) AS h,
         CAST(list_sum(list_transform(range(0, 32), b ->
           CASE WHEN v[(b // 8) * 9 + (b % 8) + 2] > v[(b // 8) * 9 + (b % 8) + 1]
             THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT) AS dh_hi,
         CAST(list_sum(list_transform(range(0, 32), b ->
           CASE WHEN v[(4 + b // 8) * 9 + (b % 8) + 2] > v[(4 + b // 8) * 9 + (b % 8) + 1]
             THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT) AS dh_lo
       FROM (
         SELECT doc_id, w, h,
           list_transform(range(0, 72), k ->
             CASE WHEN n = 0 THEN 0
               ELSE ord(substr(text,
                 CAST((((k // 9) * h // 8) * w + ((k % 9) * w // 9)) % n AS INT) + 1, 1))
             END) AS v
         FROM (SELECT doc_id, text, length(text) AS n,
             1 + n_chars % 64 AS w, 1 + (n_chars * 7) % 64 AS h
           FROM $src)))"""

  private[queries] val PhashSql = phashSql()

  /** Shared m12/d17 CTE: the audio envelope hash replayed from the WAV
    * synthesis rule (sample i = text byte i mod len, unsigned; n =
    * 500 + n_chars % 1000; rate = 8000 + (n_chars % 8)·1000). Frame k
    * covers samples [k·n/65, (k+1)·n/65) (floor division — DuckDB's
    * 1-based inclusive slice sq[a+1 : b] is exactly 0-based [a, b));
    * bit b set iff e_{b+1} > e_b; af_hi = bits 0–31, af_lo = 32–63 —
    * mirrors [[graft.multimodal.Multimodal.audioFingerprints]]
    * bit-for-bit, which only holds because WAV PCM is lossless.
    * `src` parametrizes the corpus (d17 fingerprints the
    * planted-duplicate corpus; m12 the raw one).
    */
  private[queries] def audioFpSql(src: String = "documents"): String =
    s"""af AS (
       SELECT doc_id, sample_rate, n_samples,
         CAST(list_sum(list_transform(range(0, 32), b ->
           CASE WHEN e[b + 2] > e[b + 1]
             THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT) AS af_hi,
         CAST(list_sum(list_transform(range(0, 32), b ->
           CASE WHEN e[b + 34] > e[b + 33]
             THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT) AS af_lo
       FROM (
         SELECT doc_id, sample_rate, n_samples,
           list_transform(range(0, 65), k ->
             COALESCE(CAST(list_sum(
               sq[CAST(k * n_samples // 65 AS INT) + 1 :
                  CAST((k + 1) * n_samples // 65 AS INT)]) AS BIGINT), 0)) AS e
         FROM (
           SELECT doc_id, sample_rate, n_samples,
             list_transform(range(0, n_samples), i ->
               CASE WHEN tl = 0 THEN 0
                 ELSE CAST(ord(substr(text, CAST(i % tl AS INT) + 1, 1))
                   AS BIGINT) * ord(substr(text, CAST(i % tl AS INT) + 1, 1))
               END) AS sq
           FROM (SELECT doc_id, text, length(text) AS tl,
               CAST(8000 + (n_chars % 8) * 1000 AS INT) AS sample_rate,
               CAST(500 + n_chars % 1000 AS BIGINT) AS n_samples
             FROM $src))))"""

  /** The d17 corpus: the documents table with PLANTED duplicate clips
    * — the corpus carries no byte-identical texts by contract (every
    * planted near-dup differs in shingle space), so an audio-dedup
    * gate over the raw corpus would be vacuously empty. Every 7th doc
    * gains a byte-identical twin (the re-upload case — guaranteed
    * Hamming-0 pairs) and every 11th a first-character-perturbed twin
    * (the re-encode case: the cyclic fill shifts a handful of samples,
    * so some twins land within the Hamming budget and some beyond it
    * — deterministically, and the oracle replays both engines' view of
    * exactly which).
    */
  private def plantAudioDups(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"), col("text"), col("n_chars"))
      .unionByName(df.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
          col("n_chars")))
      .unionByName(df.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(lit("z"), expr("substring(text, 2)")).as("text"),
          col("n_chars")))

  /** Per-(dataset, session) cross-modality fingerprint tables (image
    * dHash + audio envelope over the PLANTED d21 corpus) — the
    * [[phashTableFor]]/[[audioFpTableFor]] fingerprint-once
    * discipline on the correlated corpus: the real PNG+WAV
    * encode/decode is d21's dominant cost and is paid once per
    * session, not per verdict pass.
    */
  private val xmodalHashTables =
    new graft.util.BuildOnce[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]

  private def xmodalHashesFor(s: SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    xmodalHashTables.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      import graft.multimodal.Multimodal
      val planted = spreadCpu(plantCrossModalDups(Tables.documents(s, d)))
      val img = Multimodal.perceptualHashes(
        Multimodal.withPngPayload(planted, "doc_id", "text", "n_chars"))
        .toDF().select(col("id"), col("dh_hi"), col("dh_lo"))
        .localCheckpoint()
      val aud = Multimodal.audioFingerprints(
        Multimodal.withWavPayload(planted, "doc_id", "text", "n_chars"))
        .toDF().select(col("id"), col("af_hi"), col("af_lo"))
        .localCheckpoint()
      (img, aud)
    })

  /** The d21 corpus: planted twins whose MODALITY correlation is the
    * point. All three modality renderings derive from (text, n_chars)
    * — pixels and PCM from the text bytes, geometry and sample count
    * from n_chars — so the plants steer which modality spaces agree:
    *
    *  - +3e6 (every 13th doc): the CORRELATED twin — same text, same
    *    n_chars, so text, image and audio all match exactly (the same
    *    asset re-uploaded whole).
    *  - +4e6 (every 17th doc): the TEXT-ONLY twin — same text but
    *    n_chars+29 re-renders both media legs (different image
    *    geometry, different sample count); a scrape of the same prose
    *    into a different layout.
    *  - +5e6 (every 19th doc): the RE-ENCODE twin — first character
    *    perturbed, same n_chars: never an exact text match, and the
    *    byte shift lands some twins inside the media Hamming budgets
    *    and some beyond, deterministically (the d17 re-encode
    *    discipline) — the oracle replays exactly which.
    */
  private def plantCrossModalDups(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"), col("text"), col("n_chars"))
      .unionByName(df.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"),
          col("n_chars")))
      .unionByName(df.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 4000000L).as("doc_id"), col("text"),
          (col("n_chars") + 29L).as("n_chars")))
      .unionByName(df.filter(col("doc_id") % 19 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(lit("z"), expr("substring(text, 2)")).as("text"),
          col("n_chars")))

  /** DuckDB twin of [[plantCrossModalDups]]. */
  private val PlantCrossModalSql =
    """xm AS (
       SELECT doc_id, text, n_chars FROM documents
       UNION ALL SELECT doc_id + 3000000, text, n_chars FROM documents
         WHERE doc_id % 13 = 0
       UNION ALL SELECT doc_id + 4000000, text, n_chars + 29 FROM documents
         WHERE doc_id % 17 = 0
       UNION ALL SELECT doc_id + 5000000, 'z' || substr(text, 2), n_chars
         FROM documents WHERE doc_id % 19 = 0)"""

  /** DuckDB twin of [[plantAudioDups]]. */
  private val PlantAudioDupsSql =
    """adup AS (
       SELECT doc_id, text, n_chars FROM documents
       UNION ALL SELECT doc_id + 1000000, text, n_chars FROM documents
         WHERE doc_id % 7 = 0
       UNION ALL SELECT doc_id + 2000000, 'z' || substr(text, 2), n_chars
         FROM documents WHERE doc_id % 11 = 0)"""

  val queries: Map[String, Q] = Map(
    // text analysis: token counting
    "t01_token_count" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"),
          col("n_chars"))
    }),

    // text analysis: deterministic quality score
    "t02_quality" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
    }),

    // text analysis: n-gram-heuristic language ID
    "t03_langid" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("pred_lang"))
    }),

    // corpus analysis: BURSTINESS ranking (Church & Gale 1995:
    // collection frequency over document frequency — occurrences per
    // CONTAINING document): topical/keyword types repeat heavily
    // inside the few docs that mention them (high cf/df), function
    // words spread thin (cf/df ≈ corpus mean). The
    // keyword-vs-stopword discovery audit beside t36's coverage
    // curve. One keyed count, global top-20 via TakeOrdered, exact
    // ppm.
    "t39_burstiness" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("cf"), countDistinct(col("doc_id")).as("df"))
        .select(col("w"), col("cf"), col("df"),
          expr("CAST(cf * 1000000 DIV df AS BIGINT)").as("burstiness_ppm"))
        .orderBy(col("burstiness_ppm").desc, col("w").asc)
        .limit(20)
    }),

    // corpus analysis: language-ID CONFUSION MATRIX — the t03
    // classifier evaluated against the corpus's labeled `lang` column
    // ((true, predicted) counts + within-true-language share): the
    // classifier-accuracy report a curator reads before trusting
    // langid-based filtering. One narrow scoring pass; the matrix is
    // |langs|² rows; per-language totals broadcast; shares exact ppm.
    "t38_langid_confusion" -> ((s, d) => {
      val pred = Tables.documents(s, d)
        .select(col("lang"), TextFunctions.langId(col("text")).as("pred_lang"))
      val counts = pred.groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("lang")).agg(sum(col("n")).as("tot"))
      counts.join(broadcast(totals), Seq("lang"))
        .select(col("lang"), col("pred_lang"), col("n"),
          expr("CAST(n * 1000000 DIV tot AS BIGINT)").as("share_ppm"))
    }),

    // text analysis: aggregated corpus stats over derived features
    "t04_text_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"),
          max(col("n_chars")).as("max_chars"),
          count(lit(1)).as("doc_cnt"))
    }),

    // text analysis: BPE-ish subword token counting
    "t05_bpe_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"))
    }),

    // corpus analysis: TOKENIZER FERTILITY audit — per-source
    // chars-per-subword-token and subword-tokens-per-word ratios (the
    // compression/fertility numbers a tokenizer evaluation reports;
    // high fertility on a source means the vocab serves it poorly and
    // its effective context shrinks). One narrow projection + one
    // sources-sized agg; ratios exact integer ppm.
    "t37_token_fertility" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"), col("n_chars"),
          TextFunctions.bpeTokenCount(col("text")).cast("long").as("bpe"),
          TextFunctions.tokenCount(col("text")).cast("long").as("words"))
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).as("total_chars"),
          sum(col("bpe")).as("total_bpe_tokens"),
          sum(col("words")).as("total_words"))
        .select(col("source"), col("total_chars"), col("total_bpe_tokens"),
          col("total_words"),
          expr("CAST(total_chars * 1000000 DIV total_bpe_tokens AS BIGINT)")
            .as("chars_per_token_ppm"),
          expr("CAST(total_bpe_tokens * 1000000 DIV total_words AS BIGINT)")
            .as("fertility_ppm"))
    }),

    // text analysis: order-sensitive rolling-hash content fingerprint
    "t06_rolling_fp" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextFunctions.rollingFingerprint(TextFunctions.tokens(col("text")))
            .as("content_fp"))
    }),

    // text analysis: TF-IDF — top term per document (tf × ln(N/df),
    // rounded to 6 decimals: a 1-ulp libm difference cannot cross a
    // rounding boundary in practice)
    "t07_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // corpus size N folded in-plan as a broadcast 1-row aggregate —
      // a driver-side docs.count() here would be an extra full corpus
      // pass before the real job even starts
      val nDf = docs.agg(count(lit(1)).cast("double").as("__n"))
      val terms = docs
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
      val tf = terms.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      // df derives from tf itself — tf's key set IS the distinct
      // (doc, token) pairs, so a separate explode+distinct pass over
      // the corpus (two extra shuffles and a second full text scan)
      // would recompute what tf already materialized.
      val df_ = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      // top term per doc as a grouped min_by — (tfidf DESC, token ASC)
      // is min of (-tfidf, token), a total order (tokens are distinct
      // within a doc, and tfidf >= 0 since df <= N, so the negation is
      // NaN-free). vs the row_number window this partial-aggregates
      // map-side (the shuffle carries one candidate per doc per map
      // partition, not every (doc, token) row) and drops the
      // WindowExec sort entirely.
      tf.join(df_, "token")
        .crossJoin(broadcast(nDf))
        .withColumn("tfidf",
          round(col("tf") * log(col("__n") / col("df")), 6))
        .groupBy(col("doc_id"))
        .agg(min_by(struct(col("token"), col("tfidf")),
          struct(negate(col("tfidf")), col("token"))).as("__top"))
        .select(col("doc_id"), col("__top.token").as("top_term"),
          col("__top.tfidf").as("tfidf"))
    }),

    // pipeline: BM25 relevance scoring (Lucene idf form, k1=1.2,
    // b=0.75) — same distributed shape as t07 (tf/df word counts, N
    // and avgdl folded in-plan as a 1-row broadcast aggregate), score
    // rounded to 6 digits so the cross-engine float compare is stable
    "t13_bm25" -> ((s, d) => {
      val withDl = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__w"))
        .select(col("doc_id"), col("__w"),
          size(col("__w")).cast("double").as("dl"))
      val stats = withDl.agg(
        count(lit(1)).cast("double").as("__n"),
        (sum(col("dl").cast("long")).cast("double") / count(lit(1))).as("__avgdl"))
      val terms = withDl
        .select(col("doc_id"), col("dl"), explode(col("__w")).as("token"))
      val tf = terms.groupBy(col("doc_id"), col("token"), col("dl"))
        .agg(count(lit(1)).cast("double").as("tf"))
      // df from tf's key set (dl is functionally dependent on doc_id,
      // so tf's keys ARE the distinct (doc, token) pairs) — saves the
      // second corpus explode + distinct shuffle; see t07
      val df_ = tf.groupBy(col("token")).agg(count(lit(1)).cast("double").as("df"))
      val idf = log((col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
      val sat = col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("__avgdl")))
      // grouped min_by top-1 per doc instead of the row_number window
      // — same total order (bm25 >= 0: idf >= ln(1) and sat > 0, so
      // the negation is NaN-free; tokens distinct within a doc), with
      // map-side partial aggregation and no WindowExec sort (see t07)
      tf.join(df_, "token")
        .crossJoin(broadcast(stats))
        .withColumn("bm25", round(idf * sat, 6))
        .groupBy(col("doc_id"))
        .agg(min_by(struct(col("token"), col("bm25")),
          struct(negate(col("bm25")), col("token"))).as("__top"))
        .select(col("doc_id"), col("__top.token").as("top_term"),
          col("__top.bm25").as("bm25"))
    }),

    // pipeline: BM25 SERVING from a MATERIALIZED inverted index — the
    // text twin of s08's ANN index table. The build pass (cached per
    // dataset/session, like the ANN quantizers) lands postings
    // (token, doc_id, tf, dl, df + folded corpus stats, all integers)
    // in a SegmentedTable laid out by token, so a keyword query reads
    // ONLY matching postings via pushed token predicates — the
    // documents table is never scanned at serve time (PlanSpec pins
    // this). Scoring: per-term BM25 in exact integer ppm
    // (FLOOR(score·1e6 + 0.5)) so the per-doc SUM over query terms is
    // partition-order-free, then top-10 by (score, doc_id) — a total
    // order, so the LIMIT boundary is deterministic. At 100 TB the
    // build is the corpus-sized stage (same shape as t13); each query
    // is index-sized: |postings of its terms|.
    "t21_bm25_index_serve" -> ((s, d) => {
      // scoring kernel shared verbatim with the interactive serve
      // session ([[graft.text.Bm25Session]]) so gate and session can
      // never drift
      val idx = bm25IndexFor(s, d).read()
      graft.text.Bm25Session.scoreDocs(idx, Bm25QueryTerms)
        .orderBy(col("score_ppm").desc, col("doc_id").asc)
        .limit(10)
    }),

    // pipeline: PHRASE-QUERY serving from a materialized BIGRAM
    // index (t21's positional companion): adjacent-token pairs land
    // as postings (bigram, doc_id, tf), so an exact two-word phrase
    // answers from the index alone — count and rank docs by phrase
    // frequency without touching the documents table. This is the
    // standard phrase-search compromise: bigram postings answer
    // 2-word phrases exactly and prune longer phrases to candidate
    // docs. Integer tf only — nothing float to replay.
    "t23_phrase_index_serve" -> ((s, d) => {
      val idx = bigramIndexFor(s, d).read()
      idx.filter(col("bigram") === PhraseQuery)
        .orderBy(col("tf").desc, col("doc_id").asc)
        .limit(10)
        .select(col("doc_id"), col("tf"))
    }),

    // pipeline: N-TOKEN phrase serving from the SAME bigram index
    // (t23's >2-token completion): every adjacent bigram's postings
    // are ANDed into a candidate doc set — necessary-but-not-
    // sufficient ("a b … b c" without "a b c" still qualifies) — and
    // ONE verify join recomputes the exact n-gram tf over ONLY the
    // candidate docs. Scale: the index prunes the corpus to the
    // candidates (tiny — docs holding every bigram), the candidate
    // set broadcasts, and the documents scan feeds a broadcast join
    // before any tokenization happens, so verify work is
    // O(candidates), never O(corpus).
    "t24_phrase_ngram_serve" -> ((s, d) => {
      val words = PhraseQuery3.split(' ').toSeq
      val grams = words.sliding(2).map(_.mkString(" ")).toSeq.distinct
      val n = words.length
      val idx = bigramIndexFor(s, d).read()
      val candidates = idx.filter(col("bigram").isin(grams: _*))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("bigram")).as("__ng"))
        .filter(col("__ng") === grams.size)
        .select(col("doc_id"))
      val gramExpr = (0 until n).map(j => s"__w[i+$j]")
        .mkString("concat_ws(' ', ", ", ", ")")
      Tables.documents(s, d)
        .join(broadcast(candidates), "doc_id")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__w"))
        .filter(size(col("__w")) >= n) // sequence(0, <0) would DESCEND
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(0, size(__w) - $n), i -> $gramExpr)")).as("ngram"))
        .filter(col("ngram") === PhraseQuery3)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("doc_id").asc)
        .limit(10)
    }),

    // pipeline: EXACT heavy hitters via a Misra-Gries candidate
    // sketch + exact recount (the two-pass scale shape: a full
    // vocabulary groupBy shuffles every distinct token; the sketch
    // pass ships ≤64 counters per partition, and only candidate rows
    // shuffle in the recount). Threshold 1/30 of all occurrences;
    // sketch size 64 > 30 guarantees the candidate set is a superset
    // of the true answer, so the result is EXACT — the sketch never
    // decides membership, only what gets recounted.
    "t22_heavy_hitters" -> ((s, d) => {
      import graft.functions.MgCandidates.mgCandidates
      val toks = Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      // one pass computes the sketch AND the total occurrence count
      val cand = toks.agg(mgCandidates(col("token"), 64).as("__cand"),
        count(lit(1)).as("__total"))
      // recount pass: the 1-row sketch result broadcasts and each
      // token tests membership with array_contains IN-ROW — the whole
      // probe stays inside one WholeStageCodegen span with no join
      // node. MEASURED against the broadcast-hash-join alternative
      // (explode the ≤64 candidates, BHJ on the token key) on the
      // 20M-row/1M-key bench fixture: filter 1.04 s vs BHJ 2.59 s —
      // the O(64) linear scan per row is noise next to the join's
      // HashedRelation build and the codegen break it causes, and at
      // 100 TB the filter form also broadcasts less (one array, no
      // exploded rows)
      toks.crossJoin(broadcast(cand))
        .filter(array_contains(col("__cand"), col("token")))
        .groupBy(col("token"), col("__total")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(30L) >= col("__total"))
        .select(col("token"), col("cnt"))
    }),

    // pipeline: Gopher-style composite quality rules (Rae et al. 2021
    // §A1.1 — the pre-training filter family): per-doc token count,
    // mean token length, top UNIGRAM fraction (t11's signal) and top
    // BIGRAM fraction — the phrase-repetition signal unigram stats
    // can't see (boilerplate repeats phrases, not words) — folded
    // into one deterministic keep verdict. Every ratio is integer ppm
    // (FLOOR(1e6·x + 0.5), the engine-exact float discipline), keep
    // is 0/1. Scale: two keyed shuffles on (doc_id, gram); the text
    // is tokenized once per stage and only doc_id-keyed aggregates
    // join — no corpus-wide join, no window, no driver loop.
    "t25_gopher_rules" -> ((s, d) => {
      val ppm = (a: String, b: String) =>
        s"CAST(FLOOR(CAST(1000000.0 AS DOUBLE) * CAST($a AS DOUBLE) / " +
          s"CAST($b AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__w"))
      val uni = docs
        .select(col("doc_id"), explode(col("__w")).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"),
          sum(col("cnt") * length(col("token"))).as("__chars"),
          max(col("cnt")).as("__top1"))
      val big = docs
        .filter(size(col("__w")) >= 2) // sequence(0, <0) would DESCEND
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(__w) - 2), " +
            "i -> concat(__w[i], ' ', __w[i + 1]))")).as("bigram"))
        .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(max(col("cnt")).as("__top2"), sum(col("cnt")).as("__nbig"))
      uni.join(big, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          expr(ppm("__chars", "n_tokens")).as("mean_len_ppm"),
          expr(ppm("__top1", "n_tokens")).as("top_tok_ppm"),
          expr(s"COALESCE(${ppm("__top2", "__nbig")}, 0)").as("top_bigram_ppm"))
        .withColumn("keep",
          when(col("n_tokens") >= 30 && col("n_tokens") <= 100000 &&
            col("mean_len_ppm") >= 3000000L && col("mean_len_ppm") <= 10000000L &&
            col("top_tok_ppm") <= 120000L && col("top_bigram_ppm") <= 60000L,
            1).otherwise(0))
    }),

    // pipeline: deterministic train/val/test split — assignment is a
    // pure function of doc_id (md5 prefix mod 100), so the same doc
    // lands in the same split on every engine, every run, any
    // partitioning; the query reports per-split doc and char budgets
    "t08_train_split" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), splitOf(col("doc_id")).as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("docs"),
          sum(col("n_chars").cast("long")).as("chars"))
    }),

    // pipeline: corpus-driven stopword pruning — the top-20 tokens by
    // document frequency become the stopword list, computed IN-PLAN
    // (distributed top-k + 1-row collect_list, broadcast to the per-doc
    // stage; no driver-side action, no global window), then each doc
    // reports total vs stopword token occurrences
    "t09_stopword_prune" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__words"))
      val sw = docs
        .select(col("doc_id"), explode(col("__words")).as("token"))
        .groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
        .orderBy(col("df").desc, col("token").asc).limit(20)
        .agg(array_sort(collect_list(col("token"))).as("__sw"))
      docs.crossJoin(broadcast(sw))
        .select(col("doc_id"),
          size(col("__words")).as("n_tokens"),
          size(filter(col("__words"),
            t => array_contains(col("__sw"), t))).as("stop_tokens"))
    }),

    // multimodal: video frame sampling — each payload expands to 4
    // deterministic stub frames through the batched mapPartitions
    // decode shape (one row per sampled frame, payload never shuffles)
    "m03_frame_sample" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val payloads = Multimodal.withPayload(Tables.documents(s, d), "doc_id", "text")
      Multimodal.sampleFrames(payloads.select(col("id"), col("payload")), 4)
        .toDF()
    }),

    // pipeline: repetition quality signals (the Gopher-rules shape):
    // duplicate-token ratio and most-frequent-token fraction per doc.
    // Distributed word-count keyed on (doc_id, token) — map-side
    // partial agg, no skew (the key includes the doc), no windows
    "t11_repetition" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("__n"), count(lit(1)).as("n_distinct"),
          max(col("cnt")).as("__top"))
        .select(col("doc_id"),
          col("__n").as("n_tokens"),
          col("n_distinct"),
          ((col("__n") - col("n_distinct")).cast("double") /
            col("__n").cast("double")).as("dup_ratio"),
          (col("__top").cast("double") /
            col("__n").cast("double")).as("top_frac"))
    }),

    // pipeline: vocabulary masking for tokenizer prep — out-of-vocab
    // tokens become <unk>, with a per-doc replacement count. Pure
    // narrow projection over a staged token array (no shuffle at all)
    "t12_oov_mask" -> ((s, d) => {
      val inVocab = (w: org.apache.spark.sql.Column) =>
        w.isInCollection(OovVocab)
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__words"))
        .select(col("doc_id"),
          array_join(transform(col("__words"),
            w => when(inVocab(w), w).otherwise(lit("<unk>"))), " ").as("masked_text"),
          size(filter(col("__words"), w => !inVocab(w))).as("n_masked"))
    }),

    // pipeline: sequence packing (concat-then-chunk): documents are
    // sharded by a pure hash, concatenated in doc_id order within the
    // shard, and cut into fixed token-budget sequences — each shard
    // packs independently (the window partitions on shard, so packing
    // 100 TB parallelizes across shards; no global order, no single
    // reducer). seq_id = running-token start offset div budget.
    "t14_seq_pack" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 512
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("toks"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 8).as("shard"))
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs
        .withColumn("cum", sum(col("toks")).over(w))
        .withColumn("seq_id", ((col("cum") - col("toks")) / budget).cast("long"))
        .groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("seq_tokens"))
    }),

    // pipeline capstone: end-to-end curation — quality-filter, exact
    // dedup keeping the min-id representative, split assignment, and a
    // per-(split, lang) rollup. Every stage is individually gated
    // elsewhere; this entry gates their composition in one plan (the
    // shape a real curation job ships): narrow quality projection →
    // one dedup hash-agg on the 16-byte fingerprint → pure-function
    // split — no extra corpus passes, two shuffles total
    "t15_curation_e2e" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
        .filter(col("quality") >= 0.6)
      val deduped = docs
        .groupBy(md5(lower(trim(col("text")))).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .join(docs, "doc_id")
      deduped
        .select(col("lang"), col("toks"), splitOf(col("doc_id")).as("split"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("docs"), sum(col("toks")).as("tokens"))
    }),

    // pipeline: per-source document caps (the RefinedWeb-style domain
    // limit: no source may contribute more than N documents, keeping
    // the HIGHEST-quality ones) — rank within source by (quality desc,
    // doc_id asc) and keep rank ≤ 20. The window partitions by source,
    // so the shuffle is source-keyed and no global order exists; ties
    // break on doc_id, making the kept set deterministic in any
    // engine. Output is the per-source survivor stats.
    "t20_source_cap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("kept_docs"), sum(col("toks")).as("kept_tokens"),
          min(col("quality")).as("min_kept_quality"))
    }),

    // pipeline: corpus-mixture reweighting — per-source token shares
    // vs a uniform target mixture; the sampling weight is what a
    // training loader multiplies each source's draw probability by.
    // Corpus totals fold in-plan as a 1-row broadcast (the t07
    // pattern): no driver-side pass, two shuffles total
    "t16_mixture_weights" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("tokens"))
      val tot = per.agg(sum(col("tokens")).cast("double").as("__t"),
        count(lit(1)).cast("double").as("__ns"))
      per.crossJoin(broadcast(tot))
        .withColumn("weight",
          round((lit(1.0) / col("__ns")) / (col("tokens") / col("__t")), 6))
        .select(col("source"), col("docs"), col("tokens"), col("weight"))
    }),

    // pipeline: DSIR-shaped importance weighting (Xie et al. 2023,
    // "Data Selection for Language Models via Importance Resampling"):
    // rank raw-corpus documents by how much more likely their tokens
    // are under a TARGET distribution (the lang='en' slice) than under
    // the raw corpus — add-1-smoothed unigram LMs, per-token
    // likelihood ratio. Determinism discipline: the ratio is computed
    // in DOUBLE (every IEEE *,/ is correctly rounded, so identical in
    // any engine, and doubles cannot overflow where int64 products
    // would at corpus scale) and floored to an integer ppm — per-doc
    // aggregation is then a BIGINT sum, partition-order-independent,
    // where a float log-ratio sum would hash differently per run. The
    // ratio is ≤ (n_r+v)/(n_t+v) because c_r ≥ c_t always, and is
    // additionally CAPPED at 1e12 ppm so a long document under a tiny
    // target share cannot overflow its per-doc BIGINT ppm sum (t18's
    // ceiling discipline — capped tokens already max the signal). Two keyed shuffles
    // (vocab agg by token, doc re-agg), a 1-row totals broadcast.
    "t17_importance_weights" -> ((s, d) => {
      val terms = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(TextFunctions.tokens(col("text"))).as("token"))
      val vocab = terms.groupBy(col("token"))
        .agg(count(lit(1)).as("c_r"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_t"))
      val tot = vocab.agg(sum(col("c_r")).as("n_r"), sum(col("c_t")).as("n_t"),
        count(lit(1)).as("v"))
      terms.join(vocab, "token").crossJoin(broadcast(tot))
        .withColumn("ppm", expr(
          """LEAST(CAST(FLOOR(CAST(c_t + 1 AS DOUBLE) * CAST(n_r + v AS DOUBLE) /
             (CAST(n_t + v AS DOUBLE) * CAST(c_r + 1 AS DOUBLE)) *
             CAST(1000000 AS DOUBLE)) AS BIGINT),
             CAST(1000000000000 AS BIGINT))"""))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("ppm")).as("__s"))
        // the mean stays in integer ppm until ONE exact double division
        // — round() at a half-boundary differs between engines
        // (HALF_UP vs half-to-even), integer div does not
        .select(col("doc_id"), col("n_tokens"),
          (expr("__s div n_tokens").cast("double") / 1e6).as("weight"))
    }),

    // pipeline: unigram-surprise quality scoring — the unigram
    // analogue of CCNet's LM-perplexity filter: documents whose tokens
    // are improbable under the corpus LM (high mean inverse unigram
    // probability) are junk candidates. Same double-then-floor ppm
    // discipline and shuffle shape as t17; the inverse probability is
    // additionally CAPPED (hapax tokens in a huge corpus would
    // otherwise make a long doc's ppm sum overflow int64) — a ceiling
    // on per-token surprise, not a correctness trade, since every
    // capped token already maxes the filter signal.
    "t18_unigram_surprise" -> ((s, d) => {
      val terms = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
      val vocab = terms.groupBy(col("token")).agg(count(lit(1)).as("c_r"))
      val tot = vocab.agg(sum(col("c_r")).as("n_r"), count(lit(1)).as("v"))
      terms.join(vocab, "token").crossJoin(broadcast(tot))
        .withColumn("inv_ppm", expr(
          """LEAST(CAST(FLOOR(CAST(n_r + v AS DOUBLE) / CAST(c_r + 1 AS DOUBLE) *
             CAST(1000000 AS DOUBLE)) AS BIGINT),
           CAST(1000000000000 AS BIGINT))"""))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("inv_ppm")).as("__s"))
        .select(col("doc_id"), col("n_tokens"),
          (expr("__s div n_tokens").cast("double") / 1e6).as("mean_inv_prob"))
    }),

    // pipeline: bigram-LM scoring — the CONDITIONAL upgrade of t18
    // (CCNet's LM-perplexity filter shape): each adjacent pair scores
    // the inverse smoothed conditional probability 1/P(w2|w1) with
    // P = (c2+1)/(c1+V) (add-one over prefix counts), so a run of
    // improbable TRANSITIONS — word salad, shuffled boilerplate —
    // scores high even when every individual token is common (t18 is
    // blind to order). Same cap/floor ppm discipline as t18. Scale:
    // prefix counts derive FROM the bigram counts (c1 = Σ_w2 c2, no
    // second corpus pass); the per-pair joins are (w1,w2)- and
    // w1-keyed shuffles; V is a 1-row broadcast.
    "t26_bigram_lm_score" -> ((s, d) => {
      val pairs = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__w"))
        .filter(size(col("__w")) >= 2) // sequence(0, <0) would DESCEND
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(__w) - 2), " +
            "i -> struct(__w[i] AS w1, __w[i + 1] AS w2))")).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      val c2 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
      val v = pairs.agg(countDistinct(col("w2")).as("v"))
      pairs.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .withColumn("inv_ppm", expr(
          """LEAST(CAST(FLOOR(CAST(c1 + v AS DOUBLE) / CAST(c2 + 1 AS DOUBLE) *
             CAST(1000000 AS DOUBLE)) AS BIGINT),
           CAST(1000000000000 AS BIGINT))"""))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("inv_ppm")).as("__s"))
        .select(col("doc_id"), col("n_bigrams"),
          (expr("__s div n_bigrams").cast("double") / 1e6).as("mean_inv_prob"))
    }),

    // pipeline: overlapping-window CHUNKING (the RAG/pre-training
    // segmentation stage): each doc splits into 50-token chunks at
    // stride 25, the trailing chunk short — chunk identity carried as
    // an md5 fingerprint of the joined tokens so the gate proves the
    // exact token content of every chunk, not just the counts.
    // Scale: explode of start offsets + slice — a narrow projection,
    // no shuffle at all (the chunker is embarrassingly parallel).
    "t28_chunk_overlap" -> ((s, d) => {
      val stride = 25
      val width = 50
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__w"))
        .filter(size(col("__w")) > 0)
        .select(col("doc_id"), col("__w"),
          explode(expr(s"sequence(0, size(__w) - 1, $stride)")).as("start"))
        .select(col("doc_id"),
          (col("start") / lit(stride)).cast("int").as("chunk_idx"),
          expr(s"slice(__w, start + 1, $width)").as("__c"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("__c")).as("n_tokens"),
          md5(concat_ws(" ", col("__c")).cast("binary")).as("chunk_fp"))
    }),

    // pipeline: deterministic EPOCH SHUFFLE — the training-data
    // ordering stage: every doc gets a (shard, position) for epoch 0
    // as a pure function of (epoch, doc_id) (md5 key → shard by hash
    // prefix, position by key order within the shard), so the same
    // corpus shuffles identically on any engine, any partitioning,
    // any rerun — and a different epoch string reshuffles completely.
    // Scale: one shard-keyed window; no global order ever exists
    // (the per-shard order IS the contract readers consume).
    "t27_epoch_shuffle" -> ((s, d) => {
      val nShards = 8
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("__k"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat_ws("|", lit("epoch0"), col("doc_id"))).as("__k"))
        .withColumn("shard",
          (conv(substring(col("__k"), 1, 8), 16, 10).cast("long")
            % nShards).cast("int"))
        .select(col("doc_id"), col("shard"),
          row_number().over(w).as("pos"))
    }),

    // pipeline: deterministic mixture RESAMPLING — materializes t16's
    // uniform-over-sources target by downsampling each source at
    // rate = min(1, weight), with the keep/drop decision a pure
    // function of (doc_id, source) through md5 (the t08 split
    // discipline: stable across engines, partitionings, and reruns —
    // never rand()). The uniform draw is 5 md5 hex chars = EXACTLY
    // 2^20 equally-likely values with rates in the same 2^20 units —
    // no modulo, no bias (a mod-1e6 reduction of a 24-bit value keeps
    // rates ~1.3% hot). Per-source rates are a handful of rows
    // broadcast to the filter; one narrow pass over the corpus.
    "t19_mixture_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val per = docs.groupBy(col("source"))
        .agg(sum(TextFunctions.tokenCount(col("text")).cast("long")).as("tokens"))
      val tot = per.agg(sum(col("tokens")).as("t"), count(lit(1)).as("ns"))
      val rates = per.crossJoin(broadcast(tot))
        .withColumn("rate_u20", least(lit(1048576L),
          expr("(t * CAST(1048576 AS BIGINT)) div (ns * tokens)")))
        .select(col("source"), col("rate_u20"))
      docs.join(broadcast(rates), "source")
        .withColumn("__u", conv(substring(md5(
          concat(col("doc_id").cast("string"), lit(":"), col("source"))), 1, 5),
          16, 10).cast("long"))
        .filter(col("__u") < col("rate_u20"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("kept_docs"),
          sum(col("n_chars").cast("long")).as("kept_chars"))
    }),

    // corpus analysis: COLLOCATION mining — bigrams whose observed
    // frequency beats the independence expectation (the PMI signal;
    // emitted as the integer-scaled LIFT ratio c2·N / (cl·cr), of
    // which PMI is the log — same ranking, zero cross-engine float-log
    // risk, the t26 discipline). Unigram totals derive from the bigram
    // count table itself (cl = outgoing, cr = incoming), so the corpus
    // is tokenized ONCE and every later stage is vocabulary-sized:
    // one keyed shuffle on (w1,w2), two tiny derived aggs, a 1-row
    // broadcast total, TakeOrderedAndProject for the global top-100
    // (never a full sort). min-count 5 keeps the rare-pair noise
    // (1/c ratios explode as c→1) out of the ranking.
    "t29_pmi_collocations" -> ((s, d) => {
      val pairs = Tables.documents(s, d)
        .select(TextFunctions.tokens(col("text")).as("__w"))
        .filter(size(col("__w")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(__w) - 2), " +
            "i -> struct(__w[i] AS w1, __w[i + 1] AS w2))")).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      // the bigram count table is vocabulary²-sized — persist it so
      // the corpus is tokenized ONCE for its four consumers (the two
      // marginals, the total, and the scored join)
      val c2 = pairs.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c2")).persist()
      try {
        val cl = c2.groupBy(col("w1")).agg(sum(col("c2")).as("cl"))
        val cr = c2.groupBy(col("w2")).agg(sum(col("c2")).as("cr"))
        val n2 = c2.agg(sum(col("c2")).as("n2"))
        c2.filter(col("c2") >= 5)
          .join(cl, Seq("w1")).join(cr, Seq("w2"))
          .crossJoin(broadcast(n2))
          .withColumn("lift_ppm", expr(
            """LEAST(CAST(FLOOR(CAST(c2 AS DOUBLE) * CAST(n2 AS DOUBLE) /
               (CAST(cl AS DOUBLE) * CAST(cr AS DOUBLE)) * 1000000.0) AS BIGINT),
               CAST(1000000000000 AS BIGINT))"""))
          .orderBy(col("lift_ppm").desc, col("c2").desc, col("w1"), col("w2"))
          .limit(100)
          .select(col("w1"), col("w2"), col("c2"), col("lift_ppm"))
          .localCheckpoint()
      } finally c2.unpersist()
    }),

    // corpus analysis: cross-SOURCE vocabulary overlap — Jaccard and
    // containment between every source pair, the corpus-composition
    // audit run before mixing sources into a training blend (high
    // containment = one source is a subset of another; low Jaccard =
    // genuinely complementary). Distinct (source, token) is one keyed
    // shuffle; the pair counts come from a token-keyed self-join whose
    // per-token fanout is bounded by #sources² (never doc-pair-sized);
    // the per-source sizes are a sources-sized broadcast. Ratios are
    // exact integer ppm (×10^6 div union) — bit-replayable anywhere.
    "t30_source_overlap" -> ((s, d) => {
      // the distinct (source, token) set is vocabulary-sized — persist
      // it so the corpus is tokenized ONCE, not once per consumer
      // (sizes + both self-join sides), then localCheckpoint the tiny
      // result so the unpersist can't resurrect the corpus scans
      val v = Tables.documents(s, d)
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("w"))
        .distinct().persist()
      try {
        val sizes = v.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val a = v.select(col("source").as("src_a"), col("w"))
        val b = v.select(col("source").as("src_b"), col("w"))
        a.join(b, Seq("w"))
          .filter(col("src_a") < col("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("inter"))
          .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("na"))),
            Seq("src_a"))
          .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("nb"))),
            Seq("src_b"))
          .select(col("src_a"), col("src_b"), col("inter"), col("na"), col("nb"),
            expr("CAST(inter * 1000000 DIV (na + nb - inter) AS BIGINT)")
              .as("jaccard_ppm"),
            expr("CAST(inter * 1000000 DIV LEAST(na, nb) AS BIGINT)")
              .as("containment_ppm"))
          .localCheckpoint()
      } finally v.unpersist()
    }),

    // curation: per-source LENGTH-OUTLIER pruning — docs whose token
    // count falls outside the source's [P5, P95] band are dropped (the
    // truncated/concatenated-document filter every curation pipeline
    // runs before training). Percentiles are EXACT (oracle parity —
    // the q37 discipline); on integral inputs Spark's percentile
    // aggregates a value→count map, so its state is O(distinct token
    // counts), not O(rows) — bounded at any corpus size. The bounds
    // table is sources-sized and broadcasts; both passes over the
    // corpus are narrow projections.
    // 100 TB FLOAT-column route: for a continuous measure (where
    // O(distinct) = O(rows)), compute the bounds with
    // [[graft.functions.KllQuantiles.exactQuantiles]] / SQL
    // `kll_sketch` instead — O(k·log) state, exact order statistics,
    // budget-bounded recount (the d03→minhashCandidates routing
    // pattern; CorpusOpsSpec pins both paths agreeing on this gate).
    "t32_length_prune" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      val bounds = docs.groupBy(col("source"))
        .agg(expr("percentile(n_tokens, 0.05)").as("p05"),
          expr("percentile(n_tokens, 0.95)").as("p95"))
      docs.join(broadcast(bounds), Seq("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_tokens") < col("p05"), 1L).otherwise(0L))
            .as("dropped_low"),
          sum(when(col("n_tokens") > col("p95"), 1L).otherwise(0L))
            .as("dropped_high"),
          sum(when(col("n_tokens") >= col("p05") &&
            col("n_tokens") <= col("p95"), 1L).otherwise(0L)).as("kept"),
          first(col("p05")).as("p05"), first(col("p95")).as("p95"))
    }),

    // curation: model-based QUALITY FILTERING — a fastText-shaped
    // HASHED linear classifier (Joulin et al. 2017; the CCNet / DCLM
    // model-filtering stage): token → weight(md5-hash mod D), document
    // score = integer sum, keep/drop at 0. The hashing trick is the
    // 100 TB story: no vocabulary broadcast, no dictionary join — the
    // "model" is D integers derived in-row, so the whole filter is one
    // narrow codegen'd projection.
    "t33_quality_classifier" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("__w", TextFunctions.tokens(col("text")))
        .select(col("doc_id"),
          size(col("__w")).cast("long").as("n_tokens"),
          TextFunctions.hashedClassifierScore(col("__w")).as("w_sum"))
        .withColumn("label",
          when(col("w_sum") >= 0, "keep").otherwise("drop"))
    }),

    // corpus analysis: n-gram DIVERSITY audit — per-source distinct
    // 3-gram ratio (the type/token ratio at n-gram granularity): the
    // template/boilerplate detector a curator reads next to t11's
    // within-doc repetition (a source can look clean per-document and
    // still be one template stamped a million times). One tokenize
    // pass; count + count-distinct fold into a single per-(source,
    // gram) then per-source agg — two keyed shuffles, no join; ratio
    // in exact integer ppm.
    "t34_ngram_diversity" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          explode(TextFunctions.wordShingles(col("text"))).as("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("total_grams"),
          countDistinct(col("g")).as("distinct_grams"))
        .select(col("source"), col("total_grams"), col("distinct_grams"),
          expr("CAST(distinct_grams * 1000000 DIV total_grams AS BIGINT)")
            .as("diversity_ppm"))
    }),

    // dedup: WINNOWING document fingerprints (Schleimer et al., SIGMOD
    // 2003 — MOSS): per-position 4-gram Karp-Rabin fingerprints (the
    // d06 machinery), window-of-4 minima, distinct set — the
    // guaranteed-recall sampled fingerprint sheet exact-substring
    // dedup keeps per document instead of every gram (~2/(w+1) of
    // positions at 100 TB, the bandwidth knob). Pure per-row array
    // expressions — no shuffle at all; the gate emits order-free
    // integer stats of each doc's fingerprint set.
    "t35_winnowing" -> ((s, d) => {
      // CPU-bound per-row hashing over one small file — guarded
      // spread to task parallelism (the d04 note)
      spreadCpu(Tables.documents(s, d))
        .withColumn("__w", TextFunctions.tokens(col("text")))
        .withColumn("__h", TextFunctions.gramFingerprints(col("__w"), 4))
        .withColumn("__fps", TextFunctions.winnowedFingerprints(col("__h"), 4))
        .select(col("doc_id"),
          size(col("__fps")).cast("long").as("n_fps"),
          array_min(col("__fps")).as("fp_min"),
          array_max(col("__fps")).as("fp_max"),
          aggregate(col("__fps"), lit(0L), (a, x) => a + x).as("fp_sum"))
    }),

    // similarity: MUTUAL kNN GRAPH construction — the neighborhood
    // graph embedding-space clustering / label propagation builds
    // (edge iff each endpoint is in the other's in-bucket top-3);
    // candidates from the s09 salted sign-bucket scaffold, mutuality
    // decided by one keyed count over the ≤ |corpus|×k directed edge
    // set — see Similarity.mutualKnnGraph for the full scale story.
    "s13_knn_graph" -> ((s, d) => {
      Similarity.mutualKnnGraph(Tables.embeddings(s, d),
        "vec_id", "embedding", 3, 2)
    }),

    // similarity: k-means CLUSTER AUDIT — per-cell population and
    // integer-ppm inertia over the materialized s04 centroids (the
    // quantizer-balance report read before trusting SemDeDup cells or
    // cell-pruned ANN serving). Assignment is the in-row
    // literal-centroid projection (no shuffle); the only shuffle is
    // the nlist-row final agg.
    "s14_cluster_audit" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.clusterAudit(emb, "vec_id", "embedding",
        centroidsFor(s, d, emb))
    }),

    // retrieval: HYBRID search — the t21 lexical BM25 index serve and
    // a vector ANN search fused by reciprocal-rank fusion (RRF,
    // SIGIR 2009), the standard RAG retrieval composition: no score
    // calibration across systems, each contributes the exact integer
    // 10^9 div (60 + rank), documents in both lists accumulate. Both
    // inputs are top-10 results, so the fusion join is 20 rows —
    // the whole gate's corpus-sized work is the two searches it
    // composes (index-only lexical serve + the sampled vector query).
    "t31_hybrid_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lexTop = graft.text.Bm25Session
        .scoreDocs(bm25IndexFor(s, d).read(), Bm25QueryTerms)
        .orderBy(col("score_ppm").desc, col("doc_id").asc).limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score_ppm").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("rank"))
      val emb = Tables.embeddings(s, d)
      val vecTop = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") === 0), "vec_id", "embedding", 10)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.text.Rrf.fuse(Seq("lex" -> lexTop, "vec" -> vecTop), "doc_id")
    }),

    // pipeline: eval-set contamination detection — test-split documents
    // that share a MinHash LSH band with any train-split document are
    // flagged as potentially contaminated (near-dup of training data).
    // One signature pass over the corpus (persisted, both join sides
    // read it), then a band-key join BETWEEN splits only — the split
    // is recomputed from the id on the banded rows, so no corpus-wide
    // split-map join is ever shuffled. Never all-pairs, exactly the
    // d02 scaling story.
    "t10_contamination" -> ((s, d) => {
      import graft.dedup.Dedup
      val banded = Dedup.bandedSignatures(
        Tables.documents(s, d), "doc_id", "text", 16, 4).persist()
      try {
        val test = banded.filter(splitOf(col("id")) === "test")
          .toDF("test_id", "band_idx", "band_key")
        val train = banded.filter(splitOf(col("id")) === "train")
          .toDF("train_id", "band_idx", "band_key")
        test.join(train, Seq("band_idx", "band_key"))
          .select(col("test_id"), col("train_id")).distinct()
          .groupBy(col("test_id"))
          .agg(count(lit(1)).as("n_contaminating"),
            min(col("train_id")).as("example_train"))
          .localCheckpoint()
      } finally banded.unpersist()
    }),

    // dedup: exact fingerprint groups
    "d01_dedup_exact" -> ((s, d) => {
      Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")
    }),

    // dedup: MinHash-LSH candidate pairs (k=16 hashes, 4 bands of 4)
    "d02_minhash_pairs" -> ((s, d) => {
      Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text", 16, 4)
    }),

    // dedup: exact n-gram Jaccard over blocked pairs
    // dedup: edit-distance-VERIFIED near-dup pairs — LSH band
    // candidates confirmed by normalized Levenshtein (ratio ≤ 1/10).
    // The order-sensitive complement of d03's set-overlap verify.
    "d08_editdist_pairs" -> ((s, d) => {
      Dedup.editDistancePairs(Tables.documents(s, d), "doc_id", "text", 10)
    }),

    "d03_jaccard_pairs" -> ((s, d) => {
      Dedup.blockedJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        Seq("source", "lang"), 0.8)
    }),

    // dedup: md5-SimHash signature (32-bit); repartitioned because the
    // per-row hashing is CPU-bound and the source is one small file
    "d04_simhash" -> ((s, d) => {
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextFunctions.simhash32(col("text")).as("simhash"))
    }),

    // dedup: cross-SOURCE near-dup LEAKAGE audit — d02's LSH candidate
    // pairs whose two documents come from DIFFERENT sources, counted
    // per canonical source pair: the between-collection duplication
    // matrix a curator reads before blending sources (the same signal
    // t10 computes between train/test splits, here between corpora).
    // Candidates are band-keyed (never all-pairs); the two source
    // lookups are keyed joins on the pair-bounded candidate list.
    "d09_cross_source_dups" -> ((s, d) => {
      val pairs = Dedup.minhashCandidates(Tables.documents(s, d),
        "doc_id", "text", 16, 4)
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      pairs
        .join(src.toDF("id_a", "__sa"), Seq("id_a"))
        .join(src.toDF("id_b", "__sb"), Seq("id_b"))
        .filter(col("__sa") =!= col("__sb"))
        .select(least(col("__sa"), col("__sb")).as("src_a"),
          greatest(col("__sa"), col("__sb")).as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("dup_pairs"))
    }),

    // dedup: LSH ESTIMATOR-QUALITY audit (the d02 twin of s10's ANN
    // recall): per candidate pair, the MinHash-estimated Jaccard
    // (signature agreement / k) against the EXACT shingle-set Jaccard,
    // with the absolute estimation error — the calibration loop a
    // curator runs before trusting LSH thresholds at corpus scale.
    // One signature+shingle-set pass over the corpus; both lookups
    // are keyed joins against the pair-bounded candidate list; all
    // ratios exact integer ppm.
    "d11_lsh_estimate_audit" -> ((s, d) => {
      import graft.functions.MinHashExpressions._
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4)
      val feat = docs.select(col("doc_id").as("id"), col("text"))
        .withColumn("__words", TextFunctions.tokens(col("text")))
        .withColumn("__sh", wordShingles3(col("__words")))
        .filter(size(col("__sh")) > 0)
        .select(col("id"), minhashSignature(col("__sh"), 16).as("sig"),
          array_distinct(col("__sh")).as("shset"))
      pairs
        .join(feat.toDF("id_a", "sig_a", "set_a"), Seq("id_a"))
        .join(feat.toDF("id_b", "sig_b", "set_b"), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          expr("""CAST(aggregate(zip_with(sig_a, sig_b,
              (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
              0L, (a, v) -> a + v) * 1000000 DIV 16 AS BIGINT)""")
            .as("est_ppm"),
          // the intersection size must widen to LONG before the ppm
          // multiply: int × 1000000 wraps silently past 2147 shared
          // shingles (~2150-token documents — routine at real scale)
          expr("""CAST(CAST(size(array_intersect(set_a, set_b)) AS BIGINT)
              * 1000000 DIV size(array_union(set_a, set_b)) AS BIGINT)""")
            .as("exact_ppm"))
        .withColumn("err_ppm", abs(col("est_ppm") - col("exact_ppm")))
    }),

    // dedup: DIRECTIONAL CONTAINMENT over LSH candidates — per pair,
    // |A∩B|/|A| and |A∩B|/|B| on distinct shingle sets (exact ppm):
    // the asymmetric subset signal symmetric Jaccard dilutes — a
    // short document quoted whole inside a long one scores high
    // containment but low Jaccard, so containment is the
    // quote/excerpt dedup criterion. Same bounded keyed-join shape as
    // d11.
    "d13_containment_pairs" -> ((s, d) => {
      import graft.functions.MinHashExpressions.wordShingles3
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4)
      val feat = docs.select(col("doc_id").as("id"), col("text"))
        .withColumn("__w", TextFunctions.tokens(col("text")))
        .withColumn("__sh", wordShingles3(col("__w")))
        .filter(size(col("__sh")) > 0)
        .select(col("id"), array_distinct(col("__sh")).as("shset"))
      pairs
        .join(feat.toDF("id_a", "set_a"), Seq("id_a"))
        .join(feat.toDF("id_b", "set_b"), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          // LONG numerator — see d11's overflow note
          expr("""CAST(CAST(size(array_intersect(set_a, set_b)) AS BIGINT)
              * 1000000 DIV size(set_a) AS BIGINT)""").as("cont_a_ppm"),
          expr("""CAST(CAST(size(array_intersect(set_a, set_b)) AS BIGINT)
              * 1000000 DIV size(set_b) AS BIGINT)""").as("cont_b_ppm"))
        .withColumn("max_cont_ppm",
          greatest(col("cont_a_ppm"), col("cont_b_ppm")))
    }),

    // similarity: cosine RANGE search — all corpus vectors within a
    // similarity radius of each sampled query (the radius-query API
    // beside the top-k ladder; k-free retrieval for near-dup lookups).
    // Exact rung: broadcast queries, one corpus scan, no window.
    "s15_range_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.rangeSearch(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 0.3)
    }),

    // dedup: connected components over LSH candidate pairs — every doc
    // in a near-dup component mapped to its canonical representative
    "d05_dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text", 16, 4)
      Dedup.nearDupClusters(pairs)
    }),

    // dedup: the APPLY step of the d05 find — canonical keep-set
    // materialization (representatives and untouched docs keep, other
    // component members drop), recounted per source: the before/after
    // yield report every dedup run ends with. The only corpus-sized
    // work is the d02/d05 machinery it composes; the verdict join is
    // keyed on doc_id against the pair-graph-bounded cluster map.
    "d10_dedup_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val clusters = Dedup.nearDupClusters(
        Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4))
      docs.select(col("doc_id"), col("source"))
        .join(clusters, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rep").isNull || col("rep") === col("doc_id"), 1L)
            .otherwise(0L)).as("kept"),
          sum(when(col("rep").isNotNull && col("rep") =!= col("doc_id"), 1L)
            .otherwise(0L)).as("dropped"))
    }),

    // corpus analysis: VOCABULARY COVERAGE curve — the share of all
    // token occurrences covered by the top-k most frequent types
    // (k = 5/10/25), the Zipf-head audit that sizes a tokenizer
    // vocabulary. One keyed count over the corpus; the head is a
    // TakeOrderedAndProject (driver-bounded top-25), so the running
    // sum's single-partition window only ever sees 25 rows; the
    // 1-row total broadcasts.
    "t36_vocab_coverage" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val total = counts.agg(sum(col("c")).as("total"))
      val ord = Window.orderBy(col("c").desc, col("w").asc)
      counts.orderBy(col("c").desc, col("w").asc).limit(25)
        .withColumn("rank", row_number().over(ord))
        .withColumn("cum", sum(col("c")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rank").isin(5, 10, 25))
        .crossJoin(broadcast(total))
        .select(col("rank").cast("long").as("k"), col("cum").as("covered"),
          col("total"),
          expr("CAST(cum * 1000000 DIV total AS BIGINT)").as("coverage_ppm"))
    }),

    // dedup: duplicated 8-token-span inventory (exact-substring dedup
    // signal) — per-document counts of spans shared with other docs
    "d06_dup_ngrams" -> ((s, d) => {
      Dedup.dupSpanInventory(Tables.documents(s, d), "doc_id", "text", 8)
    }),

    // dedup: exact-substring dedup YIELD — per-document count of
    // tokens covered by at least one duplicated 8-token span (the
    // merged-interval union, so overlapping spans never double-count):
    // what "deduplicate exact substrings" (Lee et al. 2022) would
    // actually delete, the yield forecast read before running the
    // removal. One tokenize pass (n_tokens rides the gram rows); span
    // duplication decided by the d06 window; coverage = distinct
    // (doc, offset) over the span-bounded explode — every shuffle
    // keyed, nothing all-pairs.
    "d12_span_coverage" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val grams = spreadCpu(Tables.documents(s, d))
        .withColumn("__w", TextFunctions.tokens(col("text")))
        .select(col("doc_id"), size(col("__w")).cast("long").as("n_tokens"),
          posexplode(TextFunctions.gramFingerprints(col("__w"), 8))
            .as(Seq("pos", "g")))
      val w = Window.partitionBy(col("g"))
      grams
        .withColumn("__dup",
          min(col("doc_id")).over(w) =!= max(col("doc_id")).over(w))
        .filter(col("__dup"))
        .select(col("doc_id"), col("n_tokens"),
          explode(sequence(col("pos"), col("pos") + 7)).as("tok"))
        .distinct()
        .groupBy(col("doc_id"))
        .agg(first(col("n_tokens")).as("n_tokens"),
          count(lit(1)).as("tokens_covered"))
        .select(col("doc_id"), col("n_tokens"), col("tokens_covered"),
          expr("CAST(tokens_covered * 1000000 DIV n_tokens AS BIGINT)")
            .as("covered_ppm"))
    }),

    // dedup/text: CONTAMINATION SPAN REMOVAL — the "remove" half of
    // exact-substring dedup (Lee et al. 2022): t10 detects split
    // contamination and d12 forecasts the yield; this APPLIES it,
    // clipping every duplicated 8-token-plus span (the d06 predicate)
    // out of each document and emitting the cleaned corpus. Coverage
    // is the merged-interval union as a distinct-position set, so
    // overlapping spans clip once; the clean text is the kept tokens
    // rejoined (the tokenized-reconstruction contract of a real
    // removal pipeline). Scale shape: the span side is d12's two keyed
    // shuffles (g-window, doc_id agg); the clip is one doc_id-keyed
    // join of a per-doc int array bounded by n_tokens, then pure
    // in-row array math — no all-pairs, no driver loops.
    "t40_span_clip" -> ((s, d) =>
      Dedup.clipDupSpans(Tables.documents(s, d), "doc_id", "text", 8)),

    // text: BPE merge LEARNING — the corpus-level tokenizer-training
    // loop (iterative top-pair count + merge over the word-frequency
    // dictionary, deterministic count-then-lexicographic tie-breaks,
    // 8 merges). t05 applies a fixed scheme; this learns one. See
    // BpeTrainer for the determinism contract the oracle replays.
    "t41_bpe_merges" -> ((s, d) =>
      graft.text.BpeTrainer.learnMerges(Tables.documents(s, d), "text", 8)),

    // text: unigram-LM (SentencePiece-style) tokenizer training — the
    // PRUNE-direction counterpart of t41: seed the vocabulary with 10
    // BPE merges, then 4 EM-prune rounds each remove the multi-char
    // piece whose re-split into base characters costs the integer
    // corpus likelihood the least. Same k-rounds-of-keyed-aggs scale
    // shape as t41: every round is vocab-sized, never corpus-sized.
    "t51_unigram_prune" -> ((s, d) =>
      graft.text.UnigramTrainer.prune(Tables.documents(s, d), "text",
        seedMerges = 10, rounds = 4)),

    // text/stats: EXACT percentiles of a float column at sketch cost
    // — the KLL/MRL compactor sketch proposes a per-target value
    // bracket from its tracked worst-case rank-error bound, and the
    // exact recount inside the bracket (count-below + in-slice window
    // rank) yields the exact order statistic. The q37/t32 exact
    // percentile shapes carry O(distinct) agg state — unpayable on
    // floats at 100 TB; this carries O(k·log(n/k)) per partition and
    // the final answer is sketch-independent (the t22 discipline).
    "t52_percentile_sketch" -> ((s, d) =>
      graft.functions.KllQuantiles.exactQuantiles(
        Tables.lineitem(s, d), "l_extendedprice",
        Seq(500000L, 900000L, 990000L))),

    // text/stats: GROUPED exact percentiles at sketch cost — the
    // common percentile form (q37/e05 group first). One grouped
    // sketch pass proposes a bracket per (group, target); boundary
    // duplicates peel analytically from a broadcast-joined count
    // pass; the recount is one (group, target)-partitioned window
    // over budget-bounded slices. Same exactness contract as t52:
    // the answer is the exact order statistic, replayable by a
    // sort-based oracle with zero sketch knowledge.
    "t53_group_percentile_sketch" -> ((s, d) =>
      graft.functions.KllQuantiles.exactQuantilesByGroup(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
        Seq(500000L, 950000L))),

    // text/stats: PRE-AGGREGATED PERCENTILE CUBE — per-cell
    // (l_returnflag) kll_sketch structs are computed once and
    // PERSISTED as ordinary rows in a graft table (sketch-as-data:
    // the struct survives the parquet round trip); the query side
    // reads the cube, folds the cells with kll_merge (O(cells·k·log),
    // no corpus rescan — the bound sums additively), and pays the
    // corpus only for the exact bracket recount. Same exactness
    // contract and oracle family as t52: the answer is the true
    // order statistic, zero sketch knowledge in the oracle.
    "t54_sketch_cube" -> ((s, d) => {
      val cube = sketchCubeFor(s, d)
      val merged = cube.agg(
        graft.functions.KllSketch.kllMerge(col("sk"), 200).as("sk"))
        .collect()(0).getStruct(0)
      graft.functions.KllQuantiles.exactQuantilesFromSketch(
        Tables.lineitem(s, d), "l_extendedprice", merged,
        Seq(250000L, 750000L))
    }),

    // the cube served PER GROUP (t55): each returnflag's cell SLICE
    // (its linestatus cells) folds with kll_merge into a per-group
    // sketch — O(cells·k·log) over cube rows, zero corpus rescans —
    // and one shared grouped recount pays the corpus only for the
    // exact brackets. The dashboard shape: percentiles per dimension
    // slice from a cube built once.
    "t55_group_sketch_cube" -> ((s, d) => {
      val cube = sketchCubeFor(s, d)
      val perGroup = cube.groupBy(col("l_returnflag"))
        .agg(graft.functions.KllSketch.kllMerge(col("sk"), 200).as("sk"))
        .collect()
        .map(r => r.getString(0) -> r.getStruct(1)).toMap
      graft.functions.KllQuantiles.exactQuantilesFromSketchByGroup(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
        perGroup, Seq(500000L, 900000L))
    }),

    // text: BPE merge APPLY — segment the corpus with t41's learned
    // merge table and report per-doc BPE token counts (the
    // compression read a tokenizer-training loop takes per round).
    // The merge table is a k-row driver literal, so the apply stage
    // itself is Exchange-free in-row string work.
    "t42_bpe_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.text.BpeTrainer.learnMerges(docs, "text", 8)
        .orderBy("iter").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.text.BpeTrainer.applyMerges(spreadCpu(docs), "doc_id", "text",
        merges)
    }),

    // text: TRAIN the quality classifier in-engine — t33 applies fixed
    // hashed-linear weights; this learns them: a batch perceptron over
    // the hashing-trick feature space (labels = the en-marker signal
    // on the 'train' split — directly present in the features, so the
    // model demonstrably learns). One corpus tokenization into the
    // cached (doc, bucket, cnt) frame; each round is an in-row scoring
    // pass (weights ride as a D-element literal — no join) plus one
    // bucket-keyed agg collecting exactly D rows. Emits the D-row
    // model + (-1, train-accuracy ppm).
    "t45_train_classifier" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .filter(splitOf(col("doc_id")) === "train")
      graft.text.ClassifierTrainer.trainPerceptron(docs, "doc_id", "text",
        when(TextFunctions.langScore(col("text"), "en") >= 2, 1L)
          .otherwise(-1L),
        buckets = 256, rounds = 3)
    }),

    // text: classifier EVALUATION on held-out splits — the read every
    // training loop ends with: train on 'train' (the t45 model, same
    // 3 rounds), then score every split with the model as a D-element
    // literal (in-row token walk, Exchange-free — the t33 apply
    // shape) and report per-split accuracy in exact ppm. A val/test
    // accuracy near train's proves the hashed model generalizes its
    // signal rather than memorizing bucket noise.
    "t48_classifier_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val label = when(TextFunctions.langScore(col("text"), "en") >= 2, 1L)
        .otherwise(-1L)
      val model = graft.text.ClassifierTrainer.trainPerceptron(
        docs.filter(splitOf(col("doc_id")) === "train"), "doc_id", "text",
        label, buckets = 256, rounds = 3).collect()
      val w = Array.fill(256)(0L)
      model.foreach(r => if (r.getInt(0) >= 0) w(r.getInt(0)) = r.getLong(1))
      graft.text.ClassifierTrainer.evaluate(docs, "text", label,
        splitOf(col("doc_id")), w)
    }),

    // text: PII SCRUBBING — the mandatory redaction stage of every
    // public training-data release (C4/Dolma-style regex scrub):
    // emails, phone numbers and IPv4s detected in-row
    // (regexp_extract_all, group 0 — Catalyst-native, no UDF) and
    // clipped to typed placeholders with the regex engine's
    // left-to-right non-overlapping span walk (the t40 interval
    // discipline, for free). The corpus carries no PII by contract,
    // so the gate PLANTS it deterministically (doc_id-derived spans
    // both engines synthesize identically) — clean docs must pass
    // through byte-identical, planted docs must come back clipped.
    "t44_pii_scrub" -> ((s, d) => {
      val planted = plantPii(Tables.documents(s, d))
      planted.select(col("doc_id"),
        TextFunctions.piiCount(col("text"), TextFunctions.EmailPattern)
          .as("n_emails"),
        TextFunctions.piiCount(col("text"), TextFunctions.PhonePattern)
          .as("n_phones"),
        TextFunctions.piiCount(col("text"), TextFunctions.Ipv4Pattern)
          .as("n_ips"),
        TextFunctions.redactPii(col("text")).as("redacted"))
    }),

    // text: PII scrub on MULTIBYTE text — the t44 regexes are ASCII
    // but the HAYSTACK is the u-corpus (2-/3-/4-byte code points
    // around the planted spans), which is exactly where Java's
    // UTF-16 regex engine and DuckDB's UTF-8 RE2 can disagree on
    // match boundaries: a code-unit-indexed engine would split a
    // surrogate pair when splicing the replacement. Plant AFTER the
    // substitution so the spans themselves stay ASCII (as real PII
    // is) inside multibyte prose; the redacted text hash-compares.
    "t47_utf8_pii" -> ((s, d) => {
      val planted = plantPii(Tables.documents(s, d)
        .select(col("doc_id"), utf8ify(col("text")).as("text")))
      planted.select(col("doc_id"),
        TextFunctions.piiCount(col("text"), TextFunctions.EmailPattern)
          .as("n_emails"),
        TextFunctions.piiCount(col("text"), TextFunctions.PhonePattern)
          .as("n_phones"),
        TextFunctions.piiCount(col("text"), TextFunctions.Ipv4Pattern)
          .as("n_ips"),
        TextFunctions.redactPii(col("text")).as("redacted"))
    }),

    // text: UTF-8 MULTIBYTE hardening — tokenization, code-point vs
    // byte length, raw multibyte content round-trip, and shingle
    // fingerprints over the derived u-corpus (2-, 3- and 4-byte code
    // points; see utf8ify). length() must count CODE POINTS in both
    // engines (a code-UNIT counter reads the surrogate-pair 𝐨 as 2),
    // and md5 must hash the UTF-8 BYTES identically — the two
    // assumptions every tokenizer/shingle/MinHash path silently makes
    // and the ASCII testdata contract never exercised.
    "t43_utf8_text" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), utf8ify(col("text")).as("utext"))
        .withColumn("w", TextFunctions.tokens(col("utext")))
        .withColumn("sh", TextFunctions.shinglesFromTokens(col("w")))
        .select(col("doc_id"),
          size(col("w")).as("n_tokens_u"),
          length(col("utext")).cast("long").as("n_chars_u"),
          octet_length(col("utext")).cast("long").as("n_bytes_u"),
          element_at(col("w"), 1).as("first_token_u"),
          array_min(transform(col("sh"),
            x => TextFunctions.shingleBaseHash(x))).as("min_shingle_h"))
    }),

    // text: CANONICALIZATION — the NFC + control-strip + whitespace-
    // collapse normalization every pipeline runs before fingerprinting
    // (composed and decomposed encodings of the same text must hash
    // identically downstream). The corpus is ASCII by contract, so
    // the gate derives a dirty twin deterministically: every 'a'
    // decomposes to a + U+0301 (NFC must re-compose it to á), every
    // space gains a trailing tab (collapse), and a BEL lands at the
    // end (strip). Both engines derive AND canonicalize, and the
    // canonical text hash-compares — Java's Normalizer and DuckDB's
    // nfc_normalize must agree on every composition.
    "t49_text_canonicalize" -> ((s, d) => {
      val raw = regexp_replace(
        regexp_replace(col("text"), "a", "á"), " ", " \t")
      Tables.documents(s, d)
        .select(col("doc_id"), concat(raw, lit("")).as("raw"))
        .select(col("doc_id"),
          TextFunctions.canonicalize(col("raw")).as("canon"),
          length(col("raw")).cast("long").as("n_chars_raw"))
        .select(col("doc_id"), col("canon"),
          col("n_chars_raw"),
          length(col("canon")).cast("long").as("n_chars_canon"),
          octet_length(col("canon")).cast("long").as("n_bytes_canon"))
    }),

    // text: DOCUMENT CHUNKING — fixed 64-token windows with stride 48
    // (16-token overlap), the embedding/RAG preparation stage that
    // turns documents into retrievable units: chunk starts are
    // k·stride up to the smallest start whose window reaches the end
    // (every token covered, the tail never dropped, and NO redundant
    // fully-contained tail chunk — a 64-token doc is exactly one
    // chunk, not one plus a 16-token sub-chunk an index would score
    // twice). Each chunk carries its provenance (doc, index, start
    // offset) plus the 60-bit content fingerprint downstream
    // chunk-dedup keys on. Pure in-row explode — the ideal 100 TB map
    // stage: no shuffle, rows fan out ~n/stride per doc and the wide
    // text column is sliced, never duplicated whole.
    "t50_doc_chunks" -> ((s, d) =>
      graft.text.Chunker.chunk(Tables.documents(s, d), "doc_id", "text")),

    // dedup: CHUNK-level dedup — the t50 retrieval units grouped by
    // content: chunks whose exact text recurs across documents are the
    // boilerplate an embedding index pays for once per occurrence
    // (headers, licenses, templated sections survive doc-level
    // near-dedup because the SURROUNDING text differs). Content
    // identity is the full md5 of the chunk text (the d01 exact-dedup
    // discipline), so only NARROW (fp, doc_id) rows ride the shuffles
    // — the wide text column never leaves the map stage (PlanSpec
    // pins no Exchange carries chunk_text); the reported chunk_h is
    // the t50 60-bit prefix of the same digest. Output is the
    // duplicated-chunk inventory: fingerprint, distinct docs, total
    // occurrences, canonical (minimum) carrier doc.
    "d18_chunk_dedup" -> ((s, d) => {
      val chunks = queries("t50_doc_chunks")(s, d)
      chunks.select(md5(col("chunk_text")).as("fp"), col("doc_id"))
        .groupBy(col("fp"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("doc_id")).as("min_doc"))
        .filter(col("n_docs") > 1)
        .select(
          expr("CAST(conv(substring(fp, 1, 15), 16, 10) AS BIGINT) % 1000000007")
            .as("chunk_h"),
          col("n_docs"), col("n_occ"), col("min_doc"))
    }),

    // dedup: CANONICAL dedup — t49 feeding d01: exact-dup groups that
    // exist only under canonicalization. The corpus is derived so
    // every doc carries composed accents (a → á), and every 5th doc
    // gains a twin in the DECOMPOSED encoding with doubled spaces and
    // a trailing BEL — the same prose a crawler re-serialized
    // differently. Raw md5 fingerprints (the d01 rule) see distinct
    // documents everywhere; canonical fingerprints collapse each twin
    // onto its original. The gate reports both per source, so the raw
    // count is the negative control the canon count is read against.
    // Two keyed window shuffles (fingerprint-partitioned counts), one
    // source-keyed agg — narrow hash columns only.
    "d19_canonical_dedup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documents(s, d)
      val a = base.select(col("doc_id"),
        regexp_replace(col("text"), "a", "á").as("text"), col("source"))
      val b = base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(regexp_replace(regexp_replace(col("text"), "a", "á"),
            " ", "  "), lit("")).as("text"),
          col("source"))
      val withFp = a.unionByName(b).select(col("doc_id"), col("source"),
        TextFunctions.fingerprint(col("text")).as("raw_fp"),
        TextFunctions.fingerprint(TextFunctions.canonicalize(col("text")))
          .as("can_fp"))
      val counted = withFp
        .withColumn("rn", count(lit(1)).over(Window.partitionBy(col("raw_fp"))))
        .withColumn("cn", count(lit(1)).over(Window.partitionBy(col("can_fp"))))
      counted.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("raw_dup_docs"),
          sum(when(col("cn") > 1, 1L).otherwise(0L)).as("canon_dup_docs"))
    }),

    // text: BPE merge learning over the MULTIBYTE u-corpus — the
    // trainer's symbolize step (one space per CHARACTER) and the
    // replace chain must agree across engines on text where a symbol
    // can be a supplementary-plane code point. Same trainer, same
    // unrolled-CTE oracle, only the corpus differs from t41.
    "t46_utf8_bpe" -> ((s, d) =>
      graft.text.BpeTrainer.learnMerges(
        Tables.documents(s, d)
          .select(col("doc_id"), utf8ify(col("text")).as("text")),
        "text", 6)),

    // dedup: SemDeDup — semantic duplicates within IVF cells (cosine
    // vs an earlier-id vector in the same coarse cell); reuses the
    // materialized s04 centroids so the oracle replays the cells
    "d07_semantic_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Dedup.semanticDupes(emb, "vec_id", "embedding",
        centroidsFor(s, d, emb), 0.4)
    }),

    // similarity: top-k TRAJECTORY similarity (REPOSE, ICDE 2021 —
    // PAPERS.md): each user's event stream reduces to a 24-dim hourly
    // activity profile (integer counts — exact in any engine, so the
    // cosine ranks replay bit-identically), and nearest-neighbor users
    // come from the same cosine top-k kernel the ANN ladder serves.
    // One (user)-keyed agg builds the profiles; the search is the s01
    // brute-force shape with the query set broadcast. At 100 TB the
    // profile build is the only corpus-sized stage (map-side partial
    // counts); the search runs over |users| vectors, not events.
    // events: per-user event-type TRANSITION MATRIX (first-order
    // Markov counts) — the user-journey fabric behind funnel/flow
    // analytics: consecutive event pairs per user, folded into
    // (from, to) counts with exact integer-ppm row-conditional
    // probabilities. One (user)-keyed window pass over the corpus
    // (the q36/g11 shape — the partition-by-user shuffle IS the
    // corpus-sized stage and is inherent to sequence analysis); the
    // transition table is |types|² rows and the per-from totals
    // broadcast. Deterministic: the testdata contract pins (user_id,
    // ts) collision-free, so LEAD order is total.
    "e03_transition_matrix" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .select(col("event_type").as("from_type"), col("to_type"))
      val counts = trans.groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("cnt"))
      val totals = counts.groupBy(col("from_type"))
        .agg(sum(col("cnt")).as("tot"))
      counts.join(broadcast(totals), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("cnt"),
          expr("CAST(cnt * 1000000 DIV tot AS BIGINT)").as("p_ppm"))
    }),

    // similarity: FILTERED vector search — bucketed cosine top-3
    // restricted to label-1 corpus rows (pre-filter: the predicate
    // reaches the scan, and every query gets k in-filter matches
    // where its bucket holds them — post-filtering an unfiltered
    // top-k cannot guarantee that). See Similarity.filteredTopK.
    "s17_filtered_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.filteredTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", col("label") === 1, 3, 4)
    }),

    // events: batch SESSIONIZATION — the 30-minute-gap session split
    // (st02's streaming semantics as a batch window pass): per user,
    // session count, busiest session, longest session. One user-keyed
    // window (lag-gap flags + running sum = session ids), one
    // (user, session) agg, one user agg — every shuffle keyed, and
    // durations are integral ms so the figures replay exactly.
    "e07_sessionize" -> ((s, d) =>
      graft.events.EventAnalytics.sessionize(Tables.events(s, d), 30)),

    // events: ORDERED FUNNEL — strict first-occurrence conversion
    // view → click → purchase: a user converts stage 2 only with a
    // click strictly after their FIRST view, stage 3 only with a
    // purchase strictly after that first qualifying click (the
    // product-analytics funnel with deterministic first-touch
    // attribution). Scale shape: three user-keyed aggregations
    // chained by user-keyed joins, each stage's frame shrinking to
    // its converters; the closing totals join is a broadcast of a
    // 1-row count (the e04 discipline). Exact integer ppm.
    "e06_funnel" -> ((s, d) =>
      graft.events.EventAnalytics.funnel(Tables.events(s, d),
        "view", "click", "purchase")),

    // events: WINDOWED funnel — e06 with a conversion DEADLINE (each
    // step within 6h of the previous step's first touch): the
    // "converted within N days" read every product funnel actually
    // reports. Same chained user-keyed shape; the deadline only
    // tightens the per-stage frames. e06 is this gate's upper bound
    // by construction (a user who misses a deadline drops out of
    // that stage and all later ones).
    "e08_funnel_windowed" -> ((s, d) =>
      graft.events.EventAnalytics.funnelWindowed(Tables.events(s, d),
        "view", "click", "purchase", 6L * 3600 * 1000000000L)),

    // events: INTER-ARRIVAL latency distribution — per event type, the
    // exact P50/P95/min/max of the gap since the user's previous event
    // (attributed to the event that ended the wait): the
    // time-between-actions profile behind session-gap tuning and
    // anomaly thresholds. Gaps are integral nanos, so the exact
    // percentile keeps O(distinct gaps) state (the q37 discipline);
    // one user-keyed window pass, then a |types|-row agg. A FLOAT
    // latency column (O(distinct) = O(rows)) routes to
    // [[graft.functions.KllQuantiles.exactQuantiles]] instead — see
    // t32's routing note.
    "e05_interarrival" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("gap", col("ts") - lag(col("ts"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap, 0.5)").as("p50_ns"),
          expr("percentile(gap, 0.95)").as("p95_ns"),
          min(col("gap")).as("min_ns"), max(col("gap")).as("max_ns"))
    }),

    // events: COHORT RETENTION matrix — users grouped by first-seen
    // week, the share still active k weeks later (the canonical
    // product-analytics rollup next to q36's funnel and e03's
    // transition flows). Two user-keyed aggs over the corpus (cohort
    // assignment and the distinct activity grid — the inherent
    // shuffles of user-sequence analytics); cohort sizes broadcast;
    // retention in exact integer ppm.
    "e04_retention_cohorts" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 604800000000000").as("wk"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      val sizes = cohort.groupBy(col("cohort_wk"))
        .agg(count(lit(1)).as("cohort_size"))
      ev.distinct()
        .join(cohort, Seq("user_id"))
        .select(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .groupBy(col("cohort_wk"), col("week_offset"))
        .agg(count(lit(1)).as("active_users"))
        .join(broadcast(sizes), Seq("cohort_wk"))
        .select(col("cohort_wk"), col("week_offset"), col("active_users"),
          col("cohort_size"),
          expr("CAST(active_users * 1000000 DIV cohort_size AS BIGINT)")
            .as("retention_ppm"))
    }),

    "e02_trajectory_topk" -> ((s, d) => {
      val hour = (expr("ts div 3600000000000") % 24).cast("int")
      val profiles = Tables.events(s, d)
        .withColumn("hr", hour)
        .groupBy(col("user_id"))
        .agg(array((0 until 24).map(h =>
          sum(when(col("hr") === h, 1L).otherwise(0L)).cast("double")): _*)
          .as("profile"))
      Similarity.bruteForceTopK(profiles,
        profiles.filter(col("user_id") < 5), "user_id", "profile", 3)
    }),

    // similarity: brute-force exact top-3 cosine neighbors of 5 queries
    "s01_ann_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3)
    }),

    // similarity: sign-LSH bucketed top-3 (the IVF-style scale path)
    "s02_ann_bucketed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bucketedTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, 4)
    }),

    // similarity: multi-probe bucketed top-3 (flip-one-bit probes,
    // the IVF nprobe>1 analogue — higher recall, still sublinear)
    "s03_ann_multiprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bucketedTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, 4, multiProbe = true)
    }),

    // similarity: IVF ANN (k-means coarse quantizer, 8 cells, 3 probes).
    // The trained centroids are materialized to a parquet side table so
    // the DuckDB oracle replays the exact same quantizer — whatever
    // floats k-means produced, both engines rank against them.
    // Training is cached per (dataset, session): the IVF usage pattern
    // is train-once-query-many, so repeated invocations (the bench's
    // timed runs, a resident cluster's query stream) measure the probe
    // path, not a quantizer rebuild. k-means is seed-fixed, so the
    // cached centroids are exactly what a rebuild would produce.
    "s04_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopKWith(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, centroidsFor(s, d, emb), 3)
    }),

    // similarity: IVF-PQ — coarse cells bound the scan to
    // ~nprobe/nlist of the corpus AND each candidate is scored from
    // its PQ codes: the composed billion-vector serving layout
    "s06_ann_ivfpq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3,
        centroidsFor(s, d, emb), codebooksFor(s, d, emb), 4, 16, 3)
    }),

    // similarity: TWO-STAGE serving — s06's quantized shortlist
    // (ADC top-10, code-only) re-ranked by exact cosine over the raw
    // vectors of ONLY the shortlisted rows (a keyed fetch of
    // |queries|×10 vectors, the single bounded corpus touch).
    // Quantization error can reorder a shortlist; the re-rank restores
    // exact order within it — precision@k approaches brute force at
    // index-scan cost, the refinement every production PQ deployment
    // ships
    "s11_pq_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqRerankTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, 10,
        centroidsFor(s, d, emb), codebooksFor(s, d, emb), 4, 16, 3)
    }),

    // similarity: SCALAR-quantized (SQ8) serving — the third
    // quantization family beside IVF cells and PQ codebooks: every
    // dimension maps linearly onto 0..255 against exact per-dim
    // corpus bounds (one min/max reduction, no codebook training),
    // 4× embedding compression; queries stay raw, the corpus is
    // scored from its DEQUANTIZED codes — so the gate hash-matches
    // only if encode and reconstruction replay exactly on both
    // engines
    "s12_sq8_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (mins, maxs) = Similarity.trainSq8Bounds(emb, "embedding", 64)
      Similarity.sq8TopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, mins, maxs)
    }),

    // similarity: IVF-PQ served from a MATERIALIZED index table —
    // the encode pass runs once at build time into a SegmentedTable
    // partitioned by cell; the serving query's corpus side reads ONLY
    // (neighbor_id, cell, codes) from that table (PlanSpec asserts the
    // plan scans embeddings.parquet exactly once, for the 5-row query
    // set). Same math as s06, so the same oracle gates it.
    "s08_ann_ivfpq_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqServe(ivfPqIndexFor(s, d, emb).read(),
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3,
        centroidsFor(s, d, emb), codebooksFor(s, d, emb), 4, 16, 3)
    }),

    // similarity: INCREMENTAL index maintenance — the s08 index built
    // as seed + delta loads (delta encoded with the frozen quantizers,
    // appended as its own segments, never a rebuild); serving the
    // multi-segment index must equal the full-corpus oracle exactly
    "s18_ann_index_append" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqServe(ivfPqIncrementalFor(s, d, emb).read(),
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", 3,
        centroidsFor(s, d, emb), codebooksFor(s, d, emb), 4, 16, 3)
    }),

    // similarity: RESIDUAL IVF-PQ — the production refinement s06's
    // comment names: codebooks quantize v − centroid[cell], so the
    // same code bits describe finer distances. Query residuals are
    // recomputed per probed cell; codebooks are materialized for the
    // oracle like s05's.
    "s07_ann_ivfpq_residual" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqResidualTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3,
        centroidsFor(s, d, emb), residualCodebooksFor(s, d, emb), 4, 16, 3)
    }),

    // similarity: product-quantization ANN — per-subspace codebooks
    // (materialized for the oracle like s04's centroids), shuffle-free
    // encode, and asymmetric-distance top-k over the compressed codes
    "s05_ann_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopKWith(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, codebooksFor(s, d, emb), 4, 16)
    }),

    // dedup: embedding-cosine near-dup pairs, bucket-blocked
    "e01_embed_neardup" -> ((s, d) => {
      Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        0.4, 2)
    }),

    // multimodal: binary payload column stats (the expression-level
    // half of graft.multimodal — byte lengths + content checksums over
    // the binary payload; the batched decode stub is test-covered)
    "m01_binary_features" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"),
          octet_length(col("text")).as("byte_len"),
          conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
            .cast("long").as("checksum"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("byte_len").cast("long")).as("total_bytes"),
          sum(col("checksum")).as("checksum_sum"))
    }),

    // multimodal: the batched mapPartitions decode path itself (stub
    // features are md5-derived, so the oracle reproduces them exactly;
    // the float embedding is gated via an integer fingerprint that
    // recovers the source digest bytes)
    // multimodal: REAL decode boundary — each document becomes a real
    // grayscale PNG (dimensions from n_chars, pixels from the text
    // bytes), and width/height in the result come from javax.imageio
    // actually decoding those bytes. The oracle replays the generation
    // rule; a decoder that misread the header/raster hash-mismatches.
    "m02_media_decode" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val png = Multimodal.withPngPayload(Tables.documents(s, d),
        "doc_id", "text", "n_chars")
      Multimodal.decodeFeatures(png)
        .toDF()
        .select(col("id"), col("width"), col("height"),
          (col("width") * col("height")).as("n_pixels"))
    }),

    // multimodal: REAL JPEG decode — each document becomes a genuine
    // baseline JPEG (ImageIO-encoded; the dominant real-world image
    // codec), and the gated dims come from javax.imageio really
    // running the DCT decode. JPEG is lossy so only GEOMETRY is
    // oracle-replayable (width = 1 + n%56, height = 1 + 11n%56) —
    // matching it proves the SOI sniff + full decode chain held.
    "m09_jpeg_decode" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val jpg = Multimodal.withJpegPayload(Tables.documents(s, d),
        "doc_id", "text", "n_chars")
      Multimodal.decodeFeatures(jpg)
        .toDF()
        .select(col("id"), col("width"), col("height"),
          (col("width") * col("height")).as("n_pixels"))
    }),

    // multimodal: CODEC ROUTING over a mixed corpus — even docs carry
    // genuine PNGs, odd docs genuine JPEGs, one decode pass sniffs
    // and dispatches (PNG magic / SOI). The gated codec comes from
    // header bytes (declarative hex probe, no UDF) and the dims from
    // the decoded rasters — a mis-dispatch would quarantine to stub
    // dims and hash-mismatch the per-parity oracle rules.
    "m10_codec_route" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val docs = Tables.documents(s, d)
      val mixed = Multimodal.withPngPayload(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", "n_chars")
        .unionByName(Multimodal.withJpegPayload(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", "n_chars"))
      val codec = mixed.select(col("id"),
        when(hex(substring(col("payload"), 1, 2)) === "FFD8", "jpeg")
          .when(hex(substring(col("payload"), 1, 4)) === "89504E47", "png")
          .otherwise("other").as("codec"))
      Multimodal.decodeFeatures(mixed).toDF()
        .join(codec, "id")
        .select(col("id"), col("codec"), col("width"), col("height"))
    }),

    // multimodal: PERCEPTUAL HASH — dHash over the really-decoded PNG
    // rasters (9×8 point grid, horizontal gradient signs, two 32-bit
    // halves). PNG is lossless, so the oracle replays the whole
    // decode → sample → hash chain from the synthesis rule: a single
    // wrong pixel anywhere in the codec path flips gradient bits and
    // hash-mismatches.
    "m11_phash" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val png = Multimodal.withPngPayload(Tables.documents(s, d),
        "doc_id", "text", "n_chars")
      Multimodal.perceptualHashes(png).toDF()
        .select(col("id"), col("width"), col("height"),
          col("dh_hi"), col("dh_lo"))
    }),

    // dedup: IMAGE near-duplicate pairs — the m11 fingerprints through
    // the banded-Hamming self-join (4×16-bit bands, hot-bucket
    // guarded, the d02/d04 scaffold). The oracle computes plain
    // all-pairs Hamming ≤ 2 over its replayed hashes, so matching it
    // proves the banding is COMPLETE (pigeonhole) as well as correct.
    "d14_phash_pairs" -> ((s, d) =>
      Dedup.phashPairs(phashTableFor(s, d),
        "id", "dh_hi", "dh_lo", maxHamming = 2)),

    // dedup: IMAGE near-dup CLUSTERS — d14's pair graph through the
    // shared min-label-propagation components (the d05 machinery), so
    // a burst of re-encodes of one image collapses to one
    // representative. The oracle closes the same pair list with a
    // recursive CTE.
    "d15_phash_clusters" -> ((s, d) =>
      Dedup.nearDupClusters(Dedup.phashPairs(phashTableFor(s, d),
        "id", "dh_hi", "dh_lo", maxHamming = 2))),

    // dedup: IMAGE keep-set APPLY — d15's clusters applied as the
    // canonical keep/drop (representatives and untouched images keep,
    // other members drop), recounted per source — the before/after
    // yield report an image-dedup run ends with, the d10 discipline
    // on the image leg. The verdict join is keyed on doc_id against
    // the pair-graph-bounded cluster map.
    "d16_phash_apply" -> ((s, d) => {
      val clusters = Dedup.nearDupClusters(Dedup.phashPairs(
        phashTableFor(s, d), "id", "dh_hi", "dh_lo", maxHamming = 2))
      Tables.documents(s, d).select(col("doc_id"), col("source"))
        .join(clusters, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_imgs"),
          sum(when(col("rep").isNull || col("rep") === col("doc_id"), 1L)
            .otherwise(0L)).as("kept"),
          sum(when(col("rep").isNotNull && col("rep") =!= col("doc_id"), 1L)
            .otherwise(0L)).as("dropped"))
    }),

    // multimodal: perceptual AUDIO fingerprint — the energy-envelope
    // sign hash over really-decoded mono PCM (65 frames, Σs² per
    // frame, 64 gradient-sign bits as two 32-bit halves; the
    // Chromaprint-shaped audio twin of m11's dHash). WAV is lossless,
    // so the oracle replays the whole decode → frame → hash chain
    // from the synthesis rule: a single wrong sample anywhere in the
    // codec path shifts a frame energy and flips hash bits.
    "m12_audio_fp" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val wav = Multimodal.withWavPayload(Tables.documents(s, d),
        "doc_id", "text", "n_chars")
      Multimodal.audioFingerprints(wav).toDF()
        .select(col("id"), col("sample_rate"), col("n_samples"),
          col("af_hi"), col("af_lo"))
    }),

    // multimodal: AUDIO RESAMPLE — 2× integer decimation (output j =
    // input 2j, n_out = ceil(n/2), rate halves), re-encoded as a
    // genuine WAV and then REALLY re-decoded: the gated fields come
    // from decodeAudioFeatures over the resampled container, so
    // decode → decimate → encode → decode must all hold (the m06
    // resize discipline on the audio leg). The oracle replays the
    // decimation from the synthesis rule — every kept sample's value
    // and position is exact.
    "m13_audio_resample" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val wav = Multimodal.withWavPayload(Tables.documents(s, d),
        "doc_id", "text", "n_chars")
      val res = Multimodal.resampleAudio(wav, 2).toDF()
        .select(col("id"), col("payload"))
      Multimodal.decodeAudioFeatures(res).toDF()
        .select(col("id"), col("sample_rate"), col("n_samples"),
          col("amp_sum"))
    }),

    // multimodal: MP4 / ISO-BMFF container metadata — each doc becomes
    // a REAL minimal MP4 (ftyp + moov(mvhd, trak(tkhd)) + mdat,
    // big-endian version-0 boxes per ISO 14496-12) and the operator
    // re-reads it with a genuine recursive box walk: timescale and
    // duration out of mvhd, 16.16 presentation geometry out of tkhd,
    // top-level box count, mdat payload size. The oracle replays the
    // generation rule, so the match proves the encode → sniff →
    // box-walk chain end to end (the m09 discipline). Frame DATA
    // stays a stub — the JVM has no H.264 codec (multimodal
    // contract); the container layer is the real part.
    "m14_mp4_meta" -> ((s, d) => {
      import graft.multimodal.Multimodal
      Multimodal.mp4Metadata(
        Multimodal.withMp4Payload(Tables.documents(s, d),
          "doc_id", "text", "n_chars")).toDF()
    }),

    // dedup: AUDIO near-duplicate pairs — the m12 fingerprints through
    // the SAME guarded banded-Hamming self-join the image leg rides
    // (phashPairs is generic over the two 32-bit halves): 4×16-bit
    // bands, pigeonhole-complete for ≤3 bits, hot-bucket guarded —
    // a silence-heavy corpus (every quiet clip hashing near 0) cannot
    // create a quadratic straggler. The oracle computes plain
    // all-pairs Hamming ≤ 2 over its replayed hashes, so the match
    // proves banding completeness on the audio leg too.
    "d17_audio_fp_pairs" -> ((s, d) =>
      Dedup.phashPairs(audioFpTableFor(s, d),
        "id", "af_hi", "af_lo", maxHamming = 2)),

    // dedup: AUDIO near-dup CLUSTERS — d17's pair graph through the
    // shared min-label components (the d05/d15 machinery on its third
    // modality): a burst of re-uploads of one clip collapses to one
    // representative. The oracle closes the same pair list with a
    // recursive CTE over the planted corpus.
    "d20_audio_fp_clusters" -> ((s, d) =>
      Dedup.nearDupClusters(Dedup.phashPairs(audioFpTableFor(s, d),
        "id", "af_hi", "af_lo", maxHamming = 2))),

    // dedup: CROSS-MODALITY duplicate verdict — a pair is flagged
    // when it is near-dup in >= 2 of {exact text, image dHash bands,
    // audio envelope bands} over the planted correlated corpus
    // (plantCrossModalDups): independent agreement between two
    // modality spaces is the "same asset re-uploaded" signal a
    // single-leg collision can't give. Each leg is its own bounded
    // candidate generator (fingerprint join / banded Hamming); the
    // verdict stage unions only the narrow pair lists. The media
    // fingerprint tables follow the d14/d17 fingerprint-once
    // discipline (xmodalHashesFor) — the PNG+WAV encode/decode is
    // the dominant cost and a pipeline pays it once, not per verdict
    // pass; the text leg's fingerprint join is cheap and stays
    // inline.
    "d21_crossmodal_dupes" -> ((s, d) => {
      val (img, aud) = xmodalHashesFor(s, d)
      Dedup.crossModalDupes(
        Dedup.exactPairs(plantCrossModalDups(Tables.documents(s, d)),
          "doc_id", "text"),
        Dedup.phashPairs(img, "id", "dh_hi", "dh_lo", maxHamming = 2),
        Dedup.phashPairs(aud, "id", "af_hi", "af_lo", maxHamming = 2))
    }),

    // dedup: the d03 pre-flight — per (source, lang) block its size,
    // corpus share, the sub-block fan-out the id-hash salt would
    // apply at the default 4096 side, and the implied quadratic pair
    // work. Exposed as the graft_block_stats TVF; this is the
    // histogram an operator reads BEFORE launching a blocked verify
    // on a new corpus.
    "d22_block_stats" -> ((s, d) =>
      Dedup.blockStats(Tables.documents(s, d), Seq("source", "lang"))),

    // multimodal: REAL multi-frame (video-style) decode — each document
    // becomes a real animated GIF (2 + n%5 frames of (1+n%48)×(1+7n%48));
    // sampleFrames seeks 4 evenly-spaced frames and DECODES them via
    // ImageIO, so the gated dims come from the decoded rasters (the
    // oracle replays the generation rule). The pixel-hash fingerprint
    // is encoder-dependent and gated in StreamingMultimodalSpec instead.
    "m04_gif_frames" -> ((s, d) => {
      import graft.multimodal.Multimodal
      // spread BEFORE the synth: 4 real GIF frame decodes per doc are
      // the heaviest codec stage on the board, and the single-file
      // source serializes them otherwise (the light codec gates
      // m02/m05/m06/m08 measured WORSE with a spread — the shuffle
      // outweighs their sub-second decode — so the spread stays
      // gate-local, the d04 pattern). NOTE on absolute time: frame
      // dims are (1+n%48)x(1+7n%48) of the per-round testdata's
      // n_chars draw, so the gate's cost moves with each testdata
      // generation — r12 read 3.37 s where r11 read 0.50 s with BOTH
      // sides moving together (ratio 1.84x); the r13 regeneration
      // reads 0.83 s at ratio 1.03x (BENCH_NOTES r13)
      val gif = Multimodal.withGifPayload(spreadCpu(Tables.documents(s, d)),
        "doc_id", "text", "n_chars")
      Multimodal.sampleFrames(gif, 4).toDF()
        .select(col("id"), col("frame_idx"), col("frame_w"), col("frame_h"))
    }),

    // similarity: kNN LABEL PURITY — neighborhood label-agreement over
    // the labeled embedding corpus (the label-noise pruning signal;
    // Confident-Learning-shaped). Sign-LSH bucketed self-join (e01's
    // skew-salted shape, never all-pairs), up to 3 in-bucket neighbors
    // vote; flagged = strict minority among the ACTUAL neighbors (a
    // sparse bucket with unanimous agreement is clean, not noise);
    // loners (no in-bucket neighbors) report separately — no evidence
    // is not disagreement. Integer outputs only.
    "s09_knn_label_purity" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.knnLabelConsistency(emb, "vec_id", "embedding", "label",
          k = 3, bits = 2)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("n_neighbors") > 0 &&
            col("agree") * 2 < col("n_neighbors"), 1L).otherwise(0L))
            .as("flagged"),
          sum(when(col("n_neighbors") === 0, 1L).otherwise(0L)).as("loners"),
          sum(col("agree")).as("sum_agree"))
    }),

    // similarity: PQ QUANTIZER-QUALITY audit — per-subspace
    // reconstruction distortion + codebook utilization over the s05
    // codebooks (the fine-quantizer leg of the audit family: s10 =
    // serving recall, s14 = coarse balance). Dead codes mean wasted
    // index bits; see Similarity.pqDistortionAudit.
    "s16_pq_distortion" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqDistortionAudit(emb, "embedding",
        codebooksFor(s, d, emb), 4, 16)
    }),

    // similarity: ANN index-quality audit — recall@3 of the bucketed
    // sign-LSH index (s02's plan) against the exhaustive ground truth
    // (s01's plan), per query, as exact integer ppm. The audit loop a
    // deployment runs after every index build: both inputs are top-k
    // result sets (|queries|×k rows), so the overlap join costs
    // nothing beyond the two searches themselves — and the truth side
    // is only ever run over the SAMPLED query set, never all vectors.
    "s10_ann_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 5)
      val truth = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 3)
      val approx = Similarity.bucketedTopK(emb, q, "vec_id", "embedding", 3, 4)
      Similarity.recallAtK(truth, approx, 3)
    }),

    // multimodal: REAL image resize — each document's synthesized PNG
    // is decoded, aspect-preserving-downscaled into a 32-box (integer
    // floor rule; in-box images pass through), RE-ENCODED as PNG, and
    // the gated dims come from javax.imageio decoding the RESIZED
    // payload — so decode → scale → encode → decode must all hold for
    // the hash to match the oracle's integer replay of the rule.
    "m07_image_resize" -> ((s, d) => {
      import graft.multimodal.Multimodal
      // measured: a spread here is inside run-to-run noise (1.3–1.9 s
      // either way) — the resize chain's cost is not decode-dominated
      // enough; only m04 keeps one (see its note)
      val png = Multimodal.withPngPayload(Tables.documents(s, d),
        "doc_id", "text", "n_chars")
      val resized = Multimodal.resizeImages(png, maxEdge = 32).toDF()
      Multimodal.decodeFeatures(resized).toDF()
        .select(col("id"), col("width"), col("height"),
          (col("width") * col("height")).as("n_pixels"))
    }),

    // multimodal: REAL audio decode — each document becomes a genuine
    // RIFF/WAVE container (8-bit unsigned mono PCM; rate and sample
    // count from replayable rules, samples cyclically from the text
    // bytes), and the gated columns come from javax.sound actually
    // parsing the header (sample_rate, n_samples) and reading the
    // decoded PCM stream end to end (amp_sum) — a decoder that
    // misread the chunk layout or sample width hash-mismatches
    "m05_audio_decode" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val wav = Multimodal.withWavPayload(Tables.documents(s, d),
        "doc_id", "text", "n_chars")
      Multimodal.decodeAudioFeatures(wav).toDF()
        .select(col("id"), col("sample_rate"), col("n_samples"),
          col("amp_sum"))
    }),

    // multimodal: audio QUALITY stats — the loudness/clipping/
    // roughness screen over the decoded PCM stream (sum of squared
    // samples = the exact RMS numerator, peak amplitude, total
    // variation Σ|s_i−s_{i−1}|), folded in one pass through the same
    // javax.sound decode walk as m05 — an energy/TV mistake in the
    // stream walk (buffer-boundary sample dropped, unsigned byte
    // misread) hash-mismatches while the m05 header fields stay green
    "m08_audio_stats" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val wav = Multimodal.withWavPayload(Tables.documents(s, d),
        "doc_id", "text", "n_chars")
      Multimodal.decodeAudioStats(wav).toDF()
        .select(col("id"), col("sample_rate"), col("n_samples"),
          col("sq_sum"), col("peak"), col("tv"))
    }),

    // multimodal: REAL stereo decode — 16-bit signed little-endian
    // 2-channel PCM (the profile the mono path quarantines), with
    // per-channel amplitude sums: the decoder must deinterleave
    // 4-byte frames and assemble signed LE samples, so a byte-order
    // or channel-offset mistake corrupts amp_l/amp_r while leaving
    // the header fields intact — the oracle replays the generation
    // rule (left_i = 3·b_i + 7, right_i = 1000 − 2·b_i)
    "m06_wav_stereo" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val wav = Multimodal.withStereoWavPayload(Tables.documents(s, d),
        "doc_id", "text", "n_chars")
      Multimodal.decodeStereoFeatures(wav).toDF()
        .select(col("id"), col("sample_rate"), col("n_frames"),
          col("amp_l"), col("amp_r"))
    })
  )

  /** Root for gate-fixture index TABLES (bm25/bigram/ivfpq):
    * `/tmp/graft_run/<pid>/graft_fixtures/<dataset>/<name>`, deleted
    * and rebuilt on first use per (dataset, session). These tables
    * are read only by Spark inside the same session (never by the
    * DuckDB oracle, which replays them logically), so they live under
    * [[graft.util.RunRoot]]: pid-private (two concurrent runs on the
    * same dataset cannot delete each other's staging mid-query — r13
    * ADVICE) yet self-cleaning (dead pids' roots are swept on the
    * next run, so repeated harness runs cannot accumulate orphans —
    * the r12 ADVICE that originally moved these off pid paths).
    * The quantizer side FILES above stay pid-qualified at top level
    * on purpose: the oracle reads them AFTER this JVM exits, so they
    * must survive the RunRoot sweep's liveness test until the driver
    * finishes, and the pid guards replay staleness.
    */
  private def fixtureTableRoot(d: String, name: String): String = {
    val root = graft.util.RunRoot.under(s"graft_fixtures/${d.replace('/', '_')}/$name")
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
      finally walk.close()
    }
    root
  }

  /** Per-run materialization path for the IVF quantizer (s04): written
    * by the Spark query, read back by the DuckDB oracle. The path is
    * pid-qualified so (a) concurrent bench/correctness runs cannot race
    * on the same file and (b) a stale centroid table from a previous
    * run can never be silently reused — if the Spark query did not run
    * in this process, the oracle fails loudly with "no files found".
    * Query and oracle agree because both strings come from this val,
    * initialized once per JVM. The oracle globs part files because
    * Spark writes a directory, not a single parquet file.
    */
  val IvfCentroidsPath =
    s"/tmp/graft_ivf_centroids_${ProcessHandle.current().pid()}"

  /** Per-(dataset, session) quantizer cache for s04 — see its note. */
  private val ivfCentroids =
    new graft.util.BuildOnce[Seq[(Int, Array[Float])]]

  /** s05's codebook side table — same pid-qualified contract as
    * [[IvfCentroidsPath]].
    */
  val PqCodebookPath =
    s"/tmp/graft_pq_codebooks_${ProcessHandle.current().pid()}"

  private val pqCodebooks =
    new graft.util.BuildOnce[Seq[(Int, Int, Array[Float])]]

  /** s07's residual codebook side table — same pid-qualified contract. */
  val ResidualCodebookPath =
    s"/tmp/graft_rpq_codebooks_${ProcessHandle.current().pid()}"

  private val residualCodebooks =
    new graft.util.BuildOnce[Seq[(Int, Int, Array[Float])]]

  /** Train-once-per-(dataset, session) residual-PQ codebooks,
    * materialized for the s07 oracle.
    */
  private def residualCodebooksFor(s: SparkSession, d: String,
      emb: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Array[Float])] =
    residualCodebooks.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      val c = Similarity.trainResidualCodebooks(emb, "vec_id", "embedding",
        centroidsFor(s, d, emb), 4, 16, 8)
      import s.implicits._
      c.toDF("sub", "code", "centroid").coalesce(1).write.mode("overwrite")
        .parquet(ResidualCodebookPath)
      c
    })

  /** Train-once-per-(dataset, session) IVF centroids, materialized for
    * the oracle (shared by s04 and s06).
    */
  private def centroidsFor(s: SparkSession, d: String,
      emb: org.apache.spark.sql.DataFrame): Seq[(Int, Array[Float])] =
    ivfCentroids.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      val c = Similarity.trainCentroids(emb, "vec_id", "embedding", 8)
      import s.implicits._
      c.toDF("cell", "centroid").coalesce(1).write.mode("overwrite")
        .parquet(IvfCentroidsPath)
      c
    })

  /** Train-once-per-(dataset, session) PQ codebooks, materialized for
    * the oracle (shared by s05 and s06).
    */
  private def codebooksFor(s: SparkSession, d: String,
      emb: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Array[Float])] =
    pqCodebooks.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      val c = Similarity.trainCodebooks(emb, "embedding", 4, 16, 8)
      import s.implicits._
      c.toDF("sub", "code", "centroid").coalesce(1).write.mode("overwrite")
        .parquet(PqCodebookPath)
      c
    })

  /** Build-once-per-(dataset, session) materialized IVF-PQ index: the
    * encode pass lands in a SegmentedTable PARTITIONED BY CELL (rows
    * of one coarse cell co-locate in one file, so a probe of nprobe
    * cells reads nprobe file groups, not the whole index). Stable
    * [[fixtureTableRoot]] path, reset and rebuilt per (dataset,
    * session): an index from a previous process (whose k-means fit
    * this run did not produce) can never be silently reused, and
    * repeated harness runs never accumulate orphan roots.
    */
  private val ivfPqIndexes =
    new graft.util.BuildOnce[graft.table.SegmentedTable]

  private def ivfPqIndexFor(s: SparkSession, d: String,
      emb: org.apache.spark.sql.DataFrame): graft.table.SegmentedTable =
    ivfPqIndexes.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      val rows = Similarity.ivfPqIndexRows(emb, "vec_id", "embedding",
        centroidsFor(s, d, emb), codebooksFor(s, d, emb), 4, 16)
      val root = fixtureTableRoot(d, "ivfpq_index")
      val t = graft.table.SegmentedTable.create(s, root, rows.schema,
        Map("partition_columns" -> "cell", "sort_columns" -> "neighbor_id"))
      t.load(rows)
      t
    })

  /** s18's INCREMENTALLY-built twin of [[ivfPqIndexFor]]: the index
    * lands in two loads — a seed corpus, then a delta encoded with
    * the SAME frozen quantizers and appended as its own segment(s).
    * This is the maintenance path a 100 TB deployment lives on: a
    * delivery costs one O(batch) encode + one catalog commit, never a
    * rebuild, and the quantizers are plan literals so the delta's
    * codes are bit-compatible with the seed's. Serving over the
    * multi-segment index must equal serving over a single-load index
    * of the full corpus — the s08 oracle, shared.
    */
  private val ivfPqIncr = new graft.util.BuildOnce[graft.table.SegmentedTable]

  private def ivfPqIncrementalFor(s: SparkSession, d: String,
      emb: org.apache.spark.sql.DataFrame): graft.table.SegmentedTable =
    ivfPqIncr.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      val cents = centroidsFor(s, d, emb)
      val cbs = codebooksFor(s, d, emb)
      val root = fixtureTableRoot(d, "ivfpq_incr")
      val seedRows = Similarity.ivfPqIndexRows(
        emb.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding",
        cents, cbs, 4, 16)
      val t = graft.table.SegmentedTable.create(s, root, seedRows.schema,
        Map("partition_columns" -> "cell", "sort_columns" -> "neighbor_id"))
      t.load(seedRows)
      t.load(Similarity.ivfPqIndexRows(
        emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
        cents, cbs, 4, 16))
      t
    })

  /** t21's query terms — fixed literals so the oracle replays them. */
  private val Bm25QueryTerms = Seq("spark", "join", "stream")

  /** t23's phrase — two adjacent tokens, fixed for the oracle. */
  private val PhraseQuery = "data line"

  /** t24's phrase — three tokens (present at every test SF), fixed so
    * the oracle replays it.
    */
  private val PhraseQuery3 = "stream table hash"

  /** Build-once bigram index for t23: postings of adjacent-token
    * pairs. Same layout discipline as the unigram index (partitioned
    * + sorted by bigram, pid-qualified path).
    */
  private val bigramIndexes = new graft.util.BuildOnce[graft.table.SegmentedTable]

  private def bigramIndexFor(s: SparkSession, d: String): graft.table.SegmentedTable =
    bigramIndexes.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__w"))
      val rows = toks
        .filter(size(col("__w")) >= 2) // sequence(0, -1) would DESCEND
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(__w) - 2), i -> concat(__w[i], ' ', __w[i+1]))"))
          .as("bigram"))
        .groupBy(col("bigram"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      val root = fixtureTableRoot(d, "bigram_index")
      val t = graft.table.SegmentedTable.create(s, root, rows.schema,
        Map("partition_columns" -> "bigram",
          "sort_columns" -> "bigram,doc_id"))
      t.load(rows)
      t
    })

  /** Build-once-per-(dataset, session) inverted index for t21: one
    * posting row per (token, doc_id) carrying tf, the doc's length,
    * the token's df, and the folded corpus totals (n_docs, sum_dl) —
    * every column integral, so serving recomputes float scores from
    * identical integers wherever the postings were partitioned. The
    * table is laid out BY TOKEN (partition_columns co-locates a
    * token's postings in one file, sort_columns tightens row-group
    * min/max), so a query's pushed token-IN predicate skips
    * everything else. pid-qualified path — same staleness contract
    * as the ANN quantizer side tables.
    */
  private val bm25Indexes = new graft.util.BuildOnce[graft.table.SegmentedTable]

  private[graft] def bm25IndexFor(s: SparkSession, d: String): graft.table.SegmentedTable =
    bm25Indexes.getOrElseUpdate(s"$d|${s.sparkContext.applicationId}", {
      val withDl = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__w"))
        .select(col("doc_id"), col("__w"),
          size(col("__w")).cast("long").as("dl"))
      val stats = withDl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl"))
      val terms = withDl
        .select(col("doc_id"), col("dl"), explode(col("__w")).as("token"))
      val tf = terms.groupBy(col("token"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
      val df_ = terms.select(col("token"), col("doc_id")).distinct()
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      val rows = tf.join(df_, "token").crossJoin(broadcast(stats))
        .select(col("token"), col("doc_id"), col("tf"), col("dl"),
          col("df"), col("n_docs"), col("sum_dl"))
      val root = fixtureTableRoot(d, "bm25_index")
      val t = graft.table.SegmentedTable.create(s, root, rows.schema,
        Map("partition_columns" -> "token",
          "sort_columns" -> "token,doc_id"))
      t.load(rows)
      t
    })

  /** DuckDB twin of Similarity.d2 (aa - 2ab + bb, each term a
    * sequential double fold — the exact expression shape matters for
    * bit-identical ties).
    */
  private def d2Sql(x: String, c: String): String = {
    def dotS(u: String, v: String) =
      s"list_aggregate(list_transform(range(1, len($c) + 1), i -> CAST(($u)[i] AS DOUBLE) * CAST(($v)[i] AS DOUBLE)), 'sum')"
    s"(${dotS(x, x)} - 2 * ${dotS(x, c)} + ${dotS(c, c)})"
  }

  /** The ONE d02 banding fragment every LSH-derived oracle builds on
    * (d02, d05/d10 via [[clusterCtes]], d11, d13): shingles, band
    * signatures (optionally with extra per-doc columns carried on the
    * sig CTE), and the distinct candidate-pair join. A change to the
    * banding scheme (k, rowsPerBand, hash) lands in exactly one
    * place, so candidate-pair sets can never silently diverge
    * between gates.
    */
  private def bandPairCtes(extraSig: String = "",
                           recursive: Boolean = false): String =
    s"""WITH ${if (recursive) "RECURSIVE " else ""}t AS (
          SELECT doc_id, $W AS words FROM documents),
        sh AS (SELECT doc_id, $SH AS s FROM t),
        sig AS (SELECT doc_id, $extraSig
          ${(0 until 4).map(b => s"${band(b, 4)} AS band$b").mkString(", ")}
        FROM sh WHERE len(s) > 0),
        pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        AND (a.band0 = b.band0 OR a.band1 = b.band1
          OR a.band2 = b.band2 OR a.band3 = b.band3))"""

  /** [[bandPairCtes]] extended with the connected-components closure
    * (shared by the d05 cluster oracle and the d10 apply oracle).
    */
  private lazy val clusterCtes =
    s"""${bandPairCtes(recursive = true)},
        edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)"""

  private val dotSql =
    "list_aggregate(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), 'sum')"
  private val normQ =
    "sqrt(list_aggregate(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), 'sum'))"
  private val normC =
    "sqrt(list_aggregate(list_transform(range(1, len(cv) + 1), i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), 'sum'))"

  private def bucketSql(v: String, bits: Int): String =
    (0 until bits).map(j =>
      s"(CASE WHEN $v[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")

  private def simhashBitSql(j: Int): String =
    s"(CASE WHEN list_aggregate(list_transform(words, w -> CASE WHEN ((CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) >> $j) & 1) = 1 THEN 1 ELSE -1 END), 'sum') > 0 THEN ${1L << j} ELSE 0 END)"

  /** The IVF-PQ from-first-principles oracle (s04 cell CTEs + s05
    * encode/ADC CTEs): a corpus row is scored only when its cell is
    * among the query's nprobe nearest. Shared verbatim by s06 (inline
    * encode) and s08 (materialized index) — the index table holds
    * exactly the encode pass's rows, so both plans compute this.
    */
  private lazy val ivfPqOracle: String =
    ivfPqRankedCtes +
      "\n        SELECT query_id, rank, neighbor_id FROM rankedq WHERE rank <= 3"

  /** The shared candidate-generation CTEs (through `rankedq`, the
    * ADC-ranked candidates) — the common prefix of the s06/s08 serve
    * oracle and the s11 two-stage re-rank oracle.
    */
  private lazy val ivfPqRankedCtes: String =
    s"""WITH cent AS (SELECT cell, centroid AS cv
          FROM read_parquet('$IvfCentroidsPath/*.parquet')),
        cb AS (SELECT sub, code, centroid
          FROM read_parquet('$PqCodebookPath/*.parquet')),
        v AS (SELECT vec_id, embedding AS qv FROM embeddings),
        scoredc AS (SELECT vec_id, cell, $dotSql / ($normQ * $normC) AS cdot
          FROM v CROSS JOIN cent),
        rankedc AS (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY cdot DESC, cell ASC) AS crank
          FROM scoredc),
        corpus_cell AS (SELECT vec_id, cell FROM rankedc WHERE crank = 1),
        query_cells AS (SELECT vec_id, cell FROM rankedc
          WHERE crank <= 3 AND vec_id < 5),
        sv AS (SELECT vec_id, s2.sub,
            list_slice(embedding, s2.sub * 16 + 1, s2.sub * 16 + 16) AS x
          FROM embeddings CROSS JOIN (SELECT DISTINCT sub FROM cb) s2),
        encd AS (SELECT sv.vec_id, sv.sub, cb.code,
            ${d2Sql("sv.x", "cb.centroid")} AS dd
          FROM sv JOIN cb ON cb.sub = sv.sub),
        codes AS (SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code,
              ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                ORDER BY dd ASC, code ASC) AS rn
            FROM encd) t WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 5),
        cand AS (SELECT qc.vec_id AS query_id, cc.vec_id AS neighbor_id
          FROM query_cells qc JOIN corpus_cell cc USING (cell)
          WHERE cc.vec_id <> qc.vec_id),
        psub AS (SELECT cand.query_id, cand.neighbor_id, c.sub,
            ${d2Sql("list_slice(q.qe, c.sub * 16 + 1, c.sub * 16 + 16)", "cb.centroid")} AS dd
          FROM cand JOIN q ON q.query_id = cand.query_id
          JOIN codes c ON c.vec_id = cand.neighbor_id
          JOIN cb ON cb.sub = c.sub AND cb.code = c.code),
        adc AS (SELECT query_id, neighbor_id,
            list_aggregate(list(dd ORDER BY sub), 'sum') AS adc
          FROM psub GROUP BY 1, 2),
        rankedq AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc ASC, neighbor_id ASC) AS rank
          FROM adc)"""

  /** s11: the same candidate CTEs, shortlist widened to ADC top-10,
    * then re-ranked by EXACT cosine over the shortlisted raw vectors
    * — the two-stage serving oracle.
    */
  private lazy val ivfPqRerankOracle: String =
    s"""$ivfPqRankedCtes,
        shortlist AS (SELECT query_id, neighbor_id
          FROM rankedq WHERE rank <= 10),
        ex AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM (SELECT s.query_id, s.neighbor_id, q.qe AS qv,
              e.embedding AS cv
            FROM shortlist s JOIN q ON q.query_id = s.query_id
            JOIN embeddings e ON e.vec_id = s.neighbor_id)),
        rr AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM ex)
        SELECT query_id, rank, neighbor_id FROM rr WHERE rank <= 3"""

  val oracles: Map[String, String] = Map(
    "t01_token_count" ->
      s"""SELECT doc_id, len($W) AS n_tokens, n_chars FROM documents""",

    "t02_quality" ->
      s"""SELECT doc_id,
          ROUND(LEAST(CAST(len($W) AS DOUBLE), 200.0) * 0.005 +
            CAST(len(list_filter($W, w -> w IN $enMarkers)) AS DOUBLE)
              / CAST(len($W) AS DOUBLE), 6) AS quality
          FROM documents""",

    // cf/df replayed from the unnested token stream; ties broken by
    // (ratio desc, token asc) on both engines
    "t39_burstiness" ->
      s"""WITH ex AS (SELECT doc_id, unnest($W) AS w FROM documents),
          st AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cf,
            CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM ex GROUP BY w)
          SELECT w, cf, df,
            CAST(cf * 1000000 // df AS BIGINT) AS burstiness_ppm
          FROM st
          ORDER BY burstiness_ppm DESC, w ASC LIMIT 20""",

    // the t03 argmax replayed with the labeled column carried through,
    // folded into the (true, predicted) matrix with exact ppm shares
    "t38_langid_confusion" ->
      s"""WITH t AS (SELECT lang, $W AS words FROM documents),
          c AS (SELECT lang,
            $langScoresSql
          FROM t),
          p AS (SELECT lang, $langIdCaseSql AS pred_lang
          FROM c),
          m AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM p GROUP BY 1, 2),
          tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tot
            FROM m GROUP BY 1)
          SELECT m.lang, m.pred_lang, m.n,
            CAST(m.n * 1000000 // tot.tot AS BIGINT) AS share_ppm
          FROM m JOIN tot ON m.lang = tot.lang""",

    "t03_langid" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          c AS (SELECT doc_id,
            $langScoresSql
          FROM t)
          SELECT doc_id, $langIdCaseSql AS pred_lang
          FROM c""",

    "t04_text_stats" ->
      s"""SELECT source, CAST(SUM(CAST(len($W) AS BIGINT)) AS BIGINT) AS total_tokens,
          MAX(n_chars) AS max_chars, COUNT(*) AS doc_cnt
          FROM documents GROUP BY source""",

    "t05_bpe_tokens" ->
      """SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens
         FROM documents""",

    // fertility replayed from the t05 regex and the whitespace token
    // count; ratios exact integer ppm
    "t37_token_fertility" ->
      s"""WITH t AS (SELECT source, n_chars,
            CAST(len(regexp_extract_all(lower(text),
              '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe,
            CAST(len($W) AS BIGINT) AS words
          FROM documents),
          agg AS (SELECT source,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars,
            CAST(SUM(bpe) AS BIGINT) AS total_bpe_tokens,
            CAST(SUM(words) AS BIGINT) AS total_words
          FROM t GROUP BY source)
          SELECT source, total_chars, total_bpe_tokens, total_words,
            CAST(total_chars * 1000000 // total_bpe_tokens AS BIGINT)
              AS chars_per_token_ppm,
            CAST(total_bpe_tokens * 1000000 // total_words AS BIGINT)
              AS fertility_ppm
          FROM agg""",

    "t06_rolling_fp" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          h AS (SELECT doc_id,
            list_transform(words, w ->
              CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 1000000007) AS hs
          FROM t)
          SELECT doc_id,
            COALESCE(list_reduce(hs, (a, b) -> (a * 31 + b) % 1000000007), 0) AS content_fp
          FROM h""",

    "t07_tfidf" ->
      s"""WITH terms AS (
           SELECT doc_id, unnest($W) AS token FROM documents),
         tf AS (SELECT doc_id, token, COUNT(*) AS tf
           FROM terms GROUP BY doc_id, token),
         df AS (SELECT token, COUNT(*) AS df FROM
           (SELECT DISTINCT doc_id, token FROM terms) GROUP BY token),
         n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * LN(n.n / df.df), 6) AS tfidf
           FROM tf JOIN df USING (token) CROSS JOIN n),
         ranked AS (
           SELECT doc_id, token, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, token ASC) AS rn
           FROM scored)
         SELECT doc_id, token AS top_term, tfidf FROM ranked WHERE rn = 1""",

    // recompute adjacent-token pairs and the phrase's per-doc tf;
    // integer counts, deterministic top-10 by (tf, doc_id)
    "t23_phrase_index_serve" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          bg AS (SELECT doc_id, unnest(list_transform(range(1, len(words)),
              i -> words[i] || ' ' || words[i+1])) AS bigram
            FROM t WHERE len(words) >= 2)
          SELECT doc_id, COUNT(*) AS tf FROM bg
          WHERE bigram = 'data line'
          GROUP BY doc_id
          ORDER BY tf DESC, doc_id ASC LIMIT 10""",

    // the bigram-candidate pruning is invisible to the answer: the
    // exact trigram tf per doc, recomputed naively over the corpus
    "t24_phrase_ngram_serve" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          tg AS (SELECT doc_id, unnest(list_transform(range(1, len(words) - 1),
              i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS ngram
            FROM t WHERE len(words) >= 3)
          SELECT doc_id, COUNT(*) AS tf FROM tg
          WHERE ngram = 'stream table hash'
          GROUP BY doc_id
          ORDER BY tf DESC, doc_id ASC LIMIT 10""",

    // same rule family recomputed naively: per-doc unigram/bigram
    // stats in integer ppm, thresholds applied in one outer select
    "t25_gopher_rules" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          tok AS (SELECT doc_id, unnest(words) AS token FROM t),
          c AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
          uni AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                  CAST(SUM(cnt * length(token)) AS BIGINT) AS chars,
                  CAST(MAX(cnt) AS BIGINT) AS top1 FROM c GROUP BY doc_id),
          bg AS (SELECT doc_id, unnest(list_transform(range(1, len(words)),
                  i -> words[i] || ' ' || words[i + 1])) AS bigram
                 FROM t WHERE len(words) >= 2),
          bc AS (SELECT doc_id, bigram, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
          big AS (SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS top2,
                  CAST(SUM(cnt) AS BIGINT) AS nbig FROM bc GROUP BY doc_id),
          m AS (SELECT u.doc_id, n_tokens,
            CAST(FLOOR(CAST(1000000.0 AS DOUBLE) * CAST(chars AS DOUBLE) /
              CAST(n_tokens AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mean_len_ppm,
            CAST(FLOOR(CAST(1000000.0 AS DOUBLE) * CAST(top1 AS DOUBLE) /
              CAST(n_tokens AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS top_tok_ppm,
            COALESCE(CAST(FLOOR(CAST(1000000.0 AS DOUBLE) * CAST(top2 AS DOUBLE) /
              CAST(nbig AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT), 0) AS top_bigram_ppm
            FROM uni u LEFT JOIN big b ON u.doc_id = b.doc_id)
          SELECT doc_id, n_tokens, mean_len_ppm, top_tok_ppm, top_bigram_ppm,
            CASE WHEN n_tokens >= 30 AND n_tokens <= 100000
              AND mean_len_ppm >= 3000000 AND mean_len_ppm <= 10000000
              AND top_tok_ppm <= 120000 AND top_bigram_ppm <= 60000
              THEN 1 ELSE 0 END AS keep
          FROM m""",

    // the candidate sketch is invisible to the answer: every token
    // with cnt*30 >= total, exactly
    "t22_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest($W) AS token FROM (SELECT text FROM documents) x),
          c AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY 1),
          tot AS (SELECT COUNT(*) AS total FROM t)
          SELECT token, cnt FROM c CROSS JOIN tot
          WHERE cnt * 30 >= total""",

    // recompute the index's integers (tf/dl/df/n/sum_dl) from the
    // corpus, then the identical scoring expression — FLOOR to integer
    // ppm BEFORE the per-doc sum, so summation order cannot matter
    "t21_bm25_index_serve" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          d AS (SELECT doc_id, words, CAST(len(words) AS BIGINT) AS dl FROM t),
          stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d),
          terms AS (SELECT doc_id, dl, unnest(words) AS token FROM d),
          tf AS (SELECT doc_id, token, dl, COUNT(*) AS tf
                 FROM terms GROUP BY 1, 2, 3),
          df AS (SELECT token, COUNT(DISTINCT doc_id) AS df
                 FROM terms GROUP BY 1),
          scored AS (SELECT doc_id,
              CAST(FLOOR(
                ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) *
                (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE) /
                 (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
                  (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                   + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
                     / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS sppm
            FROM tf JOIN df USING (token) CROSS JOIN stats
            WHERE token IN ('spark', 'join', 'stream'))
          SELECT doc_id, CAST(SUM(sppm) AS BIGINT) AS score_ppm,
            COUNT(*) AS n_terms
          FROM scored GROUP BY doc_id
          ORDER BY score_ppm DESC, doc_id ASC LIMIT 10""",

    // expression shapes mirror the Spark side exactly (operator order
    // matters for the last-ulp bit pattern under round(..., 6))
    "t13_bm25" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          d AS (SELECT doc_id, words, CAST(len(words) AS DOUBLE) AS dl FROM t),
          stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              CAST(SUM(len(words)) AS DOUBLE) / COUNT(*) AS avgdl FROM d),
          terms AS (SELECT doc_id, dl, unnest(words) AS token FROM d),
          tf AS (SELECT doc_id, token, dl, CAST(COUNT(*) AS DOUBLE) AS tf
                 FROM terms GROUP BY 1, 2, 3),
          df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
                 FROM terms GROUP BY 1),
          scored AS (SELECT doc_id, token,
              round(ln((n - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) *
                (tf * CAST(2.2 AS DOUBLE) /
                 (tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                   + CAST(0.75 AS DOUBLE) * dl / avgdl))), 6) AS bm25
            FROM tf JOIN df USING (token) CROSS JOIN stats),
          ranked AS (SELECT doc_id, token, bm25,
              ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY bm25 DESC, token ASC) AS rn
            FROM scored)
          SELECT doc_id, token AS top_term, bm25 FROM ranked WHERE rn = 1""",

    "t08_train_split" ->
      """WITH s AS (SELECT doc_id, n_chars,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS h
         FROM documents)
         SELECT CASE WHEN h < 80 THEN 'train'
                     WHEN h < 90 THEN 'val'
                     ELSE 'test' END AS split,
           COUNT(*) AS docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
         FROM s GROUP BY 1""",

    "t09_stopword_prune" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          tok AS (SELECT doc_id, unnest(words) AS token FROM t),
          df AS (SELECT token, COUNT(DISTINCT doc_id) AS df
                 FROM tok GROUP BY token),
          topw AS (SELECT token FROM df ORDER BY df DESC, token ASC LIMIT 20),
          swl AS (SELECT list_sort(list(token)) AS sw FROM topw)
          SELECT doc_id, len(words) AS n_tokens,
            len(list_filter(words, w -> list_contains(sw, w))) AS stop_tokens
          FROM t CROSS JOIN swl""",

    "t11_repetition" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          tok AS (SELECT doc_id, unnest(words) AS token FROM t),
          c AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2)
          SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
            COUNT(*) AS n_distinct,
            CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS dup_ratio,
            CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_frac
          FROM c GROUP BY doc_id""",

    "t12_oov_mask" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents)
          SELECT doc_id,
            array_to_string(list_transform(words,
              w -> CASE WHEN w IN $oovVocabSql THEN w ELSE '<unk>' END), ' ') AS masked_text,
            len(list_filter(words, w -> w NOT IN $oovVocabSql)) AS n_masked
          FROM t""",

    "t15_curation_e2e" ->
      s"""WITH scored AS (SELECT doc_id, lang,
            CAST(len($W) AS BIGINT) AS toks,
            ROUND(LEAST(CAST(len($W) AS DOUBLE), 200.0) * 0.005 +
              CAST(len(list_filter($W, w -> w IN $enMarkers)) AS DOUBLE)
                / CAST(len($W) AS DOUBLE), 6) AS quality,
            md5(lower(trim(text))) AS fp
          FROM documents),
          kept AS (SELECT * FROM scored WHERE quality >= 0.6),
          reps AS (SELECT fp, MIN(doc_id) AS doc_id FROM kept GROUP BY fp),
          deduped AS (SELECT k.doc_id, k.lang, k.toks
            FROM reps JOIN kept k ON k.doc_id = reps.doc_id),
          labeled AS (SELECT lang, toks, ${splitSql("doc_id")} AS split
            FROM deduped)
          SELECT split, lang, COUNT(*) AS docs,
            CAST(SUM(toks) AS BIGINT) AS tokens
          FROM labeled GROUP BY 1, 2""",

    "t20_source_cap" ->
      s"""WITH scored AS (SELECT doc_id, source,
            CAST(len($W) AS BIGINT) AS toks,
            ROUND(LEAST(CAST(len($W) AS DOUBLE), 200.0) * 0.005 +
              CAST(len(list_filter($W, w -> w IN $enMarkers)) AS DOUBLE)
                / CAST(len($W) AS DOUBLE), 6) AS quality
          FROM documents),
          ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY quality DESC, doc_id ASC) AS rk FROM scored)
          SELECT source, COUNT(*) AS kept_docs,
            CAST(SUM(toks) AS BIGINT) AS kept_tokens,
            MIN(quality) AS min_kept_quality
          FROM ranked WHERE rk <= 20 GROUP BY source""",

    // weight = target share (uniform across sources) / actual token
    // share — same division tree as the Spark plan, rounded to 6
    "t16_mixture_weights" ->
      s"""WITH per AS (SELECT source, COUNT(*) AS docs,
            CAST(SUM(len($W)) AS BIGINT) AS tokens
          FROM documents GROUP BY source),
          tot AS (SELECT CAST(SUM(tokens) AS DOUBLE) AS t,
            CAST(COUNT(*) AS DOUBLE) AS ns FROM per)
          SELECT source, docs, tokens,
            ROUND((1.0 / ns) / (tokens / t), 6) AS weight
          FROM per, tot""",

    // exact integer ppm arithmetic both sides: per-doc SUMs of floats
    // would be partition-order-dependent; BIGINT sums are not
    "t17_importance_weights" ->
      s"""WITH terms AS (SELECT doc_id, lang, unnest($W) AS token FROM documents),
          vocab AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_r,
            CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_t
            FROM terms GROUP BY token),
          tot AS (SELECT CAST(SUM(c_r) AS BIGINT) AS n_r,
            CAST(SUM(c_t) AS BIGINT) AS n_t,
            CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
          scored AS (SELECT t.doc_id,
            LEAST(CAST(FLOOR(CAST(vb.c_t + 1 AS DOUBLE) * CAST(tot.n_r + tot.v AS DOUBLE) /
              (CAST(tot.n_t + tot.v AS DOUBLE) * CAST(vb.c_r + 1 AS DOUBLE)) *
              CAST(1000000 AS DOUBLE)) AS BIGINT), 1000000000000) AS ppm
            FROM terms t JOIN vocab vb USING (token) CROSS JOIN tot)
          SELECT doc_id, COUNT(*) AS n_tokens,
            CAST(CAST(SUM(ppm) AS BIGINT) // COUNT(*) AS DOUBLE) / 1000000.0
              AS weight
          FROM scored GROUP BY doc_id""",

    "t18_unigram_surprise" ->
      s"""WITH terms AS (SELECT doc_id, unnest($W) AS token FROM documents),
          vocab AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_r
            FROM terms GROUP BY token),
          tot AS (SELECT CAST(SUM(c_r) AS BIGINT) AS n_r,
            CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
          scored AS (SELECT t.doc_id,
            LEAST(CAST(FLOOR(CAST(tot.n_r + tot.v AS DOUBLE) / CAST(vb.c_r + 1 AS DOUBLE) *
              CAST(1000000 AS DOUBLE)) AS BIGINT), 1000000000000) AS inv_ppm
            FROM terms t JOIN vocab vb USING (token) CROSS JOIN tot)
          SELECT doc_id, COUNT(*) AS n_tokens,
            CAST(CAST(SUM(inv_ppm) AS BIGINT) // COUNT(*) AS DOUBLE) / 1000000.0
              AS mean_inv_prob
          FROM scored GROUP BY doc_id""",

    "t26_bigram_lm_score" ->
      s"""WITH t0 AS (SELECT doc_id, $W AS words FROM documents),
          t AS (SELECT * FROM t0 WHERE len(words) >= 2),
          pairs0 AS (SELECT doc_id, unnest(list_transform(range(1, len(words)),
              i -> {'w1': words[i], 'w2': words[i + 1]})) AS p FROM t),
          pairs AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM pairs0),
          c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
            FROM pairs GROUP BY 1, 2),
          c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
          v AS (SELECT CAST(COUNT(DISTINCT w2) AS BIGINT) AS v FROM pairs),
          scored AS (SELECT pairs.doc_id,
            LEAST(CAST(FLOOR(CAST(c1.c1 + v.v AS DOUBLE) / CAST(c2.c2 + 1 AS DOUBLE) *
              CAST(1000000 AS DOUBLE)) AS BIGINT), 1000000000000) AS inv_ppm
            FROM pairs JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
          SELECT doc_id, COUNT(*) AS n_bigrams,
            CAST(CAST(SUM(inv_ppm) AS BIGINT) // COUNT(*) AS DOUBLE) / 1000000.0
              AS mean_inv_prob
          FROM scored GROUP BY doc_id""",

    // the same lift ratio replayed from first principles: bigram
    // counts, derived unigram marginals, identical double expression
    // shape (left-assoc mult/div are IEEE-exact, so FLOOR agrees)
    "t29_pmi_collocations" ->
      s"""WITH t0 AS (SELECT $W AS words FROM documents),
          t AS (SELECT * FROM t0 WHERE len(words) >= 2),
          pairs0 AS (SELECT unnest(list_transform(range(1, len(words)),
              i -> {'w1': words[i], 'w2': words[i + 1]})) AS p FROM t),
          pairs AS (SELECT p.w1 AS w1, p.w2 AS w2 FROM pairs0),
          c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
            FROM pairs GROUP BY 1, 2),
          cl AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS cl FROM c2 GROUP BY 1),
          cr AS (SELECT w2, CAST(SUM(c2) AS BIGINT) AS cr FROM c2 GROUP BY 1),
          n AS (SELECT CAST(SUM(c2) AS BIGINT) AS n2 FROM c2)
          SELECT w1, w2, c2,
            LEAST(CAST(FLOOR(CAST(c2 AS DOUBLE) * CAST(n2 AS DOUBLE) /
              (CAST(cl AS DOUBLE) * CAST(cr AS DOUBLE)) * 1000000.0) AS BIGINT),
              1000000000000) AS lift_ppm
          FROM c2 JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN n
          WHERE c2 >= 5
          ORDER BY lift_ppm DESC, c2 DESC, w1, w2 LIMIT 100""",

    // overlap replayed from the distinct (source, token) set; ratios
    // are pure integer ppm, so the compare is exact
    "t30_source_overlap" ->
      s"""WITH ex AS (SELECT source, unnest($W) AS w FROM documents),
          v AS (SELECT DISTINCT source, w FROM ex),
          sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
            FROM v GROUP BY 1),
          ic AS (SELECT a.source AS src_a, b.source AS src_b,
              CAST(COUNT(*) AS BIGINT) AS inter
            FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
            GROUP BY 1, 2)
          SELECT src_a, src_b, inter, sa.n AS na, sb.n AS nb,
            CAST(inter * 1000000 // (sa.n + sb.n - inter) AS BIGINT)
              AS jaccard_ppm,
            CAST(inter * 1000000 // LEAST(sa.n, sb.n) AS BIGINT)
              AS containment_ppm
          FROM ic JOIN sizes sa ON ic.src_a = sa.source
          JOIN sizes sb ON ic.src_b = sb.source""",

    // bounds replayed with quantile_cont (the q37-proven exact twin of
    // Spark's percentile), drop/keep verdicts recounted per source
    "t32_length_prune" ->
      s"""WITH t AS (SELECT source, CAST(len($W) AS BIGINT) AS n_tokens
            FROM documents),
          b AS (SELECT source,
              quantile_cont(n_tokens, 0.05) AS p05,
              quantile_cont(n_tokens, 0.95) AS p95
            FROM t GROUP BY 1)
          SELECT t.source, COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN n_tokens < p05 THEN 1 ELSE 0 END) AS BIGINT)
              AS dropped_low,
            CAST(SUM(CASE WHEN n_tokens > p95 THEN 1 ELSE 0 END) AS BIGINT)
              AS dropped_high,
            CAST(SUM(CASE WHEN n_tokens >= p05 AND n_tokens <= p95
              THEN 1 ELSE 0 END) AS BIGINT) AS kept,
            ANY_VALUE(p05) AS p05, ANY_VALUE(p95) AS p95
          FROM t JOIN b USING (source)
          GROUP BY t.source""",

    // the hashed classifier replayed token-by-token: same md5 base
    // hash, same bucket → weight arithmetic, integer sum (empty token
    // lists cannot occur — documents are non-blank — but COALESCE
    // keeps the SQL total like Spark's 0-seeded fold)
    "t33_quality_classifier" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          sc AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
            CAST(COALESCE(list_aggregate(list_transform(words, w ->
              ((CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 1000000007)
                % 1024) * 2654435761 % 2001 - 1000), 'sum'), 0) AS BIGINT)
              AS w_sum
          FROM t)
          SELECT doc_id, n_tokens, w_sum,
            CASE WHEN w_sum >= 0 THEN 'keep' ELSE 'drop' END AS label
          FROM sc""",

    // diversity replayed from the unnested shingle stream; ratio is
    // exact integer ppm
    "t34_ngram_diversity" ->
      s"""WITH t AS (SELECT source, $W AS words FROM documents),
          sh AS (SELECT source, unnest($SH) AS g FROM t)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS total_grams,
            CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_grams,
            CAST(COUNT(DISTINCT g) * 1000000 // COUNT(*) AS BIGINT)
              AS diversity_ppm
          FROM sh GROUP BY source""",

    // winnowing replayed over the d06 Karp-Rabin gram fingerprints
    // (4-gram variant): window-of-4 minima, distinct, order-free stats
    "t35_winnowing" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          h AS (SELECT doc_id,
            list_transform(words, w ->
              CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 1000000007) AS hs
          FROM t),
          f AS (SELECT doc_id, CASE WHEN len(hs) >= 4 THEN
              list_transform(range(1, len(hs) - 2), i ->
                list_reduce(hs[i:i+3], (a, b) -> (a * 31 + b) % 1000000007))
            ELSE [] END AS fp FROM h),
          wn AS (SELECT doc_id, CASE WHEN len(fp) >= 4 THEN
              list_distinct(list_transform(range(1, len(fp) - 2), j ->
                list_aggregate(fp[j:j+3], 'min')))
            ELSE [] END AS fps FROM f)
          SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
            CAST(list_aggregate(fps, 'min') AS BIGINT) AS fp_min,
            CAST(list_aggregate(fps, 'max') AS BIGINT) AS fp_max,
            CAST(COALESCE(list_aggregate(fps, 'sum'), 0) AS BIGINT) AS fp_sum
          FROM wn""",

    // the mutual graph replayed from first principles: in-bucket
    // cosine top-3 per vector (ties by id — the s09 ranking), then an
    // unordered-pair count of 2 ⇔ both directions present
    "s13_knn_graph" ->
      s"""WITH v AS (SELECT vec_id, embedding,
            ${bucketSql("embedding", 2)} AS bucket FROM embeddings),
          pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            a.embedding AS qv, b.embedding AS cv
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
          ranked AS (SELECT id_a, id_b,
            ROW_NUMBER() OVER (PARTITION BY id_a
              ORDER BY $dotSql / ($normQ * $normC) DESC, id_b ASC) AS rank
          FROM pairs),
          directed AS (SELECT id_a, id_b FROM ranked WHERE rank <= 3),
          und AS (SELECT LEAST(id_a, id_b) AS id_a,
            GREATEST(id_a, id_b) AS id_b FROM directed)
          SELECT id_a, id_b FROM und
          GROUP BY id_a, id_b HAVING COUNT(*) = 2""",

    // cells replayed from the s04 centroid table (cosine-nearest, tie
    // to the lower cell — the assignCells rule), then per-cell counts
    // and the floored-ppm d2 sum (per-row floor BEFORE the sum, so the
    // total is an order-free integer like Spark's)
    "s14_cluster_audit" ->
      s"""WITH cent AS (SELECT cell, centroid AS cv
            FROM read_parquet('$IvfCentroidsPath/*.parquet')),
          v AS (SELECT vec_id, embedding AS qv FROM embeddings),
          scored AS (SELECT vec_id, cell,
            $dotSql / ($normQ * $normC) AS cdot
          FROM v CROSS JOIN cent),
          ranked AS (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY cdot DESC, cell ASC) AS crank
          FROM scored),
          asg AS (SELECT vec_id, cell FROM ranked WHERE crank = 1),
          j AS (SELECT a.cell, e.embedding AS x, c.cv AS cc
            FROM asg a
            JOIN embeddings e ON e.vec_id = a.vec_id
            JOIN cent c ON c.cell = a.cell)
          SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
            CAST(SUM(CAST(FLOOR(${d2Sql("x", "cc")} * 1000000.0) AS BIGINT))
              AS BIGINT) AS sum_d2_ppm
          FROM j GROUP BY cell""",

    // d02's candidate pairs with each side's source attached, folded
    // into the canonical cross-source pair matrix
    "d09_cross_source_dups" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          sh AS (SELECT doc_id, $SH AS s FROM t),
          sig AS (SELECT doc_id,
            ${(0 until 4).map(b => s"${band(b, 4)} AS band$b").mkString(", ")}
          FROM sh WHERE len(s) > 0),
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            AND (a.band0 = b.band0 OR a.band1 = b.band1
              OR a.band2 = b.band2 OR a.band3 = b.band3)),
          srcd AS (SELECT p.id_a, p.id_b, da.source AS sa, db.source AS sb
            FROM pairs p
            JOIN documents da ON da.doc_id = p.id_a
            JOIN documents db ON db.doc_id = p.id_b
            WHERE da.source <> db.source)
          SELECT LEAST(sa, sb) AS src_a, GREATEST(sa, sb) AS src_b,
            CAST(COUNT(*) AS BIGINT) AS dup_pairs
          FROM srcd GROUP BY 1, 2""",

    // the fusion replayed from first principles: the t21 BM25 CTEs
    // (ranked, top-10), the s01 cosine CTEs for query vector 0
    // (top-10), a full outer join, and the same exact integer RRF
    // contribution 10^9 // (60 + rank)
    "t31_hybrid_rrf" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          d AS (SELECT doc_id, words, CAST(len(words) AS BIGINT) AS dl FROM t),
          stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d),
          terms AS (SELECT doc_id, dl, unnest(words) AS token FROM d),
          tf AS (SELECT doc_id, token, dl, COUNT(*) AS tf
                 FROM terms GROUP BY 1, 2, 3),
          df AS (SELECT token, COUNT(DISTINCT doc_id) AS df
                 FROM terms GROUP BY 1),
          lscored AS (SELECT doc_id,
              CAST(FLOOR(
                ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) *
                (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE) /
                 (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
                  (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                   + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)
                     / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS sppm
            FROM tf JOIN df USING (token) CROSS JOIN stats
            WHERE token IN ('spark', 'join', 'stream')),
          lexs AS (SELECT doc_id, CAST(SUM(sppm) AS BIGINT) AS score_ppm
            FROM lscored GROUP BY doc_id),
          lex AS (SELECT doc_id, rank FROM (
            SELECT doc_id, ROW_NUMBER() OVER (
              ORDER BY score_ppm DESC, doc_id ASC) AS rank FROM lexs)
            WHERE rank <= 10),
          q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id = 0),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
          vscored AS (SELECT neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM q CROSS JOIN c WHERE neighbor_id <> query_id),
          vec AS (SELECT neighbor_id AS doc_id, rank FROM (
            SELECT neighbor_id, ROW_NUMBER() OVER (
              ORDER BY cos DESC, neighbor_id ASC) AS rank FROM vscored)
            WHERE rank <= 10),
          fused AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
              l.rank AS lex_rank, v.rank AS vec_rank,
              COALESCE(1000000000 // (60 + CAST(l.rank AS BIGINT)), 0) +
              COALESCE(1000000000 // (60 + CAST(v.rank AS BIGINT)), 0) AS rrf_ppb
            FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
          SELECT doc_id, lex_rank, vec_rank, CAST(rrf_ppb AS BIGINT) AS rrf_ppb
          FROM fused ORDER BY rrf_ppb DESC, doc_id ASC LIMIT 10""",

    // chunk fingerprints recomputed from the same slicing rule: md5
    // of the space-joined tokens per (doc, start)
    "t28_chunk_overlap" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          st AS (SELECT doc_id, words,
              unnest(range(0, len(words), 25)) AS start
            FROM t WHERE len(words) > 0),
          c AS (SELECT doc_id, CAST(start // 25 AS INT) AS chunk_idx,
              list_slice(words, CAST(start + 1 AS INT),
                CAST(start + 50 AS INT)) AS ch
            FROM st)
          SELECT doc_id, chunk_idx,
            CAST(len(ch) AS INT) AS n_tokens,
            md5(array_to_string(ch, ' ')) AS chunk_fp
          FROM c""",

    // the same pure function of (epoch, doc_id): identical shards,
    // identical within-shard order
    "t27_epoch_shuffle" ->
      """WITH k AS (SELECT doc_id,
             md5('epoch0|' || CAST(doc_id AS VARCHAR)) AS k
           FROM documents),
          s AS (SELECT doc_id, k,
             CAST(CAST('0x' || substr(k, 1, 8) AS BIGINT) % 8 AS INT) AS shard
           FROM k)
         SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k) AS INT) AS pos
         FROM s""",
    "t19_mixture_sample" ->
      s"""WITH per AS (SELECT source, CAST(SUM(len($W)) AS BIGINT) AS tokens
            FROM documents GROUP BY source),
          tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t,
            CAST(COUNT(*) AS BIGINT) AS ns FROM per),
          rates AS (SELECT source,
            LEAST(1048576, (tot.t * 1048576) // (tot.ns * per.tokens)) AS rate_u20
            FROM per, tot)
          SELECT d.source, COUNT(*) AS kept_docs,
            CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
          FROM documents d JOIN rates r ON d.source = r.source
          WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.source), 1, 5)
              AS BIGINT) < r.rate_u20
          GROUP BY d.source""",

    "t14_seq_pack" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($W) AS BIGINT) AS toks,
            CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 8 AS shard
          FROM documents),
          c AS (SELECT shard, doc_id, toks,
            SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM d)
          SELECT shard, CAST(cum - toks AS BIGINT) // 512 AS seq_id,
            COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS seq_tokens
          FROM c GROUP BY 1, 2""",

    "t10_contamination" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          sh AS (SELECT doc_id, $SH AS s FROM t),
          sig AS (SELECT doc_id, ${splitSql("doc_id")} AS split,
            ${(0 until 4).map(b => s"${band(b, 4)} AS band$b").mkString(", ")}
          FROM sh WHERE len(s) > 0),
          pairs AS (SELECT DISTINCT a.doc_id AS test_id, b.doc_id AS train_id
          FROM sig a JOIN sig b ON a.split = 'test' AND b.split = 'train'
          AND (a.band0 = b.band0 OR a.band1 = b.band1
            OR a.band2 = b.band2 OR a.band3 = b.band3))
          SELECT test_id, COUNT(*) AS n_contaminating,
            MIN(train_id) AS example_train
          FROM pairs GROUP BY test_id""",

    "d01_dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS rep_id,
         COUNT(*) AS dup_cnt FROM documents GROUP BY 1""",

    // same band-collision candidates as d02, then the identical
    // normalized-Levenshtein confirmation (both engines implement
    // classic edit distance; the filter and value are exact integers)
    "d08_editdist_pairs" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          sh AS (SELECT doc_id, $SH AS s FROM t),
          sig AS (SELECT doc_id,
            ${(0 until 4).map(b => s"${band(b, 4)} AS band$b").mkString(", ")}
          FROM sh WHERE len(s) > 0),
          cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          AND (a.band0 = b.band0 OR a.band1 = b.band1
            OR a.band2 = b.band2 OR a.band3 = b.band3)),
          scored AS (SELECT c.id_a, c.id_b,
              levenshtein(ta.text, tb.text) AS lev,
              greatest(length(ta.text), length(tb.text)) AS mx
            FROM cand c
            JOIN documents ta ON ta.doc_id = c.id_a
            JOIN documents tb ON tb.doc_id = c.id_b)
          SELECT id_a, id_b, lev FROM scored WHERE lev * 10 <= mx""",

    "d02_minhash_pairs" ->
      s"""${bandPairCtes()}
          SELECT id_a, id_b FROM pairs""",

    // signatures and shingle sets replayed per candidate pair: the
    // same 16 mh() permutations as the band keys, element-wise
    // agreement over 16, exact set Jaccard — all integer ppm
    "d11_lsh_estimate_audit" ->
      s"""${bandPairCtes(extraSig =
            s"[${(0 until 16).map(mh).mkString(", ")}] AS sig, " +
              "list_distinct(s) AS shset,")},
          j AS (SELECT p.id_a, p.id_b,
              sa.sig AS sig_a, sb.sig AS sig_b,
              sa.shset AS set_a, sb.shset AS set_b
            FROM pairs p
            JOIN sig sa ON sa.doc_id = p.id_a
            JOIN sig sb ON sb.doc_id = p.id_b),
          scored AS (SELECT id_a, id_b,
              CAST(list_aggregate(list_transform(range(1, 17),
                i -> CASE WHEN sig_a[i] = sig_b[i] THEN 1 ELSE 0 END),
                'sum') * 1000000 // 16 AS BIGINT) AS est_ppm,
              CAST(len(list_intersect(set_a, set_b)) * 1000000
                // len(list_distinct(set_a || set_b)) AS BIGINT) AS exact_ppm
            FROM j)
          SELECT id_a, id_b, est_ppm, exact_ppm,
            CAST(abs(est_ppm - exact_ppm) AS BIGINT) AS err_ppm
          FROM scored""",

    // the d11 candidate/set CTEs with both DIRECTIONAL ratios — exact
    // integer ppm against each side's own set size
    "d13_containment_pairs" ->
      s"""${bandPairCtes(extraSig = "list_distinct(s) AS shset,")},
          j AS (SELECT p.id_a, p.id_b,
              sa.shset AS set_a, sb.shset AS set_b
            FROM pairs p
            JOIN sig sa ON sa.doc_id = p.id_a
            JOIN sig sb ON sb.doc_id = p.id_b),
          scored AS (SELECT id_a, id_b,
              CAST(len(list_intersect(set_a, set_b)) * 1000000
                // len(set_a) AS BIGINT) AS cont_a_ppm,
              CAST(len(list_intersect(set_a, set_b)) * 1000000
                // len(set_b) AS BIGINT) AS cont_b_ppm
            FROM j)
          SELECT id_a, id_b, cont_a_ppm, cont_b_ppm,
            CAST(GREATEST(cont_a_ppm, cont_b_ppm) AS BIGINT) AS max_cont_ppm
          FROM scored""",

    // the s01 cosine CTEs without the rank: keep everything at or
    // above the radius, similarity floored to ppm
    "s15_range_search" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < 5),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv
            FROM embeddings),
          scored AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM q CROSS JOIN c WHERE neighbor_id <> query_id)
          SELECT query_id, neighbor_id,
            CAST(FLOOR(cos * 1000000.0) AS BIGINT) AS cos_ppm
          FROM scored WHERE cos >= 0.3""",

    "d03_jaccard_pairs" ->
      s"""WITH t AS (SELECT doc_id, source, lang, $W AS words FROM documents),
          sh AS (SELECT doc_id, source, lang, list_distinct($SH) AS s FROM t)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              len(list_distinct(a.s || b.s)), 6) AS jaccard
          FROM sh a JOIN sh b
          ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
              len(list_distinct(a.s || b.s)) >= 0.8""",

    "d04_simhash" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents)
          SELECT doc_id,
          ${(0 until 32).map(simhashBitSql).mkString(" + ")} AS simhash
          FROM t""",

    "d05_dedup_clusters" ->
      s"""$clusterCtes
          SELECT src AS doc_id, LEAST(src, MIN(dst)) AS rep
          FROM reach GROUP BY src""",

    // d05's components applied: reps (rep = self) and untouched docs
    // keep, other members drop — recounted per source
    "d10_dedup_apply" ->
      s"""$clusterCtes,
          m AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS rep
            FROM reach GROUP BY src)
          SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(CASE WHEN m.rep IS NULL OR m.rep = d.doc_id
              THEN 1 ELSE 0 END) AS BIGINT) AS kept,
            CAST(SUM(CASE WHEN m.rep IS NOT NULL AND m.rep <> d.doc_id
              THEN 1 ELSE 0 END) AS BIGINT) AS dropped
          FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
          GROUP BY d.source""",

    // the coverage curve replayed: global type counts, (count desc,
    // token asc) head, running sum over the head, exact ppm
    "t36_vocab_coverage" ->
      s"""WITH ex AS (SELECT unnest($W) AS w FROM documents),
          c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM ex GROUP BY 1),
          tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM c),
          r AS (SELECT w, c,
            ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS rank,
            SUM(c) OVER (ORDER BY c DESC, w ASC
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM c)
          SELECT CAST(rank AS BIGINT) AS k, CAST(cum AS BIGINT) AS covered,
            total, CAST(cum * 1000000 // total AS BIGINT) AS coverage_ppm
          FROM r CROSS JOIN tot WHERE rank IN (5, 10, 25)""",

    // the d06 gram CTEs with positions carried through: duplicated
    // spans (min doc ≠ max doc per fingerprint), covered offsets
    // unioned per doc via DISTINCT — overlaps never double-count
    "d12_span_coverage" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          h AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
            list_transform(words, w ->
              CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 1000000007) AS hs
          FROM t),
          g0 AS (SELECT doc_id, n_tokens, hs,
              unnest(range(0, len(hs) - 7)) AS pos
            FROM h WHERE len(hs) >= 8),
          grams AS (SELECT doc_id, n_tokens, pos,
              list_reduce(hs[pos + 1:pos + 8],
                (a, b) -> (a * 31 + b) % 1000000007) AS g
            FROM g0),
          dupg AS (SELECT g FROM grams GROUP BY g
            HAVING MIN(doc_id) <> MAX(doc_id)),
          spans AS (SELECT grams.doc_id, grams.n_tokens, grams.pos
            FROM grams JOIN dupg USING (g)),
          toks AS (SELECT DISTINCT doc_id, n_tokens, tok FROM (
            SELECT doc_id, n_tokens, unnest(range(pos, pos + 8)) AS tok
            FROM spans))
          SELECT doc_id, ANY_VALUE(n_tokens) AS n_tokens,
            CAST(COUNT(*) AS BIGINT) AS tokens_covered,
            CAST(COUNT(*) * 1000000 // ANY_VALUE(n_tokens) AS BIGINT)
              AS covered_ppm
          FROM toks GROUP BY doc_id""",

    // the BpeTrainer loop unrolled into k static CTE stages: each
    // stage's winning pair is a 1-row relation cross-joined into the
    // next stage's merge replace (the same 6 non-overlapping passes
    // as the Spark side, so the semantics are pinned byte-for-byte)
    "t41_bpe_merges" -> bpeOracleSql(8, 6),

    // the t51 prune log: 10 seed merges then 4 unrolled prune rounds
    "t51_unigram_prune" -> unigramOracleSql(10, 4, 6),

    // exact order statistics straight from a full sort — the oracle
    // needs no sketch knowledge, which is the point of the
    // sketch-proposes/exact-recount contract; rank rule is the same
    // pure-integer ceil: r = max(1, (ppm*n + 999999) // 1e6)
    "t52_percentile_sketch" ->
      """WITH v AS (SELECT l_extendedprice AS v FROM lineitem
            WHERE l_extendedprice IS NOT NULL),
          n AS (SELECT COUNT(*) AS n FROM v),
          q AS (SELECT unnest([500000, 900000, 990000]) AS q),
          t AS (SELECT q, GREATEST(1, (q * n.n + 999999) // 1000000) AS rk
            FROM q, n),
          s AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
          SELECT CAST(t.q AS BIGINT) AS pct_ppm,
            (SELECT CAST(n AS BIGINT) FROM n) AS n_rows,
            CAST(t.rk AS BIGINT) AS rk, s.v AS value
          FROM t JOIN s ON s.rn = t.rk""",

    // the cube path answers with the SAME exact order statistics a
    // global sort produces — the oracle needs no sketch knowledge
    "t54_sketch_cube" ->
      """WITH v AS (SELECT l_extendedprice AS v FROM lineitem
            WHERE l_extendedprice IS NOT NULL),
          n AS (SELECT COUNT(*) AS n FROM v),
          q AS (SELECT unnest([250000, 750000]) AS q),
          t AS (SELECT q, GREATEST(1, (q * n.n + 999999) // 1000000) AS rk
            FROM q, n),
          s AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
          SELECT CAST(t.q AS BIGINT) AS pct_ppm,
            (SELECT CAST(n AS BIGINT) FROM n) AS n_rows,
            CAST(t.rk AS BIGINT) AS rk, s.v AS value
          FROM t JOIN s ON s.rn = t.rk""",

    // the per-group cube serving answers with the SAME exact order
    // statistics a per-group sort produces — zero sketch knowledge
    "t55_group_sketch_cube" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS v
            FROM lineitem WHERE l_extendedprice IS NOT NULL),
          n AS (SELECT g, COUNT(*) AS n FROM v GROUP BY g),
          q AS (SELECT unnest([500000, 900000]) AS q),
          t AS (SELECT n.g, q.q, n.n,
            GREATEST(1, (q.q * n.n + 999999) // 1000000) AS rk FROM q, n),
          s AS (SELECT g, v,
            row_number() OVER (PARTITION BY g ORDER BY v) AS rn FROM v)
          SELECT t.g AS l_returnflag, CAST(t.q AS BIGINT) AS pct_ppm,
            CAST(t.n AS BIGINT) AS n_rows, CAST(t.rk AS BIGINT) AS rk,
            s.v AS value
          FROM t JOIN s ON s.g = t.g AND s.rn = t.rk""",

    // grouped order statistics from a per-group sort — identical rank
    // rule, partitioned by the group; ties share a value so the tie
    // order inside row_number cannot change the answer
    "t53_group_percentile_sketch" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS v
            FROM lineitem WHERE l_extendedprice IS NOT NULL),
          n AS (SELECT g, COUNT(*) AS n FROM v GROUP BY g),
          q AS (SELECT unnest([500000, 950000]) AS q),
          t AS (SELECT n.g, q.q, n.n,
            GREATEST(1, (q.q * n.n + 999999) // 1000000) AS rk FROM q, n),
          s AS (SELECT g, v,
            row_number() OVER (PARTITION BY g ORDER BY v) AS rn FROM v)
          SELECT t.g AS l_returnflag, CAST(t.q AS BIGINT) AS pct_ppm,
            CAST(t.n AS BIGINT) AS n_rows, CAST(t.rk AS BIGINT) AS rk,
            s.v AS value
          FROM t JOIN s ON s.g = t.g AND s.rn = t.rk""",

    // the learned merges cross-joined into a per-doc apply replay
    "t42_bpe_apply" -> bpeApplyOracleSql(8, 6),

    // the perceptron replayed as 3 unrolled rounds of score → miss →
    // batch-update CTEs; integer arithmetic end to end
    "t45_train_classifier" -> perceptronOracleSql(256, 3),

    // the t45 training CTEs + the final model scored on every split
    "t48_classifier_eval" -> perceptronEvalOracleSql(256, 3),

    // the planted-PII corpus replayed with the IDENTICAL RE2-safe
    // patterns (verbatim from TextFunctions) and the same
    // email → phone → IP redaction pass order; 'g' matches Spark's
    // replace-all semantics
    "t44_pii_scrub" -> {
      val em = TextFunctions.EmailPattern
      val ph = TextFunctions.PhonePattern
      val ip = TextFunctions.Ipv4Pattern
      s"""WITH p AS (${plantPiiSql()})
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '$em')) AS INT) AS n_emails,
            CAST(len(regexp_extract_all(text, '$ph')) AS INT) AS n_phones,
            CAST(len(regexp_extract_all(text, '$ip')) AS INT) AS n_ips,
            regexp_replace(regexp_replace(regexp_replace(text,
              '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'),
              '$ip', '[IP]', 'g') AS redacted
          FROM p"""
    },

    // the t44 machinery over multibyte prose: patterns stay ASCII,
    // the haystack carries 2-/3-/4-byte code points — Java's UTF-16
    // engine and RE2's UTF-8 walk must agree on every match boundary
    // for the redacted text to hash-match
    "t47_utf8_pii" -> {
      val em = TextFunctions.EmailPattern
      val ph = TextFunctions.PhonePattern
      val ip = TextFunctions.Ipv4Pattern
      s"""WITH u AS (SELECT doc_id, $Utf8ifySql AS text FROM documents),
          p AS (${plantPiiSql("u")})
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '$em')) AS INT) AS n_emails,
            CAST(len(regexp_extract_all(text, '$ph')) AS INT) AS n_phones,
            CAST(len(regexp_extract_all(text, '$ip')) AS INT) AS n_ips,
            regexp_replace(regexp_replace(regexp_replace(text,
              '$em', '[EMAIL]', 'g'), '$ph', '[PHONE]', 'g'),
              '$ip', '[IP]', 'g') AS redacted
          FROM p"""
    },

    // the u-corpus (see Utf8ifySql) tokenized and shingled: length()
    // counts code points, octet_length() counts UTF-8 bytes, and the
    // shingle md5 hashes the bytes — all three must agree with Spark
    // on 2-/3-/4-byte code points for any of the text family to be
    // trusted on real-world text
    "t43_utf8_text" ->
      s"""WITH u AS (SELECT doc_id, $Utf8ifySql AS utext FROM documents),
          t AS (SELECT doc_id, utext,
            string_split_regex(trim(utext), '\\s+') AS words FROM u),
          s AS (SELECT doc_id, utext, words,
            list_transform(range(1, len(words) - 1),
              i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS sh
          FROM t)
          SELECT doc_id, CAST(len(words) AS INT) AS n_tokens_u,
            CAST(length(utext) AS BIGINT) AS n_chars_u,
            CAST(strlen(utext) AS BIGINT) AS n_bytes_u,
            words[1] AS first_token_u,
            list_aggregate(list_transform(sh, x ->
              CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000007),
              'min') AS min_shingle_h
          FROM s""",

    // the same dirty-twin derivation (decomposed a+U+0301, space+tab,
    // trailing BEL) canonicalized with DuckDB's own nfc_normalize —
    // the canonical text hash-compares only if both engines' Unicode
    // NFC tables and regex span semantics agree
    "t49_text_canonicalize" ->
      """WITH raw AS (SELECT doc_id,
            replace(replace(text, 'a', 'a' || chr(769)), ' ',
              ' ' || chr(9)) || chr(7) AS raw
          FROM documents),
          c AS (SELECT doc_id, raw,
            trim(regexp_replace(regexp_replace(nfc_normalize(raw),
              '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
              '[ \t\n\r]+', ' ', 'g')) AS canon
          FROM raw)
          SELECT doc_id, canon,
            CAST(length(raw) AS BIGINT) AS n_chars_raw,
            CAST(length(canon) AS BIGINT) AS n_chars_canon,
            CAST(strlen(canon) AS BIGINT) AS n_bytes_canon
          FROM c""",

    // the same 64/48 window rule over the same tokenization; DuckDB's
    // 1-based inclusive slice words[a+1 : min(a+64, n)] is exactly the
    // 0-based window [a, a+64); chunk_h replays the shingleBaseHash
    // 60-bit md5 rule on the joined chunk text
    "t50_doc_chunks" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          n AS (SELECT doc_id, words, len(words) AS n FROM t
            WHERE len(words) > 0 AND words[1] <> ''),
          k AS (SELECT doc_id, words, n,
            unnest(range(0, CASE WHEN n <= 64 THEN 1
              ELSE (n - 17) // 48 + 1 END)) AS ck FROM n),
          c AS (SELECT doc_id, CAST(ck AS INT) AS chunk_idx,
            CAST(ck * 48 AS INT) AS start_tok,
            CAST(least(64, n - ck * 48) AS INT) AS n_tokens,
            array_to_string(
              words[CAST(ck * 48 + 1 AS INT) :
                    CAST(least(ck * 48 + 64, n) AS INT)], ' ') AS chunk_text
          FROM k)
          SELECT doc_id, chunk_idx, start_tok, n_tokens, chunk_text,
            CAST('0x' || substr(md5(chunk_text), 1, 15) AS BIGINT)
              % 1000000007 AS chunk_h
          FROM c""",

    // the t50 chunk table regrouped by exact content — the
    // cross-document boilerplate inventory at retrieval-unit
    // granularity
    "d18_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          n AS (SELECT doc_id, words, len(words) AS n FROM t
            WHERE len(words) > 0 AND words[1] <> ''),
          k AS (SELECT doc_id, words, n,
            unnest(range(0, CASE WHEN n <= 64 THEN 1
              ELSE (n - 17) // 48 + 1 END)) AS ck FROM n),
          c AS (SELECT doc_id,
            array_to_string(
              words[CAST(ck * 48 + 1 AS INT) :
                    CAST(least(ck * 48 + 64, n) AS INT)], ' ') AS chunk_text
          FROM k)
          SELECT CAST('0x' || substr(fp, 1, 15) AS BIGINT)
              % 1000000007 AS chunk_h,
            CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
            CAST(COUNT(*) AS BIGINT) AS n_occ,
            MIN(doc_id) AS min_doc
          FROM (SELECT md5(chunk_text) AS fp, doc_id FROM c)
          GROUP BY fp
          HAVING COUNT(DISTINCT doc_id) > 1""",

    // the same derivation (composed corpus + decomposed/whitespace/BEL
    // twins), both fingerprints replayed — raw over the verbatim text,
    // canonical through nfc_normalize + the t49 regex pipeline
    "d19_canonical_dedup" ->
      """WITH a AS (SELECT doc_id, replace(text, 'a', chr(225)) AS text,
            source FROM documents),
          b AS (SELECT doc_id + 3000000 AS doc_id,
            replace(replace(text, 'a', 'a' || chr(769)), ' ', '  ')
              || chr(7) AS text, source
          FROM documents WHERE doc_id % 5 = 0),
          u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
          f AS (SELECT doc_id, source,
            md5(lower(trim(text))) AS raw_fp,
            md5(lower(trim(
              trim(regexp_replace(regexp_replace(nfc_normalize(text),
                '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                '[ \t\n\r]+', ' ', 'g'))))) AS can_fp
          FROM u),
          c AS (SELECT source,
            COUNT(*) OVER (PARTITION BY raw_fp) AS rn,
            COUNT(*) OVER (PARTITION BY can_fp) AS cn
          FROM f)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS raw_dup_docs,
            CAST(SUM(CASE WHEN cn > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS canon_dup_docs
          FROM c GROUP BY source""",

    // t41's unrolled-CTE replay over the u-corpus: the symbolize step
    // (one space per CHARACTER) must split on code points, not bytes
    // or UTF-16 units, in both engines
    "t46_utf8_bpe" -> bpeOracleSql(6, 6, src = "u",
      prefix = s"u AS (SELECT doc_id, $Utf8ifySql AS text FROM documents)"),

    // the d12 span machinery, then the REMOVAL applied: covered token
    // positions (the merged-interval union, as a distinct-position
    // set) are clipped and the kept tokens rejoined — matching the
    // Spark reconstruction proves the interval union and the clip
    "t40_span_clip" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          h AS (SELECT doc_id, words,
            list_transform(words, w ->
              CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 1000000007) AS hs
          FROM t),
          g0 AS (SELECT doc_id, hs,
              unnest(range(0, len(hs) - 7)) AS pos
            FROM h WHERE len(hs) >= 8),
          grams AS (SELECT doc_id, pos,
              list_reduce(hs[pos + 1:pos + 8],
                (a, b) -> (a * 31 + b) % 1000000007) AS g
            FROM g0),
          dupg AS (SELECT g FROM grams GROUP BY g
            HAVING MIN(doc_id) <> MAX(doc_id)),
          toks AS (SELECT DISTINCT doc_id, tok FROM (
            SELECT grams.doc_id, unnest(range(pos, pos + 8)) AS tok
            FROM grams JOIN dupg USING (g))),
          cov AS (SELECT doc_id, list(tok) AS covered
            FROM toks GROUP BY doc_id)
          SELECT h.doc_id,
            CAST(len(words) AS BIGINT) AS n_tokens,
            CAST(COALESCE(len(covered), 0) AS BIGINT) AS removed_tokens,
            COALESCE(array_to_string(list_transform(
              list_filter(range(0, len(words)),
                p -> covered IS NULL OR NOT list_contains(covered, p)),
              p -> words[p + 1]), ' '), '') AS clean_text
          FROM h LEFT JOIN cov USING (doc_id)""",

    // same Karp-Rabin fold as t06 applied per 8-token window; a span
    // is duplicated when its fingerprint occurs in >=2 distinct docs
    "d06_dup_ngrams" ->
      s"""WITH t AS (SELECT doc_id, $W AS words FROM documents),
          h AS (SELECT doc_id,
            list_transform(words, w ->
              CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 1000000007) AS hs
          FROM t),
          grams AS (
            SELECT doc_id, unnest(list_transform(range(1, len(hs) - 6), i ->
              list_reduce(hs[i:i+7], (a, b) -> (a * 31 + b) % 1000000007))) AS g
            FROM h WHERE len(hs) >= 8),
          dup AS (SELECT g FROM grams GROUP BY g
                  HAVING COUNT(DISTINCT doc_id) >= 2)
          SELECT doc_id, COUNT(*) AS dup_spans, COUNT(DISTINCT g) AS dup_grams
          FROM grams JOIN dup USING (g)
          GROUP BY doc_id""",

    // cells replayed from the s04 centroid table (cosine-nearest,
    // tie to the lower cell id — same rule as assignCells), then the
    // SemDeDup predicate: an earlier-id same-cell vector with
    // cosine >= 0.4
    "d07_semantic_dedup" ->
      s"""WITH cent AS (SELECT cell, centroid AS cv
            FROM read_parquet('$IvfCentroidsPath/*.parquet')),
          v AS (SELECT vec_id, embedding AS qv FROM embeddings),
          scored AS (SELECT vec_id, cell,
            $dotSql / ($normQ * $normC) AS cdot
          FROM v CROSS JOIN cent),
          ranked AS (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY cdot DESC, cell ASC) AS crank
          FROM scored),
          asg AS (SELECT r.vec_id, r.cell, e.embedding
            FROM ranked r JOIN embeddings e USING (vec_id)
            WHERE crank = 1),
          pairs AS (SELECT a.vec_id AS kept_id, b.vec_id AS dup_id,
            a.embedding AS qv, b.embedding AS cv
          FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id)
          SELECT dup_id, MIN(kept_id) AS kept_id FROM pairs
          WHERE $dotSql / ($normQ * $normC) >= 0.4
          GROUP BY dup_id""",

    // consecutive-pair LEAD per user (order total — (user_id, ts) is
    // collision-free by the testdata contract), counts + exact ppm
    // row-conditional probabilities
    "e03_transition_matrix" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_type
           FROM events),
         tr AS (SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY t)
               AS to_type
           FROM e),
         c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT from_type, CAST(SUM(cnt) AS BIGINT) AS tot
           FROM c GROUP BY 1)
         SELECT from_type, to_type, cnt,
           CAST(cnt * 1000000 // tot AS BIGINT) AS p_ppm
         FROM c JOIN tot USING (from_type)""",

    // the s02 bucketed replay restricted to the label-1 corpus side
    // (the pre-filter contract: bucket assignment happens AFTER the
    // predicate)
    "s17_filtered_ann" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
            ${bucketSql("embedding", 4)} AS bucket
            FROM embeddings WHERE vec_id < 5),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
            ${bucketSql("embedding", 4)} AS bucket FROM embeddings
            WHERE label = 1),
          scored AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM q JOIN c USING (bucket) WHERE neighbor_id <> query_id),
          ranked AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored)
          SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3""",

    // the same lag-gap flag + running-sum session ids; (user_id, ts)
    // is collision-free by the testdata contract so the split is
    // deterministic
    "e07_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t FROM events),
         f AS (SELECT user_id, t,
             CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                    IS NULL
                  OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                    > 1800000000000
                  THEN 1 ELSE 0 END AS ns
           FROM e),
         g AS (SELECT user_id, t,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM f),
         s AS (SELECT user_id, sid, COUNT(*) AS n_events,
             (MAX(t) - MIN(t)) // 1000000 AS dur_ms
           FROM g GROUP BY 1, 2)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(MAX(n_events) AS BIGINT) AS max_events,
           CAST(MAX(dur_ms) AS BIGINT) AS max_dur_ms
         FROM s GROUP BY user_id""",

    // the same strict first-occurrence chain: first view, first
    // later click, first later purchase — counts and ppm replay
    "e06_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_type
           FROM events),
         a AS (SELECT user_id, MIN(t) AS ta FROM e
           WHERE event_type = 'view' GROUP BY user_id),
         b AS (SELECT e.user_id, MIN(t) AS tb FROM e JOIN a USING (user_id)
           WHERE event_type = 'click' AND t > ta GROUP BY e.user_id),
         c AS (SELECT e.user_id, MIN(t) AS tc FROM e JOIN b USING (user_id)
           WHERE event_type = 'purchase' AND t > tb GROUP BY e.user_id),
         s AS (SELECT 1 AS stage, 'view' AS step,
             (SELECT COUNT(*) FROM a) AS n
           UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM b)
           UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM c))
         SELECT CAST(stage AS INT) AS stage, step,
           CAST(n AS BIGINT) AS n_users,
           CAST(n * 1000000 // (SELECT COUNT(*) FROM a) AS BIGINT)
             AS conv_ppm
         FROM s""",

    // the e06 chain with the 6h per-step deadline folded into each
    // stage's qualifying filter
    "e08_funnel_windowed" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_type
           FROM events),
         a AS (SELECT user_id, MIN(t) AS ta FROM e
           WHERE event_type = 'view' GROUP BY user_id),
         b AS (SELECT e.user_id, MIN(t) AS tb FROM e JOIN a USING (user_id)
           WHERE event_type = 'click' AND t > ta
             AND t <= ta + 21600000000000 GROUP BY e.user_id),
         c AS (SELECT e.user_id, MIN(t) AS tc FROM e JOIN b USING (user_id)
           WHERE event_type = 'purchase' AND t > tb
             AND t <= tb + 21600000000000 GROUP BY e.user_id),
         s AS (SELECT 1 AS stage, 'view' AS step,
             (SELECT COUNT(*) FROM a) AS n
           UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM b)
           UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM c))
         SELECT CAST(stage AS INT) AS stage, step,
           CAST(n AS BIGINT) AS n_users,
           CAST(n * 1000000 // (SELECT COUNT(*) FROM a) AS BIGINT)
             AS conv_ppm
         FROM s""",

    // gaps replayed with the same LAG attribution; quantile_cont is
    // the q37-proven exact twin of Spark's percentile
    "e05_interarrival" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t
           FROM events),
         g AS (SELECT event_type,
             t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
           FROM e)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
           quantile_cont(gap, 0.5) AS p50_ns,
           quantile_cont(gap, 0.95) AS p95_ns,
           CAST(MIN(gap) AS BIGINT) AS min_ns,
           CAST(MAX(gap) AS BIGINT) AS max_ns
         FROM g WHERE gap IS NOT NULL GROUP BY 1""",

    // cohort = min week per user, activity = distinct (user, week),
    // retention recounted against the cohort size — exact ppm
    "e04_retention_cohorts" ->
      """WITH e AS (SELECT user_id,
           epoch_ns(ts) // 604800000000000 AS wk FROM events),
         a AS (SELECT DISTINCT user_id, wk FROM e),
         c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY 1),
         sz AS (SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_size
           FROM c GROUP BY 1),
         j AS (SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset
           FROM a JOIN c USING (user_id))
         SELECT j.cohort_wk, j.week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users, sz.cohort_size,
           CAST(COUNT(*) * 1000000 // sz.cohort_size AS BIGINT)
             AS retention_ppm
         FROM j JOIN sz ON j.cohort_wk = sz.cohort_wk
         GROUP BY j.cohort_wk, j.week_offset, sz.cohort_size""",

    "e02_trajectory_topk" -> {
      val profile = (0 until 24).map(h =>
        s"CAST(SUM(CASE WHEN hr = $h THEN 1 ELSE 0 END) AS DOUBLE)")
        .mkString("[", ", ", "]")
      s"""WITH e AS (SELECT user_id,
            (epoch_ns(ts) // 3600000000000) % 24 AS hr FROM events),
          p AS (SELECT user_id, $profile AS profile
            FROM e GROUP BY user_id),
          q AS (SELECT user_id AS query_id, profile AS qv
            FROM p WHERE user_id < 5),
          c AS (SELECT user_id AS neighbor_id, profile AS cv FROM p),
          scored AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM q CROSS JOIN c WHERE neighbor_id <> query_id),
          ranked AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored)
          SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3"""
    },

    "s01_ann_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < 5),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
          scored AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM q CROSS JOIN c WHERE neighbor_id <> query_id),
          ranked AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored)
          SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3""",

    // recall@3 from first principles: the s01 truth CTEs and the s02
    // bucketed CTEs side by side, overlap counted per query, ratio as
    // exact integer ppm (hits × 10^6 // 3)
    "s10_ann_recall" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < 5),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
          tscored AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM q CROSS JOIN c WHERE neighbor_id <> query_id),
          truth AS (SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM tscored) WHERE rank <= 3),
          qb AS (SELECT vec_id AS query_id, embedding AS qv,
            ${bucketSql("embedding", 4)} AS bucket
            FROM embeddings WHERE vec_id < 5),
          cb AS (SELECT vec_id AS neighbor_id, embedding AS cv,
            ${bucketSql("embedding", 4)} AS bucket FROM embeddings),
          ascored AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM qb JOIN cb USING (bucket) WHERE neighbor_id <> query_id),
          approx AS (SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM ascored) WHERE rank <= 3),
          j AS (SELECT t.query_id,
              CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM truth t LEFT JOIN approx a
              ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id)
          SELECT query_id, CAST(SUM(hit) AS BIGINT) AS hits,
            CAST(CAST(SUM(hit) AS BIGINT) * 1000000 // 3 AS BIGINT)
              AS recall_ppm
          FROM j GROUP BY query_id""",

    "s02_ann_bucketed" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
            ${bucketSql("embedding", 4)} AS bucket
            FROM embeddings WHERE vec_id < 5),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
            ${bucketSql("embedding", 4)} AS bucket FROM embeddings),
          scored AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM q JOIN c USING (bucket) WHERE neighbor_id <> query_id),
          ranked AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored)
          SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3""",

    "s03_ann_multiprobe" ->
      s"""WITH qb AS (SELECT vec_id AS query_id, embedding AS qv,
            ${bucketSql("embedding", 4)} AS bucket
            FROM embeddings WHERE vec_id < 5),
          q AS (SELECT query_id, qv,
            unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                    xor(bucket, 4), xor(bucket, 8)]) AS probe
          FROM qb),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
            ${bucketSql("embedding", 4)} AS probe FROM embeddings),
          scored AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM q JOIN c USING (probe) WHERE neighbor_id <> query_id),
          ranked AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored)
          SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3""",

    // the same bucketed-kNN vote replayed from first principles: rank
    // in-bucket neighbors by the double cosine (ties by id), top-3
    // vote, flagged = strict minority of the ACTUAL neighbor count,
    // loners (no in-bucket neighbors) kept + counted via the left join
    "s09_knn_label_purity" ->
      s"""WITH v AS (SELECT vec_id, label, embedding,
            ${bucketSql("embedding", 2)} AS bucket FROM embeddings),
          pairs AS (SELECT a.vec_id AS id_a, a.label AS label_a,
            b.vec_id AS id_b, b.label AS label_b,
            a.embedding AS qv, b.embedding AS cv
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
          ranked AS (SELECT id_a, label_a, label_b,
            ROW_NUMBER() OVER (PARTITION BY id_a
              ORDER BY $dotSql / ($normQ * $normC) DESC, id_b ASC) AS rank
          FROM pairs),
          agg AS (SELECT id_a,
            SUM(CASE WHEN label_b = label_a THEN 1 ELSE 0 END) AS agree,
            COUNT(*) AS n_neighbors
          FROM ranked WHERE rank <= 3 GROUP BY id_a),
          per AS (SELECT e.label, COALESCE(agg.agree, 0) AS agree,
            COALESCE(agg.n_neighbors, 0) AS n_neighbors
          FROM embeddings e LEFT JOIN agg ON e.vec_id = agg.id_a)
          SELECT label, COUNT(*) AS n_vectors,
            CAST(SUM(CASE WHEN n_neighbors > 0 AND agree * 2 < n_neighbors
              THEN 1 ELSE 0 END) AS BIGINT) AS flagged,
            CAST(SUM(CASE WHEN n_neighbors = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS loners,
            CAST(SUM(agree) AS BIGINT) AS sum_agree
          FROM per GROUP BY label""",

    "e01_embed_neardup" ->
      s"""WITH v AS (SELECT vec_id, embedding,
            ${bucketSql("embedding", 2)} AS bucket FROM embeddings),
          p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            a.embedding AS qv, b.embedding AS cv
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
          SELECT id_a, id_b FROM p
          WHERE $dotSql / ($normQ * $normC) >= 0.4""",

    "m01_binary_features" ->
      """SELECT source, COUNT(*) AS n,
         CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
         CAST(SUM(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)) AS BIGINT) AS checksum_sum
         FROM documents GROUP BY source""",

    "s04_ann_ivf" ->
      s"""WITH cent AS (SELECT cell, centroid AS cv
            FROM read_parquet('$IvfCentroidsPath/*.parquet')),
          v AS (SELECT vec_id, embedding AS qv FROM embeddings),
          scored AS (SELECT vec_id, cell,
            $dotSql / ($normQ * $normC) AS cdot
          FROM v CROSS JOIN cent),
          ranked AS (SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY cdot DESC, cell ASC) AS crank
          FROM scored),
          corpus_cell AS (SELECT vec_id, cell FROM ranked WHERE crank = 1),
          query_cells AS (SELECT vec_id, cell FROM ranked
            WHERE crank <= 3 AND vec_id < 5),
          pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM query_cells q JOIN corpus_cell c USING (cell)
            WHERE c.vec_id <> q.vec_id),
          scored2 AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM (SELECT p.query_id, p.neighbor_id,
                  eq.embedding AS qv, ec.embedding AS cv
                FROM pairs p
                JOIN embeddings eq ON eq.vec_id = p.query_id
                JOIN embeddings ec ON ec.vec_id = p.neighbor_id)),
          ranked2 AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored2)
          SELECT query_id, rank, neighbor_id FROM ranked2 WHERE rank <= 3""",

    // recompute encode + ADC from the materialized codebooks; terms
    // summed in subspace order (list ORDER BY sub) to mirror Spark's
    // left-to-right reduce
    // the s05 encode CTEs (nearest code by d2, ties to the lower code)
    // folded into per-subspace population / live-code / distortion
    // sums (per-row floor before the sum — order-free integers)
    "s16_pq_distortion" ->
      s"""WITH cb AS (SELECT sub, code, centroid
            FROM read_parquet('$PqCodebookPath/*.parquet')),
          v AS (SELECT vec_id, embedding FROM embeddings),
          sv AS (SELECT vec_id, s.sub,
              list_slice(embedding, s.sub * 16 + 1, s.sub * 16 + 16) AS x
            FROM v CROSS JOIN (SELECT DISTINCT sub FROM cb) s),
          encd AS (SELECT sv.vec_id, sv.sub, cb.code,
              ${d2Sql("sv.x", "cb.centroid")} AS dd
            FROM sv JOIN cb ON cb.sub = sv.sub),
          codesd AS (SELECT vec_id, sub, code, dd FROM (
              SELECT vec_id, sub, code, dd,
                ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                  ORDER BY dd ASC, code ASC) AS rn
              FROM encd) t WHERE rn = 1)
          SELECT sub, CAST(COUNT(*) AS BIGINT) AS n_vectors,
            CAST(COUNT(DISTINCT code) AS BIGINT) AS codes_used,
            CAST(SUM(CAST(FLOOR(dd * 1000000.0) AS BIGINT)) AS BIGINT)
              AS sum_d2_ppm
          FROM codesd GROUP BY sub""",

    "s05_ann_pq" ->
      s"""WITH cb AS (SELECT sub, code, centroid
            FROM read_parquet('$PqCodebookPath/*.parquet')),
          v AS (SELECT vec_id, embedding FROM embeddings),
          sv AS (SELECT vec_id, s.sub,
              list_slice(embedding, s.sub * 16 + 1, s.sub * 16 + 16) AS x
            FROM v CROSS JOIN (SELECT DISTINCT sub FROM cb) s),
          encd AS (SELECT sv.vec_id, sv.sub, cb.code,
              ${d2Sql("sv.x", "cb.centroid")} AS dd
            FROM sv JOIN cb ON cb.sub = sv.sub),
          codes AS (SELECT vec_id, sub, code FROM (
              SELECT vec_id, sub, code,
                ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                  ORDER BY dd ASC, code ASC) AS rn
              FROM encd) t WHERE rn = 1),
          q AS (SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings WHERE vec_id < 5),
          psub AS (SELECT q.query_id, c.vec_id AS neighbor_id, c.sub,
              ${d2Sql("list_slice(q.qe, c.sub * 16 + 1, c.sub * 16 + 16)", "cb.centroid")} AS dd
            FROM q CROSS JOIN codes c
            JOIN cb ON cb.sub = c.sub AND cb.code = c.code
            WHERE c.vec_id <> q.query_id),
          adc AS (SELECT query_id, neighbor_id,
              list_aggregate(list(dd ORDER BY sub), 'sum') AS adc
            FROM psub GROUP BY 1, 2),
          ranked AS (SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY adc ASC, neighbor_id ASC) AS rank
            FROM adc)
          SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3""",

    // composed from the s04 cell CTEs (cosine coarse ranking) and the
    // s05 encode/ADC CTEs — a corpus row is scored only when its cell
    // is among the query's nprobe nearest
    "s06_ann_ivfpq" -> ivfPqOracle,

    "s11_pq_rerank" -> ivfPqRerankOracle,

    // SQ8 replayed from first principles: exact per-dim bounds, the
    // encode+reconstruct composed as one expression with the same
    // IEEE shape ((x−mn)/(mx−mn)·255 floored, then mn + c·(mx−mn)/255;
    // constant dims pass through as mn), cosine rank over dequantized
    // corpus vs raw queries
    "s12_sq8_ann" ->
      s"""WITH dims AS (SELECT i,
            MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
            MAX(CAST(embedding[i] AS DOUBLE)) AS mx
          FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
          GROUP BY i),
          b AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
            FROM dims),
          deq AS (SELECT vec_id, list_transform(range(1, 65), i ->
              CASE WHEN mxs[i] = mns[i] THEN mns[i]
                ELSE mns[i] + FLOOR((CAST(embedding[i] AS DOUBLE) - mns[i])
                  / (mxs[i] - mns[i]) * 255.0) * (mxs[i] - mns[i]) / 255.0
              END) AS cv
            FROM embeddings CROSS JOIN b),
          q AS (SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < 5),
          c AS (SELECT vec_id AS neighbor_id, cv FROM deq),
          scored AS (SELECT query_id, neighbor_id,
            $dotSql / ($normQ * $normC) AS cos
          FROM q CROSS JOIN c WHERE neighbor_id <> query_id),
          ranked AS (SELECT query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored)
          SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 3""",

    // the materialized-index serving path computes the identical
    // ranking (the index holds exactly the encode pass's rows), so the
    // same from-first-principles oracle gates it
    "s08_ann_ivfpq_index" -> ivfPqOracle,

    // the incrementally-appended index must serve the identical
    // full-corpus result — the oracle is s08's, shared
    "s18_ann_index_append" -> ivfPqOracle,

    // s06's cell CTEs, with the encode/ADC inputs replaced by
    // residuals v − centroid[cell]; the residual is built in DOUBLE on
    // both sides (exact float→double casts), and the query residual is
    // recomputed per probed cell exactly as the Spark plan does
    "s07_ann_ivfpq_residual" ->
      s"""WITH cent AS (SELECT cell, centroid AS cv
            FROM read_parquet('$IvfCentroidsPath/*.parquet')),
          cb AS (SELECT sub, code, centroid
            FROM read_parquet('$ResidualCodebookPath/*.parquet')),
          v AS (SELECT vec_id, embedding AS qv FROM embeddings),
          scoredc AS (SELECT vec_id, cell, $dotSql / ($normQ * $normC) AS cdot
            FROM v CROSS JOIN cent),
          rankedc AS (SELECT vec_id, cell,
              ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cdot DESC, cell ASC) AS crank
            FROM scoredc),
          corpus_cell AS (SELECT vec_id, cell FROM rankedc WHERE crank = 1),
          query_cells AS (SELECT vec_id, cell FROM rankedc
            WHERE crank <= 3 AND vec_id < 5),
          crv AS (SELECT e.vec_id, cc.cell,
              list_transform(range(1, len(e.embedding) + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) - CAST(ct.cv[i] AS DOUBLE)) AS rv
            FROM embeddings e
            JOIN corpus_cell cc ON cc.vec_id = e.vec_id
            JOIN cent ct ON ct.cell = cc.cell),
          sv AS (SELECT vec_id, s2.sub,
              list_slice(rv, s2.sub * 16 + 1, s2.sub * 16 + 16) AS x
            FROM crv CROSS JOIN (SELECT DISTINCT sub FROM cb) s2),
          encd AS (SELECT sv.vec_id, sv.sub, cb.code,
              ${d2Sql("sv.x", "cb.centroid")} AS dd
            FROM sv JOIN cb ON cb.sub = sv.sub),
          codes AS (SELECT vec_id, sub, code FROM (
              SELECT vec_id, sub, code,
                ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                  ORDER BY dd ASC, code ASC) AS rn
              FROM encd) t WHERE rn = 1),
          qrv AS (SELECT qc.vec_id AS query_id, qc.cell,
              list_transform(range(1, len(e.embedding) + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) - CAST(ct.cv[i] AS DOUBLE)) AS qv
            FROM query_cells qc
            JOIN embeddings e ON e.vec_id = qc.vec_id
            JOIN cent ct ON ct.cell = qc.cell),
          cand AS (SELECT qrv.query_id, qrv.qv, cc.vec_id AS neighbor_id
            FROM qrv JOIN corpus_cell cc USING (cell)
            WHERE cc.vec_id <> qrv.query_id),
          psub AS (SELECT cand.query_id, cand.neighbor_id, c.sub,
              ${d2Sql("list_slice(cand.qv, c.sub * 16 + 1, c.sub * 16 + 16)", "cb.centroid")} AS dd
            FROM cand
            JOIN codes c ON c.vec_id = cand.neighbor_id
            JOIN cb ON cb.sub = c.sub AND cb.code = c.code),
          adc AS (SELECT query_id, neighbor_id,
              list_aggregate(list(dd ORDER BY sub), 'sum') AS adc
            FROM psub GROUP BY 1, 2),
          rankedq AS (SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY adc ASC, neighbor_id ASC) AS rank
            FROM adc)
          SELECT query_id, rank, neighbor_id FROM rankedq WHERE rank <= 3""",

    "m03_frame_sample" -> {
      def b(j: Int) = s"CAST('0x' || substr(m, ${2 * j + 1}, 2) AS BIGINT)"
      s"""WITH f AS (SELECT doc_id AS id, unnest(range(0, 4)) AS frame_idx, text
            FROM documents),
          h AS (SELECT id, frame_idx,
              md5(text || '#' || CAST(frame_idx AS VARCHAR)) AS m FROM f)
          SELECT id, CAST(frame_idx AS INT) AS frame_idx,
            CAST(64 + (${b(0)} % 192) AS INT) AS frame_w,
            CAST(64 + (${b(1)} % 192) AS INT) AS frame_h,
            CAST(${(0 until 8).map(j => s"${j + 1} * ${b(j + 2)}").mkString(" + ")}
              AS BIGINT) AS frame_fp
          FROM h"""
    },

    // the PNGs are generated with width = 1 + n_chars % 64 and height
    // = 1 + 7·n_chars % 64; Spark's result carries what javax.imageio
    // DECODED from the bytes, so matching this recomputation proves
    // the decoder recovered the true raster dimensions
    "m02_media_decode" ->
      s"""SELECT doc_id AS id,
            CAST(1 + (n_chars % 64) AS INT) AS width,
            CAST(1 + ((n_chars * 7) % 64) AS INT) AS height,
            CAST((1 + (n_chars % 64)) * (1 + ((n_chars * 7) % 64)) AS INT) AS n_pixels
          FROM documents""",

    // per-parity geometry rules: a mis-routed payload would decode to
    // stub dims (>= 64) and miss these exactly
    "m10_codec_route" ->
      s"""SELECT doc_id AS id,
            CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS codec,
            CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + (n_chars % 64)
                 ELSE 1 + (n_chars % 56) END AS INT) AS width,
            CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + ((n_chars * 7) % 64)
                 ELSE 1 + ((n_chars * 11) % 56) END AS INT) AS height
          FROM documents""",

    // the dHash replayed pixel-by-pixel from the synthesis rule (PNG
    // is lossless): any codec defect flips gradient-sign bits
    "m11_phash" ->
      s"""WITH $PhashSql
          SELECT doc_id AS id, w AS width, h AS height, dh_hi, dh_lo
          FROM ph""",

    // plain ALL-PAIRS Hamming <= 2 over the replayed hashes — the
    // Spark side goes through the banded self-join, so the match also
    // proves the 4x16-bit banding is complete (pigeonhole)
    "d14_phash_pairs" ->
      s"""WITH $PhashSql
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.dh_hi, b.dh_hi)) +
                 bit_count(xor(a.dh_lo, b.dh_lo)) AS INT) AS hamming
          FROM ph a JOIN ph b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.dh_hi, b.dh_hi)) +
                bit_count(xor(a.dh_lo, b.dh_lo)) <= 2""",

    // the d14 pair list transitively closed with a recursive CTE —
    // the d05 component discipline on the image leg
    "d15_phash_clusters" ->
      s"""WITH RECURSIVE $PhashSql,
          pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM ph a JOIN ph b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.dh_hi, b.dh_hi)) +
                  bit_count(xor(a.dh_lo, b.dh_lo)) <= 2),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
          SELECT src AS doc_id, LEAST(src, MIN(dst)) AS rep
          FROM reach GROUP BY src""",

    // d15's components applied: reps and loners keep, members drop —
    // recounted per source (the d10 oracle shape on the ph pair list)
    "d16_phash_apply" ->
      s"""WITH RECURSIVE $PhashSql,
          pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM ph a JOIN ph b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.dh_hi, b.dh_hi)) +
                  bit_count(xor(a.dh_lo, b.dh_lo)) <= 2),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
          m AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS rep
            FROM reach GROUP BY src)
          SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_imgs,
            CAST(SUM(CASE WHEN m.rep IS NULL OR m.rep = d.doc_id
              THEN 1 ELSE 0 END) AS BIGINT) AS kept,
            CAST(SUM(CASE WHEN m.rep IS NOT NULL AND m.rep <> d.doc_id
              THEN 1 ELSE 0 END) AS BIGINT) AS dropped
          FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
          GROUP BY d.source""",

    // the envelope hash replayed sample-by-sample from the WAV
    // synthesis rule (PCM is lossless): any decode defect shifts a
    // frame energy and flips gradient-sign bits
    "m12_audio_fp" ->
      s"""WITH ${audioFpSql()}
          SELECT doc_id AS id, sample_rate, n_samples, af_hi, af_lo
          FROM af""",

    // the 2x decimation replayed from the WAV synthesis rule: kept
    // sample j is input sample 2j, so the amplitude sum is exact
    "m13_audio_resample" ->
      """SELECT doc_id AS id,
           CAST((8000 + (n_chars % 8) * 1000) // 2 AS INT) AS sample_rate,
           CAST((n + 1) // 2 AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(range(0, (n + 1) // 2), j ->
             CASE WHEN tl = 0 THEN 0
               ELSE CAST(ord(substr(text, CAST((2 * j) % tl AS INT) + 1, 1))
                 AS BIGINT) END)) AS BIGINT) AS amp_sum
         FROM (SELECT doc_id, text, length(text) AS tl,
             500 + n_chars % 1000 AS n, n_chars
           FROM documents)""",

    // MP4 fields replay the synthesis rule: the Spark side carries
    // what the box walk PARSED from the re-read container, so a
    // match proves the real ISO-BMFF encode/parse chain; n_boxes is
    // always ftyp+moov+mdat = 3, proving the top-level walk counted
    "m14_mp4_meta" ->
      """SELECT doc_id AS id,
           CAST(600 + (n_chars % 10) * 60 AS INT) AS timescale,
           CAST(1000 + n_chars % 5000 AS BIGINT) AS duration,
           CAST((1000 + n_chars % 5000) * 1000 //
             (600 + (n_chars % 10) * 60) AS BIGINT) AS duration_ms,
           CAST(16 + n_chars % 320 AS INT) AS width,
           CAST(16 + (n_chars * 7) % 240 AS INT) AS height,
           CAST(3 AS INT) AS n_boxes,
           CAST(strlen(text) AS BIGINT) AS mdat_bytes
         FROM documents""",

    // plain ALL-PAIRS Hamming <= 2 over the replayed audio hashes of
    // the planted-duplicate corpus — the Spark side goes through the
    // shared banded self-join, so the match also proves the 4x16-bit
    // banding is complete on this leg
    "d17_audio_fp_pairs" ->
      s"""WITH $PlantAudioDupsSql, ${audioFpSql("adup")}
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.af_hi, b.af_hi)) +
                 bit_count(xor(a.af_lo, b.af_lo)) AS INT) AS hamming
          FROM af a JOIN af b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.af_hi, b.af_hi)) +
                bit_count(xor(a.af_lo, b.af_lo)) <= 2""",

    // the d17 pair list transitively closed with a recursive CTE —
    // the component discipline on the audio leg
    "d20_audio_fp_clusters" ->
      s"""WITH RECURSIVE $PlantAudioDupsSql, ${audioFpSql("adup")},
          pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM af a JOIN af b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.af_hi, b.af_hi)) +
                  bit_count(xor(a.af_lo, b.af_lo)) <= 2),
          edges AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
          reach(src, dst) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
          SELECT src AS doc_id, LEAST(src, MIN(dst)) AS rep
          FROM reach GROUP BY src""",

    // the three modality legs replayed over the planted corpus —
    // exact text via the fingerprint join, image/audio via the shared
    // dHash/envelope synthesis CTEs parametrized on xm — then the
    // per-pair union/HAVING >= 2 verdict
    "d21_crossmodal_dupes" ->
      s"""WITH $PlantCrossModalSql,
          ${phashSql("xm")},
          ${audioFpSql("xm")},
          tp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM xm a JOIN xm b
            ON md5(lower(trim(a.text))) = md5(lower(trim(b.text)))
              AND a.doc_id < b.doc_id),
          ip AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM ph a JOIN ph b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.dh_hi, b.dh_hi)) +
                  bit_count(xor(a.dh_lo, b.dh_lo)) <= 2),
          ap AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM af a JOIN af b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.af_hi, b.af_hi)) +
                  bit_count(xor(a.af_lo, b.af_lo)) <= 2),
          u AS (SELECT id_a, id_b, 1 AS t, 0 AS i, 0 AS au FROM tp
            UNION ALL SELECT id_a, id_b, 0, 1, 0 FROM ip
            UNION ALL SELECT id_a, id_b, 0, 0, 1 FROM ap)
          SELECT id_a, id_b,
            CAST(max(t) AS INT) AS in_text,
            CAST(max(i) AS INT) AS in_image,
            CAST(max(au) AS INT) AS in_audio,
            CAST(max(t) + max(i) + max(au) AS INT) AS n_modalities
          FROM u GROUP BY 1, 2
          HAVING max(t) + max(i) + max(au) >= 2""",

    // integer ppm share (// is DuckDB bigint division, matching
    // Spark's `div`); pair_work in exact bigint arithmetic
    "d22_block_stats" ->
      s"""WITH c AS (SELECT source, lang, count(*) AS n_docs
            FROM documents GROUP BY 1, 2),
          t AS (SELECT count(*) AS total FROM documents)
          SELECT source, lang, n_docs,
            (n_docs * 1000000) // total AS share_ppm,
            CAST(ceil(CAST(n_docs AS DOUBLE) / 4096) AS INT) AS sub_blocks,
            (n_docs * (n_docs - 1)) // 2 AS pair_work
          FROM c, t""",

    // JPEGs are generated at (1 + n%56) × (1 + 11n%56); the codec is
    // lossy so only the geometry replays — Spark's result carries what
    // ImageIO DECODED from the re-read container, proving the encode →
    // sniff → DCT-decode chain end to end
    "m09_jpeg_decode" ->
      s"""SELECT doc_id AS id,
            CAST(1 + (n_chars % 56) AS INT) AS width,
            CAST(1 + ((n_chars * 11) % 56) AS INT) AS height,
            CAST((1 + (n_chars % 56)) * (1 + ((n_chars * 11) % 56)) AS INT) AS n_pixels
          FROM documents""",

    // GIFs are generated with frame_w = 1 + n_chars % 48, frame_h =
    // 1 + 7·n_chars % 48; Spark's result carries what ImageIO DECODED
    // from each sampled frame, so matching this recomputation proves
    // the sampler really seeks and decodes the container
    "m04_gif_frames" ->
      """SELECT doc_id AS id, CAST(unnest(range(0, 4)) AS INT) AS frame_idx,
            CAST(1 + (n_chars % 48) AS INT) AS frame_w,
            CAST(1 + ((n_chars * 7) % 48) AS INT) AS frame_h
          FROM documents""",

    // source PNGs are (1 + n%64) × (1 + 7n%64); the resize rule is
    // integer floor division into a 32-box, no upscale — the gated
    // dims come from DECODING the re-encoded payload, so this replay
    // matching proves the whole decode→scale→encode→decode chain
    "m07_image_resize" ->
      """WITH dims AS (
           SELECT doc_id,
             CAST(1 + (n_chars % 64) AS INT) AS w,
             CAST(1 + ((n_chars * 7) % 64) AS INT) AS h
           FROM documents),
         r AS (
           SELECT doc_id,
             CASE WHEN greatest(w, h) <= 32 THEN w
                  ELSE greatest(1, (w * 32) // greatest(w, h)) END AS nw,
             CASE WHEN greatest(w, h) <= 32 THEN h
                  ELSE greatest(1, (h * 32) // greatest(w, h)) END AS nh
           FROM dims)
         SELECT doc_id AS id, CAST(nw AS INT) AS width,
           CAST(nh AS INT) AS height, CAST(nw * nh AS INT) AS n_pixels
         FROM r""",

    // WAVs are generated at 8000 + (n%8)·1000 Hz with 500 + n%1000
    // samples taken cyclically from the text's bytes (ascii corpus:
    // ord == utf-8 byte; the empty/NULL-text guard mirrors the
    // generator's zero-fill branch); Spark's result carries what
    // javax.sound DECODED, so matching this recomputation proves the
    // header parse and the PCM read are faithful
    "m05_audio_decode" ->
      """SELECT doc_id AS id,
            CAST(8000 + (n_chars % 8) * 1000 AS INT) AS sample_rate,
            CAST(500 + (n_chars % 1000) AS BIGINT) AS n_samples,
            CASE WHEN text IS NULL OR length(text) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(list_aggregate(list_transform(
                range(0, 500 + (n_chars % 1000)),
                i -> ord(substr(text, CAST(i % length(text) AS INT) + 1, 1))),
                'sum') AS BIGINT) END AS amp_sum
          FROM documents""",

    // the m05 generation rule replayed for the quality stats: samples
    // are the text's bytes cyclically (ASCII contract: ord == byte),
    // so energy/peak/total-variation recompute from character codes
    "m08_audio_stats" ->
      """SELECT doc_id AS id,
            CAST(8000 + (n_chars % 8) * 1000 AS INT) AS sample_rate,
            CAST(500 + (n_chars % 1000) AS BIGINT) AS n_samples,
            CASE WHEN text IS NULL OR length(text) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(list_aggregate(list_transform(
                range(0, 500 + (n_chars % 1000)),
                i -> ord(substr(text, CAST(i % length(text) AS INT) + 1, 1))
                   * ord(substr(text, CAST(i % length(text) AS INT) + 1, 1))),
                'sum') AS BIGINT) END AS sq_sum,
            CASE WHEN text IS NULL OR length(text) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(list_aggregate(list_transform(
                range(0, 500 + (n_chars % 1000)),
                i -> ord(substr(text, CAST(i % length(text) AS INT) + 1, 1))),
                'max') AS BIGINT) END AS peak,
            CASE WHEN text IS NULL OR length(text) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(COALESCE(list_aggregate(list_transform(
                range(1, 500 + (n_chars % 1000)),
                i -> abs(ord(substr(text, CAST(i % length(text) AS INT) + 1, 1))
                   - ord(substr(text, CAST((i - 1) % length(text) AS INT) + 1, 1)))),
                'sum'), 0) AS BIGINT) END AS tv
          FROM documents""",

    // stereo WAVs carry 300 + n%500 frames with left_i = 3·b_i + 7 and
    // right_i = 1000 − 2·b_i (b cyclic over the text's bytes, 0 when
    // empty); Spark's result carries what javax.sound DECODED and the
    // per-channel sums it deinterleaved, so matching this recomputation
    // proves the 16-bit LE stereo frame walk is faithful
    "m06_wav_stereo" ->
      """SELECT doc_id AS id,
            CAST(8000 + (n_chars % 8) * 1000 AS INT) AS sample_rate,
            CAST(300 + (n_chars % 500) AS BIGINT) AS n_frames,
            CASE WHEN text IS NULL OR length(text) = 0
              THEN CAST(7 * (300 + (n_chars % 500)) AS BIGINT)
              ELSE CAST(list_aggregate(list_transform(
                range(0, 300 + (n_chars % 500)),
                i -> 3 * ord(substr(text, CAST(i % length(text) AS INT) + 1, 1)) + 7),
                'sum') AS BIGINT) END AS amp_l,
            CASE WHEN text IS NULL OR length(text) = 0
              THEN CAST(1000 * (300 + (n_chars % 500)) AS BIGINT)
              ELSE CAST(list_aggregate(list_transform(
                range(0, 300 + (n_chars % 500)),
                i -> 1000 - 2 * ord(substr(text, CAST(i % length(text) AS INT) + 1, 1))),
                'sum') AS BIGINT) END AS amp_r
          FROM documents"""
  )
}
