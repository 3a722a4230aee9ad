package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document chunking — fixed token windows with stride, the
  * embedding/RAG preparation stage that turns documents into
  * retrievable units (t50). Pure plan constructor over any frame
  * with an id and a text column, shared by the t50 gate, the
  * `graft_chunk` SQL TVF, and the streaming leg (stateless in-row
  * work, so the same plan chunks a micro-batch).
  *
  * Window rule: chunk starts are k·stride for k = 0..K where K is
  * the smallest index whose window reaches the end (`(n - (window -
  * stride + 1)) div stride` for n > window, else 0) — every token
  * covered, `window - stride` tokens of overlap between consecutive
  * full chunks, and NO redundant fully-contained tail chunk (a
  * window-sized doc is one chunk, not one plus a sub-chunk an index
  * would score twice).
  *
  * Scale: in-row explode only — no shuffle; rows fan out ~n/stride
  * per doc and the wide text column is sliced, never duplicated
  * whole. Each chunk carries provenance (doc, index, start offset)
  * plus the 60-bit content fingerprint downstream chunk-dedup
  * ([[graft.queries.PipelineQueries]] d18) keys on.
  */
object Chunker {

  def chunk(docs: DataFrame, idCol: String, textCol: String,
            window: Int = 64, stride: Int = 48): DataFrame = {
    require(window >= 1, s"window must be positive, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got stride=$stride window=$window")
    // smallest k with k*stride + window >= n, as integer arithmetic
    val tail = window - stride + 1
    val toks = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("w"))
      .withColumn("n", size(col("w")))
      // `tokens` on a blank/whitespace-only text yields [""], which
      // would pass n > 0 and emit a phantom empty chunk per blank
      // doc — require a real first token (the oracle applies the
      // identical predicate). Caveat: `tokens` trims SPACES only, so
      // a doc whose text STARTS with a tab/newline also tokenizes to
      // ["", ...] and the whole doc is dropped here — DuckDB's trim
      // is space-only too, so both engines agree; callers feeding
      // tab-indented corpora should pre-normalize leading whitespace.
      .filter(col("n") > 0 && element_at(col("w"), 1) =!= "")
    toks.select(col("doc_id"), col("w"), col("n"),
        posexplode(expr(
          s"transform(sequence(0, CASE WHEN n <= $window THEN 0 ELSE " +
            s"CAST((n - $tail) DIV $stride AS INT) END), k -> k * $stride)"))
          .as(Seq("chunk_idx", "start_tok")))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("start_tok").cast("int").as("start_tok"),
        least(lit(window), col("n") - col("start_tok")).cast("int")
          .as("n_tokens"),
        chunkText(window).as("chunk_text"))
      .withColumn("chunk_h", TextFunctions.shingleBaseHash(col("chunk_text")))
  }

  private def chunkText(window: Int): Column =
    expr(s"array_join(slice(w, start_tok + 1, least($window, n - start_tok)), ' ')")
}
