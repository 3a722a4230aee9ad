package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The document-chunking surface (t50): window/stride semantics,
  * full coverage (no token left un-chunked), overlap, and the tail
  * rules that decide whether the last words of every document make it
  * into the retrieval index.
  */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fn = PipelineQueries.queries("t50_doc_chunks")

  private def chunksOf(nTokens: Int): Seq[(Int, Int, Int, String)] = {
    val text = (0 until nTokens).map(i => s"w$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("chunkspec").toString
    Seq((1L, text, "en", "src", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = fn(spark, dir).orderBy("chunk_idx").collect()
    rows.map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toSeq
  }

  test("64/48 window rule: starts, lengths, tail reaches the end") {
    // n = 100: chunk 1's window (48..99) already reaches the end, so
    // there is no start at 96 — a redundant 4-token sub-chunk an
    // index would score twice
    val c = chunksOf(100)
    assert(c.map(x => (x._1, x._2, x._3)) == Seq((0, 0, 64), (1, 48, 52)))
    assert(c(1)._4.endsWith("w98 w99") && c(1)._4.startsWith("w48 w49"))
  }

  test("chunks cover every token and consecutive full chunks overlap by 16") {
    val c = chunksOf(200)
    assert(c.map(x => (x._1, x._2, x._3)) ==
      Seq((0, 0, 64), (1, 48, 64), (2, 96, 64), (3, 144, 56)))
    val covered = c.flatMap(x => x._2 until (x._2 + x._3)).toSet
    assert(covered == (0 until 200).toSet, "every token index must be chunked")
    // consecutive FULL chunks share window - stride = 16 tokens
    val full = c.filter(_._3 == 64)
    full.sliding(2).foreach {
      case Seq(a, b) =>
        val overlap = (a._2 until a._2 + 64).toSet
          .intersect((b._2 until b._2 + 64).toSet)
        assert(overlap.size == 16, s"overlap was ${overlap.size}")
      case _ =>
    }
  }

  test("documents up to one window long yield exactly one whole-document chunk") {
    val c = chunksOf(5)
    assert(c == Seq((0, 0, 5, "w0 w1 w2 w3 w4")))
    assert(chunksOf(64).map(x => (x._1, x._2, x._3)) == Seq((0, 0, 64)))
  }

  test("the first token past one window forces a second chunk (boundary: n = 65)") {
    val c = chunksOf(65)
    assert(c.map(x => (x._1, x._2, x._3)) == Seq((0, 0, 64), (1, 48, 17)))
  }

  test("blank and whitespace-only documents yield no chunks at all") {
    // tokens('') is [""], which passes a bare size > 0 check — a
    // blank doc must not land a phantom empty retrieval unit
    val dir = java.nio.file.Files.createTempDirectory("chunkspec").toString
    Seq((1L, "", "en", "src", 0L),
        (2L, "   \t  ", "en", "src", 6L),
        (3L, "one real doc", "en", "src", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = fn(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L))
    assert(rows.head.getString(4) == "one real doc")
  }
}
