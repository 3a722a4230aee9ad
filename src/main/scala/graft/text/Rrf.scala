package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * combine ranked lists from heterogeneous retrieval systems (a
  * lexical BM25 index, a vector ANN index, ...) without score
  * calibration — each system contributes 1/(c + rank) per document,
  * and documents surfacing in several lists accumulate.
  *
  * The contribution is computed as the exact integer
  * `10^9 div (c + rank)` (parts-per-billion), so fused scores and the
  * resulting order replay bit-exact on any engine — the same
  * no-float-logs discipline as the BM25 ppm scores.
  *
  * Scale: every input is already a top-k result (|queries| × k rows,
  * never corpus-sized), the fusion joins are keyed on the id, and the
  * final top-k is a TakeOrderedAndProject — the fusion layer adds no
  * corpus-sized work to the underlying searches.
  */
object Rrf {

  /** Integer RRF contribution for a rank held in column `rankName`
    * (SQL `div`, never float division — Spark's `/` on longs widens
    * to double, whose rounding this figure must not depend on).
    */
  def contribution(rankName: String, c: Int): Column =
    expr(s"CAST(1000000000 DIV ($c + CAST(`$rankName` AS BIGINT)) AS BIGINT)")

  /** Fuse named ranked lists. Each input df must carry `idCol` and a
    * `rank` column (1-based, as every topK/serve here emits), with at
    * most one row per id — a malformed list carrying duplicate ids
    * would multiply through the fusion join, exactly as it would
    * corrupt any downstream consumer of that result. Output: idCol,
    * one `<name>_rank` column per list (null = absent from that
    * list), and `rrf_ppb` = the summed integer contributions,
    * restricted to the fused top-k (ties broken by id ascending).
    */
  def fuse(lists: Seq[(String, DataFrame)], idCol: String,
           c: Int = 60, k: Int = 10): DataFrame = {
    require(lists.nonEmpty, "at least one ranked list required")
    require(c >= 0, s"rank offset c must be >= 0, got $c")
    require(k >= 1, s"k must be positive, got $k")
    require(lists.map(_._1).distinct.size == lists.size,
      "list names must be unique")
    lists.foreach { case (name, _) =>
      require(name.matches("[A-Za-z][A-Za-z0-9_]*"),
        s"list name must be identifier-safe, got '$name'")
    }
    val sides = lists.map { case (name, df) =>
      df.select(col(idCol), col("rank").as(s"${name}_rank"))
        .withColumn(s"__c_$name", contribution(s"${name}_rank", c))
    }
    val joined = sides.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = lists.map { case (name, _) =>
      coalesce(col(s"__c_$name"), lit(0L))
    }.reduce(_ + _)
    joined
      .withColumn("rrf_ppb", score)
      .orderBy(col("rrf_ppb").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol) +:
        lists.map { case (name, _) => col(s"${name}_rank") } :+
        col("rrf_ppb"): _*)
  }
}
