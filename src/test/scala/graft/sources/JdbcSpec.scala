package graft.sources

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JDBC source parity (reference JdbcResultSetRDD, SURVEY.md §2.1):
  * Spark's built-in jdbc reader against an embedded Derby database —
  * the external-RDBMS ingest path with predicate pushdown to SQL.
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:grafttest;create=true"

  test("read an external RDBMS table through spark.read.jdbc") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE dim_status (code VARCHAR(2) PRIMARY KEY, label VARCHAR(32))")
      Seq("F" -> "finished", "O" -> "open", "P" -> "pending").foreach {
        case (c, l) => st.executeUpdate(
          s"INSERT INTO dim_status VALUES ('$c', '$l')")
      }
    } finally conn.close()

    val df = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "dim_status")
      .load()
    assert(df.count() == 3)
    assert(df.filter(org.apache.spark.sql.functions.col("CODE") === "O")
      .head().getString(1) == "open")

    // the classic pattern: JDBC dim table broadcast-joined to the fact
    val o = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
    val joined = o.join(
      org.apache.spark.sql.functions.broadcast(df),
      o("o_orderstatus") === df("CODE"))
    assert(joined.count() == o.count())
  }
}
