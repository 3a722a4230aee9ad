package graft.server

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end wire-protocol check: start the thrift service on the
  * shared session, connect with the stock Hive JDBC driver, and run
  * graft-dialect statements over the wire — the reference's
  * CarbonThriftServer usage shape (beeline → HiveServer2 → cube SQL).
  */
class ThriftServerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("graft SQL is reachable over Hive JDBC") {
    val sf = "/root/testdata/sf0.001"
    spark.read.parquet(s"$sf/region.parquet")
      .createOrReplaceTempView("thrift_region_src")
    spark.sql("CREATE GRAFT TABLE thrift_regions AS SELECT * FROM thrift_region_src")

    val port = freePort()
    GraftThriftServer.start(spark, port)

    // the service binds asynchronously; poll until it accepts
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val url = s"jdbc:hive2://localhost:$port/default"
    val conn = {
      var c: java.sql.Connection = null
      var attempts = 0
      while (c == null) {
        try c = DriverManager.getConnection(url, "anonymous", "")
        catch {
          case e: Exception =>
            attempts += 1
            if (attempts > 60) throw e
            Thread.sleep(500)
        }
      }
      c
    }
    try {
      val st = conn.createStatement()

      // plain SQL over the wire
      val r1 = st.executeQuery("SELECT 1 + 1 AS x")
      assert(r1.next() && r1.getInt("x") == 2)

      // graft dialect: the per-connection session inherits the parser
      val r2 = st.executeQuery(
        "SELECT count(*) AS c FROM graft_table('thrift_regions')")
      assert(r2.next() && r2.getLong("c") == 5L)

      st.execute(
        s"LOAD GRAFT DATA INPATH '$sf/region.parquet' INTO TABLE thrift_regions")
      val r3 = st.executeQuery(
        "SELECT count(*) AS c FROM graft_table('thrift_regions')")
      assert(r3.next() && r3.getLong("c") == 10L)

      // segment metadata commands round-trip too
      val r4 = st.executeQuery("SHOW GRAFT SEGMENTS FOR thrift_regions")
      var segs = 0
      while (r4.next()) segs += 1
      assert(segs == 2)
    } finally {
      conn.close()
      spark.sql("DROP GRAFT TABLE thrift_regions")
    }
  }
}
