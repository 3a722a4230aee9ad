package graft.server

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** JDBC/ODBC endpoint for the graft SQL dialect — the Spark-native
  * form of the reference's thrift server (reference
  * integration/spark/.../thriftserver/CarbonThriftServer.scala:28-55,
  * which starts HiveThriftServer2 over a CarbonContext so BI tools
  * reach the cube dialect over HiveServer2's wire protocol).
  *
  * Here the session carries [[graft.sql.GraftSqlExtensions]], so every
  * graft statement — CREATE/LOAD (incl. FACT/DIMENSION star ingest),
  * DML, segment commands, aggregate-table DDL, and `graft_table(...)`
  * time travel — is reachable from any Hive-JDBC/beeline client.
  * Per-connection sessions are clones of the root session and inherit
  * the injected parser/rules/functions, so concurrent clients see the
  * same store with isolated temp views.
  *
  * Scale note: the server is a pure front end — statements plan and
  * execute on the cluster exactly as API calls do; nothing result-
  * sized accumulates on the server beyond the rows a client fetches
  * (use `spark.sql.thriftServer.incrementalCollect=true` for
  * streaming fetches of large results).
  */
object GraftThriftServer {

  /** Start the thrift service on `port` bound to the given session.
    * Returns after the service is up (HiveThriftServer2 runs its own
    * daemon threads). `bindHost` defaults to loopback — the safe
    * single-node default — and a cluster deployment passes the edge
    * node's address (or "0.0.0.0") so remote BI clients can connect
    * (also settable as the second CLI arg / GRAFT_THRIFT_BIND_HOST
    * for the standalone main).
    */
  def start(spark: SparkSession, port: Int,
            bindHost: String = "localhost"): Unit = {
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", bindHost)
    // one executor pool per server; results stream to the client
    spark.sqlContext.setConf("hive.server2.transport.mode", "binary")
    HiveThriftServer2.startWithContext(spark.sqlContext)
  }

  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(10000)
    val bindHost = args.lift(1)
      .orElse(sys.env.get("GRAFT_THRIFT_BIND_HOST"))
      .getOrElse("localhost")
    val spark = SparkSession.builder()
      .appName("graft-thrift-server")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.sql.GraftSqlExtensions)
      .getOrCreate()
    start(spark, port, bindHost)
    // keep the driver alive for the daemon service
    Thread.currentThread().join()
  }
}
