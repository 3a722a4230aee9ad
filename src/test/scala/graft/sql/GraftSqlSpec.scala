package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end SQL command surface over an extensions-enabled session.
  * Needs its own SparkSession (withExtensions), separate from
  * TestSpark's shared one.
  */
class GraftSqlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var store: String = _

  override def beforeAll(): Unit = {
    store = Files.createTempDirectory("graft_store").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-sql-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.store", store)
      .withExtensions(new GraftSqlExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("full DDL/DML lifecycle through SQL") {
    val sf = "/root/testdata/sf0.001"
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("nation_src")

    spark.sql("CREATE GRAFT TABLE nations TBLPROPERTIES('sort_columns'='n_nationkey') " +
      "AS SELECT * FROM nation_src")
    assert(spark.sql("SELECT count(*) FROM nations").head().getLong(0) == 25)

    // append a second segment from a parquet path
    spark.sql(s"LOAD GRAFT DATA INPATH '$sf/nation.parquet' INTO TABLE nations")
    assert(spark.sql("SELECT count(*) FROM nations").head().getLong(0) == 50)

    val segs = spark.sql("SHOW GRAFT SEGMENTS FOR nations").collect()
    assert(segs.length == 2 && segs.forall(_.getString(1) == "SUCCESS"))

    spark.sql("COMPACT GRAFT TABLE nations")
    val afterCompact = spark.sql("SHOW GRAFT SEGMENTS FOR nations").collect()
    assert(afterCompact.count(_.getString(1) == "SUCCESS") == 1)
    assert(afterCompact.count(_.getString(1) == "COMPACTED") == 2)

    spark.sql("CLEAN GRAFT FILES FOR nations")
    assert(spark.sql("SHOW GRAFT SEGMENTS FOR nations").collect().length == 1)

    // segment delete then count via a re-registered view
    spark.sql(s"LOAD GRAFT DATA INPATH '$sf/nation.parquet' INTO TABLE nations")
    val ids = spark.sql("SHOW GRAFT SEGMENTS FOR nations").collect()
      .filter(_.getString(1) == "SUCCESS").map(_.getInt(0))
    spark.sql(s"DELETE GRAFT SEGMENT ${ids.max} FROM nations")
    spark.sql(s"LOAD GRAFT DATA INPATH '$sf/nation.parquet' INTO TABLE nations")
    assert(spark.sql("SELECT count(*) FROM nations").head().getLong(0) == 75)

    spark.sql("DROP GRAFT TABLE nations")
    assert(!graft.table.SegmentedTable.exists(s"$store/nations"))

    // non-graft SQL still parses through the delegate
    assert(spark.sql("SELECT 1 + 1 AS x").head().getInt(0) == 2)
  }
}
