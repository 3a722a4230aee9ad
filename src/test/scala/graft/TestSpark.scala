package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for ALL suites — a JVM has one
  * SparkContext, so no suite may stop it, and extension-dependent
  * suites share the same builder (extensions apply only at session
  * creation).
  */
object TestSpark {
  val store: String =
    java.nio.file.Files.createTempDirectory("graft_store").toString
  val mvStore: String =
    java.nio.file.Files.createTempDirectory("graft_mv").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // Plan-pin suites match fixture paths inside FileScan Location
    // strings; the default 100-char truncation cuts pid-scoped
    // RunRoot paths mid-name (r14 regression: 4 red pins).
    .config("spark.sql.maxMetadataStringLength", "1000")
    .config("spark.graft.store", store)
    .config("spark.graft.mv.store", mvStore)
    .config("spark.sql.catalog.graft", "graft.sql.GraftCatalogPlugin")
    .withExtensions(new graft.sql.GraftSqlExtensions)
    .withExtensions(e => e.injectOptimizerRule(s => graft.mv.AggTableRewrite(s)))
    .withExtensions(e => e.injectOptimizerRule(s => graft.mv.StatsAggFromCatalog(s)))
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"
}
