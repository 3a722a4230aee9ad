package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("add column with default: old segments filled, new segments store it") {
    val root = Files.createTempDirectory("graft_evo").resolve("t").toString
    val n = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val t0 = SegmentedTable.create(spark, root, n.schema, Map.empty)
    t0.load(n)

    val t1 = t0.addColumn("n_comment", org.apache.spark.sql.types.StringType,
      default = Some("none"))
    // old segment: default fills
    val r = t1.readWithDefaults()
    assert(r.columns.contains("n_comment"))
    assert(r.filter(col("n_comment") === "none").count() == 25)

    // new load carries real values
    t1.load(n.withColumn("n_comment", concat(lit("c_"), col("n_name"))))
    val all = t1.readWithDefaults()
    assert(all.count() == 50)
    assert(all.filter(col("n_comment") === "none").count() == 25)
    assert(all.filter(col("n_comment").startsWith("c_")).count() == 25)

    // reopen sees evolved schema
    val reopened = SegmentedTable.open(spark, root)
    assert(reopened.schema.fieldNames.contains("n_comment"))

    // drop hides it everywhere
    val t2 = reopened.dropColumn("n_comment")
    assert(!t2.read().columns.contains("n_comment"))
    assert(t2.read().count() == 50)
  }

  test("defaults are the DEFAULT read path: plain read()/scan()/SQL answer evolved tables") {
    val root = Files.createTempDirectory("graft_evo2").resolve("t").toString
    val n = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val t0 = SegmentedTable.create(spark, root, n.schema, Map.empty)
    t0.load(n)
    val t1 = t0.addColumn("tier", org.apache.spark.sql.types.IntegerType,
      default = Some("7"))
    t1.load(n.withColumn("tier", lit(1)))

    // plain read(): the caller never asked for defaults and still gets them
    assert(t1.read().filter(col("tier") === 7).count() == 25)
    assert(t1.read().filter(col("tier") === 1).count() == 25)
    // scan(): pruned path fills defaults too (and the predicate can
    // reference the defaulted column — old segments have no stats for
    // it, so pruning keeps them and the residual filter sees 7, not null)
    assert(t1.scan(col("tier") === 7).count() == 25)
    // a reopened handle through plain SQL answers the same
    SegmentedTable.open(spark, root).read().createOrReplaceTempView("evo_sql")
    assert(spark.sql("SELECT count(*) FROM evo_sql WHERE tier = 7").head().getLong(0) == 25)
    // time travel to the pre-evolution commit still works (column was
    // added later; snapshot read carries the evolved schema + default)
    val firstLoad = SegmentedTable.open(spark, root).versions.sorted.apply(1)
    val asOf = SegmentedTable.open(spark, root).readAsOf(firstLoad)
    assert(asOf.filter(col("tier") === 7).count() == 25)
  }
}
