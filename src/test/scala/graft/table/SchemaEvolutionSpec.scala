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

  test("segment pruning never drops default-filled rows (stats describe files, not reads)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_evo3").resolve("t").toString
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val t0 = SegmentedTable.create(spark, root, base.schema, Map.empty)
    t0.load(base) // segment 0: written before the column existed
    val t = t0.addColumn("tier", org.apache.spark.sql.types.IntegerType,
      default = Some("7"))
    // segment 1: all physical NULLs (reads as 7)
    t.load(Seq((3L, "c"), (4L, "d")).toDF("k", "v")
      .withColumn("tier", lit(null).cast("int")))
    // segment 2: mixed — real 5 plus a NULL that reads as 7; its
    // min/max (5..5) excludes the default, only nullCounts>0 saves it
    t.load(Seq((5L, "e", Integer.valueOf(5)), (6L, "f", null.asInstanceOf[Integer]))
      .toDF("k", "v", "tier"))
    // segment 3: real 5s, zero nulls — the one segment pruning MAY drop
    t.load(Seq((7L, "g", Integer.valueOf(5)), (8L, "h", Integer.valueOf(5)))
      .toDF("k", "v", "tier"))

    // equality on the default value: 0 (no tier stats), 1 (all null),
    // 2 (nulls>0) must survive; 3 (no nulls, range excludes 7) may go
    val eqIds = t.pruneSegments(col("tier") === 7).map(_.id)
    assert(eqIds.contains(0) && eqIds.contains(1) && eqIds.contains(2), s"kept: $eqIds")
    assert(!eqIds.contains(3), s"segment 3 holds no row reading 7, kept: $eqIds")
    assert(t.scan(col("tier") === 7).count() == 5)

    // IS NOT NULL: the all-null segment's rows read as 7 — unprunable
    assert(t.pruneSegments(col("tier").isNotNull).map(_.id).contains(1))
    assert(t.scan(col("tier").isNotNull).count() == 8)

    // range predicate satisfied only by the default (7 > 6): segments
    // that may hold nulls survive, the provably-all-5 one is pruned
    val gtIds = t.pruneSegments(col("tier") > 6).map(_.id)
    assert(gtIds.contains(1) && gtIds.contains(2) && !gtIds.contains(3), s"kept: $gtIds")
    assert(t.scan(col("tier") > 6).count() == 5)
    // IN over the default composes the same way
    assert(t.pruneSegments(col("tier").isin(7, 99)).map(_.id).contains(2))
    assert(t.scan(col("tier").isin(7, 99)).count() == 5)
    // real stored values still prune normally and read exactly
    assert(t.scan(col("tier") === 5).count() == 3)
  }
}
