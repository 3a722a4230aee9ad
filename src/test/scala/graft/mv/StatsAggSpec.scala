package graft.mv

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.table.SegmentedTable

/** Stats-answered global aggregates ([[StatsAggFromCatalog]]): the
  * unfiltered MIN/MAX/COUNT fold over the segment catalog must equal
  * the real scan exactly, collapse to a LocalRelation (zero executor
  * job), and bail conservatively whenever a segment's stats cannot
  * prove the answer.
  */
class StatsAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scansOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect { case l: LogicalRelation => l }

  private def freshRoot(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft_statsagg_$tag").resolve("t").toString

  test("min/max/count over two segments fold from the catalog with no scan") {
    val li = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
    val t = SegmentedTable.create(spark, freshRoot("mix"), li.schema, Map.empty)
    t.load(li.filter(col("l_orderkey") % 2 === 0))
    t.load(li.filter(col("l_orderkey") % 2 =!= 0))

    val q = t.read().agg(
      count(lit(1)).as("cnt"),
      count(col("l_returnflag")).as("cnt_rf"),
      min(col("l_extendedprice")).as("min_p"),
      max(col("l_extendedprice")).as("max_p"),
      min(col("l_shipdate")).as("min_s"),
      max(col("l_shipdate")).as("max_s"),
      min(col("l_returnflag")).as("min_rf"),
      max(col("l_linestatus")).as("max_ls"))
    assert(scansOf(q).isEmpty, q.queryExecution.optimizedPlan.toString)

    val want = li.agg(
      count(lit(1)), count(col("l_returnflag")),
      min(col("l_extendedprice")), max(col("l_extendedprice")),
      min(col("l_shipdate")), max(col("l_shipdate")),
      min(col("l_returnflag")), max(col("l_linestatus"))).head()
    assert(q.head() == want)
  }

  test("filtered / grouped / expression aggregates never use the fast path") {
    val n = spark.read.parquet(s"${TestSpark.sf}/nation.parquet")
    val t = SegmentedTable.create(spark, freshRoot("bail"), n.schema, Map.empty)
    t.load(n)
    val filtered = t.read().filter(col("n_nationkey") > 5)
      .agg(min(col("n_name")).as("m"))
    assert(scansOf(filtered).nonEmpty)
    val grouped = t.read().groupBy(col("n_regionkey"))
      .agg(max(col("n_nationkey")).as("m"))
    assert(scansOf(grouped).nonEmpty)
    val exprAgg = t.read().agg(min(col("n_nationkey") + 1).as("m"))
    assert(scansOf(exprAgg).nonEmpty)
    assert(exprAgg.head().getInt(0) == 1)
  }

  test("all-null column serves NULL min/max and zero non-null count") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType)))
    val t = SegmentedTable.create(spark, freshRoot("nulls"), schema, Map.empty)
    t.load(Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("k", "v"))
    val q = t.read().agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(col("v")).as("c"), count(lit(1)).as("n"))
    assert(scansOf(q).isEmpty, q.queryExecution.optimizedPlan.toString)
    val r = q.head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) == 0L && r.getLong(3) == 2L)
  }

  test("NaN double stats: single segment serves the exact NaN, a cross-segment fold bails") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType)))
    // one segment: no compare needed — the stored "NaN" string IS the
    // exact Spark answer (Spark orders NaN greater than everything)
    val t1 = SegmentedTable.create(spark, freshRoot("nan1"), schema, Map.empty)
    t1.load(Seq((1L, 2.5), (2L, Double.NaN), (3L, -7.0)).toDF("k", "v"))
    val q1 = t1.read().agg(max(col("v")).as("mx"), min(col("v")).as("mn"))
    assert(scansOf(q1).isEmpty, q1.queryExecution.optimizedPlan.toString)
    val r1 = q1.head()
    assert(r1.getDouble(0).isNaN && r1.getDouble(1) == -7.0)
    // two segments: the fold would have to COMPARE NaN — bail to the
    // real scan, whose answer must still be Spark's (NaN wins max)
    val t2 = SegmentedTable.create(spark, freshRoot("nan2"), schema, Map.empty)
    t2.load(Seq((1L, 2.5), (2L, Double.NaN)).toDF("k", "v"))
    t2.load(Seq((3L, 9000.0), (4L, -7.0)).toDF("k", "v"))
    val q2 = t2.read().agg(max(col("v")).as("mx"), min(col("v")).as("mn"))
    assert(scansOf(q2).nonEmpty, q2.queryExecution.optimizedPlan.toString)
    val r2 = q2.head()
    assert(r2.getDouble(0).isNaN && r2.getDouble(1) == -7.0)
  }

  test("segments staged before an ADD COLUMN bail min/max on the new column") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("k", LongType)))
    val root = freshRoot("evolve")
    val t = SegmentedTable.create(spark, root, schema, Map.empty)
    t.load(Seq(1L, 2L).toDF("k"))
    val t2 = t.addColumn("v", LongType)
    t2.load(Seq((3L, 30L), (4L, 40L)).toDF("k", "v"))
    // the old segment has no nullCounts entry for v → unknown vintage
    val q = t2.read().agg(min(col("v")).as("mn"), count(col("v")).as("c"))
    assert(scansOf(q).nonEmpty, q.queryExecution.optimizedPlan.toString)
    val r = q.head()
    assert(r.getLong(0) == 30L && r.getLong(1) == 2L)
    // but k (present since creation) still folds from the catalog
    val qk = t2.read().agg(max(col("k")).as("mx"))
    assert(scansOf(qk).isEmpty, qk.queryExecution.optimizedPlan.toString)
    assert(qk.head().getLong(0) == 4L)
  }

  test("multi-byte string min/max matches Spark's UTF8 binary order") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("s", StringType)))
    val t = SegmentedTable.create(spark, freshRoot("utf8"), schema, Map.empty)
    // U+FF21 (ＡFULLWIDTH) vs U+10400 (𐐀 supplementary): UTF-8 byte
    // order and UTF-16 code-unit order disagree on the pair
    t.load(Seq("Ａ", "zebra").toDF("s"))
    t.load(Seq(new String(Character.toChars(0x10400)), "apple").toDF("s"))
    val q = t.read().agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    assert(scansOf(q).isEmpty, q.queryExecution.optimizedPlan.toString)
    val want = t.read().filter(lit(true))
      .agg(min(col("s")), max(col("s"))).head()
    assert(q.head() == want)
  }

  test("segment-aligned filter folds from the catalog; a straddling one bails") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType)))
    val t = SegmentedTable.create(spark, freshRoot("filt"), schema, Map.empty)
    t.load((1L to 100L).map(i => (i, i * 1.5)).toDF("k", "v"))
    t.load((101L to 200L).map(i => (i, i * 1.5)).toDF("k", "v"))
    // k >= 101 proves segment 1 all-out (max 100) and segment 2
    // all-in (min 101): metadata-only
    val q = t.read().filter(col("k") >= 101L)
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("k")).as("mx"))
    assert(scansOf(q).isEmpty, q.queryExecution.optimizedPlan.toString)
    val r = q.head()
    assert(r.getLong(0) == 100L && r.getDouble(1) == 101 * 1.5 && r.getLong(2) == 200L)
    // k >= 150 cuts through segment 2: unprovable → real scan
    val q2 = t.read().filter(col("k") >= 150L).agg(count(lit(1)).as("n"))
    assert(scansOf(q2).nonEmpty, q2.queryExecution.optimizedPlan.toString)
    assert(q2.head().getLong(0) == 51L)
    // conjunction: range + equality-impossible second column bails
    // (v = -1 prunes BOTH segments → zero-row fold, still metadata)
    val q3 = t.read().filter(col("k") >= 101L && col("v") === -1.0)
      .agg(count(lit(1)).as("n"), max(col("k")).as("mx"))
    assert(scansOf(q3).isEmpty, q3.queryExecution.optimizedPlan.toString)
    val r3 = q3.head()
    assert(r3.getLong(0) == 0L && r3.isNullAt(1))
  }

  test("a null-bearing column never proves all-in for a comparison filter") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    val t = SegmentedTable.create(spark, freshRoot("nullin"), schema, Map.empty)
    t.load(Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("k", "v"))
    // v >= 10 is satisfied by every NON-NULL row, but the null row
    // fails it — stats alone cannot count the survivors
    val q = t.read().filter(col("v") >= 10L).agg(count(lit(1)).as("n"))
    assert(scansOf(q).nonEmpty, q.queryExecution.optimizedPlan.toString)
    assert(q.head().getLong(0) == 2L)
  }

  test("hybrid fold: proven segments answer from metadata, only the straddler scans") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType)))
    val t = SegmentedTable.create(spark, freshRoot("hyb"), schema, Map.empty)
    t.load((1L to 100L).map(i => (i, i * 1.5)).toDF("k", "v"))
    t.load((101L to 200L).map(i => (i, i * 1.5)).toDF("k", "v"))
    t.load((201L to 300L).map(i => (i, i * 1.5)).toDF("k", "v"))
    // k >= 101 AND k <= 250: segment 1 all-out, segment 2 all-in
    // (metadata), segment 3 straddles (201..250 of 201..300) — the
    // plan must scan EXACTLY the straddler's dir and combine
    val q = t.read().filter(col("k") >= 101L && col("k") <= 250L)
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min(col("k")).as("mn"), max(col("k")).as("mx"),
        min(col("v")).as("mnv"), max(col("v")).as("mxv"))
    val scans = scansOf(q)
    assert(scans.size == 1, q.queryExecution.optimizedPlan.toString)
    val roots = scans.head.relation
      .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.map(_.getName)
    assert(roots == Seq("segment_2"), roots.toString) // ids 0,1,2 — the third
    val r = q.head()
    assert(r.getLong(0) == 150L && r.getLong(1) == 150L &&
      r.getLong(2) == 101L && r.getLong(3) == 250L &&
      r.getDouble(4) == 101 * 1.5 && r.getDouble(5) == 250 * 1.5)

    // extrema that live in the PROVEN branch must win the combine too
    val q2 = t.read().filter(col("k") >= 101L && col("k") <= 250L)
      .agg(min(col("v")).as("mnv"))
    assert(scansOf(q2).size == 1)
    assert(q2.head().getDouble(0) == 101 * 1.5)

    // nothing proven (predicate inside one segment) still bails whole
    val q3 = t.read().filter(col("k") >= 220L && col("k") <= 230L)
      .agg(count(lit(1)).as("n"))
    assert(scansOf(q3).nonEmpty)
    assert(q3.head().getLong(0) == 11L)
  }

  test("grouped fold: segment-constant group keys fold per group with no scan") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", LongType)))
    val t = SegmentedTable.create(spark, freshRoot("grp"), schema, Map.empty)
    // one load per key value (identity-partitioned loads), plus a
    // SECOND segment for "a" — groups must merge across segments
    t.load(Seq(("a", 1L), ("a", 2L)).toDF("g", "v"))
    t.load(Seq(("b", 10L), ("b", 20L), ("b", 30L)).toDF("g", "v"))
    t.load(Seq(("a", 3L)).toDF("g", "v"))
    // and a NULL-key segment: the NULL group must fold too
    t.load(Seq((Option.empty[String], 100L)).toDF("g", "v"))
    val q = t.read().groupBy(col("g"))
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    assert(scansOf(q).isEmpty, q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r =>
      (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      (Some("a"), 3L, 3L, 1L, 3L),
      (Some("b"), 3L, 3L, 10L, 30L),
      (None, 1L, 1L, 100L, 100L)), got.toString)

    // SELECT DISTINCT k is a group-only aggregate after the optimizer
    // (ReplaceDistinctWithAggregate) — it folds from the same stats
    val qd = t.read().select(col("g")).distinct()
    assert(scansOf(qd).isEmpty, qd.queryExecution.optimizedPlan.toString)
    assert(qd.collect().map(r => Option(r.getString(0))).toSet ==
      Set(Some("a"), Some("b"), None))

    // COUNT(DISTINCT k) over the segment-constant column folds too —
    // nulls excluded per SQL semantics ("a", "b" but not the NULL)
    val qcd = t.read().agg(count_distinct(col("g")).as("n"),
      count(lit(1)).as("c"))
    assert(scansOf(qcd).isEmpty, qcd.queryExecution.optimizedPlan.toString)
    assert(qcd.head().getLong(0) == 2L && qcd.head().getLong(1) == 7L)

    // a segment where the group key is NOT constant bails to the scan
    val t2 = SegmentedTable.create(spark, freshRoot("grpmix"), schema, Map.empty)
    t2.load(Seq(("a", 1L), ("b", 2L)).toDF("g", "v"))
    val q2 = t2.read().groupBy(col("g")).agg(count(lit(1)).as("n"))
    assert(scansOf(q2).nonEmpty)
    assert(q2.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 1L), ("b", 1L)))
    // ... and so does COUNT(DISTINCT) on it (distinct counts never
    // combine across a hybrid, so a non-constant column must scan)
    val q2d = t2.read().agg(count_distinct(col("g")).as("n"))
    assert(scansOf(q2d).nonEmpty)
    assert(q2d.head().getLong(0) == 2L)

    // a segment-ALIGNED filter composes with the grouped fold
    val q3 = t.read().filter(col("v") <= 3L).groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
    assert(scansOf(q3).isEmpty, q3.queryExecution.optimizedPlan.toString)
    assert(q3.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 3L)))
    // a straddling filter bails (v <= 1 cuts the first "a" segment,
    // whose v spans 1..2)
    val q4 = t.read().filter(col("v") <= 1L).groupBy(col("g"))
      .agg(count(lit(1)).as("n"))
    assert(scansOf(q4).nonEmpty)
    assert(q4.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 1L)))
  }

  test("grouped HYBRID fold: constant-key segments answer from metadata, the rest scan") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", LongType)))
    val t = SegmentedTable.create(spark, freshRoot("grphyb"), schema, Map.empty)
    t.load(Seq(("a", 1L), ("a", 2L)).toDF("g", "v"))          // constant "a"
    t.load(Seq(("b", 10L), ("b", 20L), ("b", 30L)).toDF("g", "v")) // constant "b"
    t.load(Seq(("a", 5L), ("c", 7L)).toDF("g", "v"))          // MIXED keys

    // no filter: the two constant segments fold, ONLY the mixed one
    // scans, the outer aggregate merges group "a" across the branches
    val q = t.read().groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
    val scans = scansOf(q)
    assert(scans.size == 1, q.queryExecution.optimizedPlan.toString)
    val roots = scans.head.relation
      .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.map(_.getName)
    assert(roots == Seq("segment_2"), roots.toString)
    val got = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("a", 3L, 1L, 5L), ("b", 3L, 10L, 30L),
      ("c", 1L, 7L, 7L)), got.toString)

    // filter straddling a CONSTANT segment: "a" folds (all-in), "b"
    // straddles (10..30 vs <= 15), the mixed segment is all-in but
    // non-constant — both of the latter scan, with the filter kept
    val qf = t.read().filter(col("v") <= 15L).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
    val scansF = scansOf(qf)
    assert(scansF.size == 1, qf.queryExecution.optimizedPlan.toString)
    val rootsF = scansF.head.relation
      .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
      .location.rootPaths.map(_.getName).toSet
    assert(rootsF == Set("segment_1", "segment_2"), rootsF.toString)
    val gotF = qf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotF == Set(("a", 3L, 1L, 5L), ("b", 1L, 10L, 10L),
      ("c", 1L, 7L, 7L)), gotF.toString)
  }

  test("integral SUM folds from the catalog's exact per-segment sums") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("d", DoubleType),
      StructField("n", LongType)))
    val t = SegmentedTable.create(spark, freshRoot("sum"), schema, Map.empty)
    t.load(Seq((1L, 1.5, 10L), (2L, 2.5, 20L)).toDF("k", "d", "n"))
    t.load(Seq((3L, 3.5, 30L), (4L, 4.5, 40L)).toDF("k", "d", "n"))
    // integral sums fold with zero scan
    val q = t.read().agg(sum(col("k")).as("sk"), sum(col("n")).as("sn"),
      count(lit(1)).as("c"))
    assert(scansOf(q).isEmpty, q.queryExecution.optimizedPlan.toString)
    val r = q.head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 100L && r.getLong(2) == 4L)
    // a DOUBLE sum is never served from metadata (order-dependent
    // accumulation) — the whole fold bails to the real scan
    val qd = t.read().agg(sum(col("d")).as("sd"))
    assert(scansOf(qd).nonEmpty, qd.queryExecution.optimizedPlan.toString)
    assert(math.abs(qd.head().getDouble(0) - 12.0) < 1e-9)
    // all-null integral column serves the NULL sum
    val t2 = SegmentedTable.create(spark, freshRoot("sumnull"),
      StructType(Seq(StructField("k", LongType), StructField("v", LongType))),
      Map.empty)
    t2.load(Seq((1L, Option.empty[Long]), (2L, None)).toDF("k", "v"))
    val qn = t2.read().agg(sum(col("v")).as("sv"))
    assert(scansOf(qn).isEmpty, qn.queryExecution.optimizedPlan.toString)
    assert(qn.head().isNullAt(0))
    // grouped + hybrid: sums combine across the metadata/scan branches
    val t3 = SegmentedTable.create(spark, freshRoot("sumhyb"),
      StructType(Seq(StructField("g", StringType), StructField("v", LongType))),
      Map.empty)
    t3.load(Seq(("a", 1L), ("a", 2L)).toDF("g", "v"))
    t3.load(Seq(("a", 4L), ("b", 8L)).toDF("g", "v")) // mixed → scans
    val qg = t3.read().groupBy(col("g")).agg(sum(col("v")).as("sv"))
    assert(scansOf(qg).size == 1, qg.queryExecution.optimizedPlan.toString)
    assert(qg.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 7L), ("b", 8L)))
  }

  test("decimal SUM and AVG fold from the catalog's exact decimal sums") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("p", DecimalType(12, 2)),
      StructField("w", DecimalType(30, 2)), // precision > 28: no staged sum
      StructField("d", DoubleType)))
    def df(rows: Seq[(Long, String, String, Double)]) =
      rows.toDF("k", "p0", "w0", "d")
        .select(col("k"), col("p0").cast(DecimalType(12, 2)).as("p"),
          col("w0").cast(DecimalType(30, 2)).as("w"), col("d"))
    val t = SegmentedTable.create(spark, freshRoot("dec"), schema, Map.empty)
    t.load(df(Seq((1L, "10.25", "10.25", 1.5), (2L, "20.50", "20.50", 2.5))))
    t.load(df(Seq((3L, "0.25", "0.25", 3.5))))

    // decimal SUM + AVG and the cast-to-double wrappers: zero scan
    val q = t.read().agg(
      sum(col("p")).as("sp"),
      avg(col("p")).as("ap"),
      sum(col("p")).cast("double").as("spd"),
      avg(col("p")).cast("double").as("apd"),
      avg(col("k")).as("ak"))
    assert(scansOf(q).isEmpty, q.queryExecution.optimizedPlan.toString)
    // values must equal the real scan's own answers bit-for-bit
    val want = df(Seq((1L, "10.25", "10.25", 1.5), (2L, "20.50", "20.50", 2.5),
      (3L, "0.25", "0.25", 3.5))).agg(
      sum(col("p")), avg(col("p")),
      sum(col("p")).cast("double"), avg(col("p")).cast("double"),
      avg(col("k"))).head()
    assert(q.head() == want)

    // a precision-38-headroom-less decimal (p > 28) records no staged
    // sum → the fold bails to the real scan
    val qw = t.read().agg(sum(col("w")).as("sw"))
    assert(scansOf(qw).nonEmpty, qw.queryExecution.optimizedPlan.toString)
    assert(qw.head().getDecimal(0).toPlainString == "31.00")

    // double AVG never folds (order-dependent FP accumulation)
    val qd = t.read().agg(avg(col("d")).as("ad"))
    assert(scansOf(qd).nonEmpty, qd.queryExecution.optimizedPlan.toString)

    // integral AVG above the 2^53 exactness bound bails
    val big = 1L << 53
    val t2 = SegmentedTable.create(spark, freshRoot("avgbig"),
      StructType(Seq(StructField("v", LongType))), Map.empty)
    t2.load(Seq(big, big).toDF("v"))
    val qb = t2.read().agg(avg(col("v")).as("av"))
    assert(scansOf(qb).nonEmpty, qb.queryExecution.optimizedPlan.toString)
    assert(qb.head().getDouble(0) == big.toDouble)

    // decimal SUM is non-combinable: a straddling filter over it
    // bails to the real scan instead of a hybrid
    val qs = t.read().filter(col("k") >= 2L).agg(sum(col("p")).as("sp"))
    assert(scansOf(qs).nonEmpty, qs.queryExecution.optimizedPlan.toString)
    assert(qs.head().getDecimal(0).toPlainString == "20.75")

    // but an ALIGNED filter (all-in segments) still folds
    val qa = t.read().filter(col("k") >= 3L).agg(sum(col("p")).as("sp"),
      avg(col("p")).cast("double").as("ap"))
    assert(scansOf(qa).isEmpty, qa.queryExecution.optimizedPlan.toString)
    assert(qa.head().getDecimal(0).toPlainString == "0.25")
  }

  test("a DELETE's COW rewrite refreshes the folded answer") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    val t = SegmentedTable.create(spark, freshRoot("cow"), schema, Map.empty)
    t.load((1L to 10L).map(i => (i, i * 100L)).toDF("k", "v"))
    t.delete(col("v") === 1000L)
    val q = t.read().agg(max(col("v")).as("mx"), count(lit(1)).as("n"))
    assert(scansOf(q).isEmpty, q.queryExecution.optimizedPlan.toString)
    val r = q.head()
    assert(r.getLong(0) == 900L && r.getLong(1) == 9L)
  }
}
