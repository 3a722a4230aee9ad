package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plain-Spark/Parquet baseline implementations for the benchmark's
  * "within 2× of baseline" gate (BASELINE.md: baseline = plain Spark
  * on the same parquet, no graft layer).
  *
  * Most graft queries ARE stock Spark plans over plain parquet — for
  * those the baseline is the identical computation, and timing both
  * sides measures the run-to-run noise floor (which bounds how much
  * any per-query ratio can be trusted). Where the graft layer adds
  * real machinery, the baseline strips it:
  *
  *  - g01/g02: plain parquet scan + filter/agg instead of the
  *    segment store (no driver-side pruning, no segment dirs).
  *  - q34: built-in count_distinct instead of the Roaring-bitmap
  *    TypedImperativeAggregate.
  *  - d02/d05: the declarative TextFunctions minhash pipeline
  *    (transform/md5/conv higher-order functions) instead of the
  *    compiled MinHashKernel expressions.
  *  - s01-s03/e01: declarative aggregate(zip_with) dot product
  *    instead of the codegen'd ArrayDotProduct expression.
  *  - st01: the equivalent batch aggregation instead of the
  *    Structured Streaming (AvailableNow → memory sink) run.
  */
object Baseline {

  type Q = (SparkSession, String) => DataFrame

  /** Declarative dot product — what a plain-Spark user writes before
    * dropping to a custom expression.
    */
  private def dotDecl(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def normDecl(a: Column): Column = sqrt(dotDecl(a, a))

  private def cosDecl(a: Column, b: Column): Column =
    dotDecl(a, b) / (normDecl(a) * normDecl(b))

  private def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { j =>
      when(element_at(v, j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Index-free BM25 top-10 for the fixed gate terms: the whole
    * corpus tokenizes on every query (what the materialized postings
    * table buys t21/t31).
    */
  private def bm25ServeDecl(s: SparkSession, d: String): DataFrame = {
    val terms0 = Seq("spark", "join", "stream")
    val withDl = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("__w"))
      .select(col("doc_id"), col("__w"), size(col("__w")).cast("long").as("dl"))
    val stats = withDl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val toks = withDl.select(col("doc_id"), col("dl"), explode(col("__w")).as("token"))
    val tf = toks.groupBy(col("token"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val df_ = toks.select(col("token"), col("doc_id")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = col("n_docs").cast("double"); val dfd = col("df").cast("double")
    val tfd = col("tf").cast("double"); val dld = col("dl").cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log((n - dfd + lit(0.5)) / (dfd + lit(0.5)) + lit(1.0))
    val sat = tfd * lit(2.2) /
      (tfd + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * dld / avgdl))
    tf.join(df_, "token").crossJoin(broadcast(stats))
      .filter(col("token").isin(terms0: _*))
      .withColumn("score_ppm",
        floor(idf * sat * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("score_ppm")).as("score_ppm"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_ppm").desc, col("doc_id").asc)
      .limit(10)
  }

  /** Brute/bucketed ANN with the declarative dot product. */
  private def annDecl(corpus: DataFrame, queries: DataFrame, k: Int,
                      bits: Int, multiProbe: Option[Boolean]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q0 = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c0 = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val joined = multiProbe match {
      case None => c0.crossJoin(broadcast(q0))
      case Some(mp) =>
        val base = q0.withColumn("bucket", signBucket(col("qv"), bits))
        val probes =
          if (mp) Seq(col("bucket")) ++ (0 until bits).map(j =>
            col("bucket").bitwiseXOR(lit(1L << j)))
          else Seq(col("bucket"))
        val q = base.withColumn("probe", explode(array(probes: _*))).drop("bucket")
        c0.withColumn("probe", signBucket(col("cv"), bits)).join(broadcast(q), Seq("probe"))
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosDecl(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** MinHash LSH candidate pairs with the declarative (higher-order
    * function) pipeline from TextFunctions — no compiled kernel.
    */
  private def minhashPairsDecl(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions._
    val banded = docs.select(col("doc_id").as("id"), col("text").as("__text"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("__words", tokens(col("__text")))
      .withColumn("__sh", shinglesFromTokens(col("__words")))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig", minhashSignature(col("__sh"), 16))
      .select(col("id"), posexplode(lshBands(col("__sig"), 16, 4))
        .as(Seq("band_idx", "band_key")))
      .filter(col("band_key").isNotNull)
    val left = banded.toDF("id_a", "band_idx", "band_key")
    val right = banded.toDF("id_b", "band_idx", "band_key")
    left.join(right, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Queries whose graft implementation differs from a plain-Spark
    * formulation; every other name falls through to the graft fn
    * itself (it already is the plain parquet plan — re-running it
    * measures the noise floor, not a tautology: the ratio is evidence
    * the layer adds nothing, and its spread bounds the noise).
    */
  private val overrides: Map[String, Q] = Map(
    // exact percentiles the way a plain-Spark user writes them: a
    // count, then row_number over a GLOBAL sort (one partition) —
    // the full-shuffle cost the KLL bracket + slice recount avoids
    "t52_percentile_sketch" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, d)
        .select(col("l_extendedprice").cast("double").as("v"))
        .filter(col("v").isNotNull)
      val n = v.count()
      val rks = Seq(500000L, 900000L, 990000L)
        .map(q => (q, math.max(1L, (q * n + 999999L) / 1000000L)))
      v.withColumn("rn", row_number().over(Window.orderBy(col("v"))))
        .select(col("v"), col("rn"), explode(array(rks.map { case (q, r) =>
          struct(lit(q).as("q"), lit(r).as("r"))
        }: _*)).as("t"))
        .filter(col("rn") === col("t.r"))
        .select(col("t.q").as("pct_ppm"), lit(n).as("n_rows"),
          col("t.r").as("rk"), col("v").as("value"))
    }),
    // a user without the cube re-sorts the corpus per percentile
    // query — exactly what the persisted sketches exist to avoid
    "t54_sketch_cube" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, d)
        .select(col("l_extendedprice").cast("double").as("v"))
        .filter(col("v").isNotNull)
      val n = v.count()
      val rks = Seq(250000L, 750000L)
        .map(q => (q, math.max(1L, (q * n + 999999L) / 1000000L)))
      v.withColumn("rn", row_number().over(Window.orderBy(col("v"))))
        .select(col("v"), col("rn"), explode(array(rks.map { case (q, r) =>
          struct(lit(q).as("q"), lit(r).as("r"))
        }: _*)).as("t"))
        .filter(col("rn") === col("t.r"))
        .select(col("t.q").as("pct_ppm"), lit(n).as("n_rows"),
          col("t.r").as("rk"), col("v").as("value"))
    }),
    "t53_group_percentile_sketch" -> ((s, d) => {
      // the plain spelling of grouped order statistics: a full
      // per-group window sort + row_number pick
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
        .filter(col("v").isNotNull)
      val n = v.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val tgt = n.select(col("l_returnflag"), col("n"),
        explode(array(Seq(500000L, 950000L).map(lit): _*)).as("q"))
        .withColumn("r", greatest(lit(1L), expr("(q * n + 999999) div 1000000")))
      v.withColumn("rn", row_number().over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("v"))))
        .join(tgt, Seq("l_returnflag"))
        .filter(col("rn") === col("r"))
        .select(col("l_returnflag"), col("q").as("pct_ppm"),
          col("n").as("n_rows"), col("r").as("rk"), col("v").as("value"))
    }),
    // a user without the cube pays a full per-group window sort for
    // every grouped percentile query — what the per-group cube folds
    // (t55) exist to avoid
    "t55_group_sketch_cube" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
        .filter(col("v").isNotNull)
      val n = v.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val tgt = n.select(col("l_returnflag"), col("n"),
        explode(array(Seq(500000L, 900000L).map(lit): _*)).as("q"))
        .withColumn("r", greatest(lit(1L), expr("(q * n + 999999) div 1000000")))
      v.withColumn("rn", row_number().over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("v"))))
        .join(tgt, Seq("l_returnflag"))
        .filter(col("rn") === col("r"))
        .select(col("l_returnflag"), col("q").as("pct_ppm"),
          col("n").as("n_rows"), col("r").as("rk"), col("v").as("value"))
    }),
    // the plain spelling of g19's post-MERGE state: the same
    // join/CASE/union replay the DuckDB oracle runs, over raw orders
    // (the catalog CTAS + MERGE is the fixture's fixed cost; timed
    // runs aggregate the merged population either way)
    "g19_merge_full" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val src = o.filter(col("o_orderkey") % 4 === 1)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
        .unionAll(o.filter(col("o_orderkey") % 4 === 2)
          .select((col("o_orderkey") + 10000000L).as("k"),
            col("o_totalprice").as("p")))
      val kept = o.join(src, o("o_orderkey") === src("k"), "left")
        .filter(col("k").isNull || col("o_orderstatus") === "O")
        .select(col("o_orderstatus"),
          when(col("k").isNotNull && col("o_orderstatus") === "O",
            col("p") * 2).otherwise(col("o_totalprice")).as("o_totalprice"))
      val ins = src.join(o.select(col("o_orderkey")),
          src("k") === col("o_orderkey"), "left_anti")
        .filter(col("p") < 100000)
        .select(lit("N").as("o_orderstatus"), col("p").as("o_totalprice"))
      kept.unionAll(ins)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("o_totalprice")).as("total"))
    }),
    // the plain spelling of g20's post-MERGE state: the three clause
    // families replayed as filter/CASE/union over raw orders
    "g20_merge_by_source" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val matchedUpd = o
        .filter(col("o_orderkey") % 4 === 1 && col("o_orderstatus") === "O")
        .select(col("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
      val bySrc = o
        .filter(col("o_orderkey") % 4 =!= 1 && col("o_orderstatus") =!= "F")
        .select(lit("Z").as("o_orderstatus"), col("o_totalprice"))
      val ins = o
        .filter(col("o_orderkey") % 4 === 2 && col("o_totalprice") < 100000)
        .select(lit("N").as("o_orderstatus"), col("o_totalprice"))
      matchedUpd.unionAll(bySrc).unionAll(ins)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("o_totalprice")).as("total"))
    }),
    // the plain spelling of g18's post-DML state: filter-aggregate
    // over raw orders (the catalog CTAS + DELETE is the fixture's
    // fixed cost; timed runs scan the surviving table either way)
    "g18_catalog_dml" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(!(col("o_orderstatus") === "F" && col("o_orderkey") % 3 === 0))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("o_totalprice")).as("total"))
    }),

    // what the stats fold saves through the catalog surface: a real
    // filtered scan + aggregate over the plain parquet
    "g24_catalog_filtered_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .agg(count(lit(1)).as("cnt"),
          count(col("l_quantity")).as("cnt_qty"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          max(col("l_extendedprice")).as("max_price"))
    }),

    // the time-travel fold's savings vs a real scan of the snapshot's
    // content
    "g29_timetravel_stats_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(year(col("l_shipdate")) <= 1995)
        .agg(count(lit(1)).as("cnt"),
          count(col("l_quantity")).as("cnt_qty"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          max(col("l_extendedprice")).as("max_price"))
    }),

    // the hybrid fold's savings vs a real filtered scan + aggregate
    // (same aggregate list as the gate, sum_okey included, so the
    // measure-both bench compares equal work)
    "g25_hybrid_stats_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
        .agg(count(lit(1)).as("cnt"),
          count(col("l_quantity")).as("cnt_qty"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          max(col("l_extendedprice")).as("max_price"),
          sum(col("l_orderkey")).as("sum_okey"))
    }),

    // the merged ordered scan vs Spark's range-partitioned sort
    "g36_sorted_scan" -> ((s, d) => {
      Tables.lineitem(s, d)
        .orderBy(col("l_shipdate"))
        .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"))
    }),

    // the runtime-pruned star join vs the same join over raw parquet
    "g35_catalog_runtime_join" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val o = Tables.orders(s, d)
      val dim = o.filter(col("o_orderkey") % 7 === 1 &&
        col("o_orderkey") <= 600).select(col("o_orderkey").as("k"))
      o.join(dim, o("o_orderkey") === dim("k"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double").as("tp"))
    }),

    // the decimal SUM/AVG folds' savings vs a real filtered scan
    "g33_decimal_stats_agg" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .select(col("l_extendedprice").cast(DecimalType(12, 2)).as("p"),
          col("l_orderkey"))
        .agg(sum(col("p")).cast("double").as("sum_price"),
          avg(col("p")).cast("double").as("avg_price"),
          avg(col("l_orderkey")).cast("double").as("avg_okey"),
          count(lit(1)).as("cnt"))
    }),

    // the catalog-surface decimal folds vs the real unfiltered scan
    "g37_catalog_decimal_agg" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      Tables.lineitem(s, d)
        .select(col("l_extendedprice").cast(DecimalType(12, 2)).as("p"),
          col("l_orderkey"))
        .agg(sum(col("p")).cast("double").as("sum_price"),
          avg(col("p")).cast("double").as("avg_price"),
          avg(col("l_orderkey")).cast("double").as("avg_okey"),
          count(lit(1)).as("cnt"))
    }),

    // the grouped decimal folds' savings vs a real grouped scan
    "g34_decimal_grouped_agg" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      Tables.orders(s, d)
        .select(col("o_orderstatus"),
          col("o_totalprice").cast(DecimalType(12, 2)).as("p"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("p")).cast("double").as("sum_price"),
          avg(col("p")).cast("double").as("avg_price"),
          count(lit(1)).as("cnt"))
    }),

    // the catalog-path hybrid fold's savings vs a real filtered scan
    "g32_catalog_hybrid_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
        .agg(count(lit(1)).as("cnt"),
          count(col("l_quantity")).as("cnt_qty"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          max(col("l_extendedprice")).as("max_price"),
          sum(col("l_orderkey")).as("sum_okey"))
    }),

    // the catalog grouped fold's savings vs a real grouped scan
    "g27_catalog_grouped_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          count(col("o_orderpriority")).as("cnt_pri"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"),
          max(col("o_totalprice")).as("max_price"))
    }),

    // the grouped hybrid's savings vs a real grouped scan
    "g28_grouped_hybrid_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          count(col("o_orderpriority")).as("cnt_pri"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"),
          max(col("o_totalprice")).as("max_price"),
          sum(col("o_orderkey")).as("sum_okey"))
    }),

    // the grouped fold's savings vs a real grouped scan
    "g26_grouped_stats_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          count(col("o_orderpriority")).as("cnt_pri"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"),
          max(col("o_totalprice")).as("max_price"),
          sum(col("o_orderkey")).as("sum_okey"))
    }),

    // the distinct-count fold's savings vs a real distinct shuffle
    "g31_distinct_stats_agg" -> ((s, d) => {
      Tables.orders(s, d).agg(
        count_distinct(col("o_orderstatus")).as("n_status"),
        count(lit(1)).as("cnt"),
        min(col("o_orderdate")).as("min_date"))
    }),

    // the SUM fold's savings vs a real scan-side sum
    "g30_sum_stats_agg" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("cnt"),
        sum(col("l_orderkey")).as("sum_okey"),
        sum(col("l_linenumber")).as("sum_ln"),
        sum(col("l_suppkey")).as("sum_sk"))
    }),

    "g01_segment_pruned_scan" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
    }),

    "g02_segment_compaction" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("o_totalprice")).as("total"))
    }),

    "g13_fact_dim_load" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = broadcast(Tables.customer(s, d))
      val n = broadcast(Tables.nation(s, d))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("o_totalprice")).as("total"))
    }),

    "q34_bitmap_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(countDistinct(col("l_orderkey")).as("distinct_orders"),
          countDistinct(col("l_partkey")).as("distinct_parts"))
    }),

    "d02_minhash_pairs" -> ((s, d) => minhashPairsDecl(Tables.documents(s, d))),

    "d05_dedup_clusters" -> ((s, d) =>
      graft.dedup.Dedup.nearDupClusters(minhashPairsDecl(Tables.documents(s, d)))),

    // d08's plain formulation: declarative LSH candidates (no compiled
    // kernel) + the same Levenshtein confirmation
    "d08_editdist_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val texts = docs.select(col("doc_id"), col("text"))
      val a = texts.toDF("id_a", "__ta")
      val b = texts.toDF("id_b", "__tb")
      minhashPairsDecl(docs).join(a, "id_a").join(b, "id_b")
        .withColumn("lev", levenshtein(col("__ta"), col("__tb")))
        .filter(col("lev") * 10 <=
          greatest(length(col("__ta")), length(col("__tb"))))
        .select(col("id_a"), col("id_b"), col("lev"))
    }),

    "s01_ann_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      annDecl(emb, emb.filter(col("vec_id") < 5), 3, 0, None)
    }),

    "s02_ann_bucketed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      annDecl(emb, emb.filter(col("vec_id") < 5), 3, 4, Some(false))
    }),

    "s03_ann_multiprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      annDecl(emb, emb.filter(col("vec_id") < 5), 3, 4, Some(true))
    }),

    // recall audit with both searches in their declarative form
    "s10_ann_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 5)
      val truth = annDecl(emb, q, 3, 0, None)
        .select(col("query_id"), col("neighbor_id"))
      val approx = annDecl(emb, q, 3, 4, Some(false))
        .select(col("query_id"), col("neighbor_id"))
        .withColumn("__hit", lit(1L))
      truth.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"))
        .select(col("query_id"), col("hits"),
          expr("CAST(hits * 1000000 DIV 3 AS BIGINT)").as("recall_ppm"))
    }),

    // mutual kNN graph in its plain form: unsalted bucket self-join,
    // declarative cosine (what the salted scaffold + compiled dot buy)
    "s13_knn_graph" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("v"),
          signBucket(col("embedding"), 2).as("bucket"))
      val a = v.select(col("id").as("id_a"), col("v").as("va"), col("bucket"))
      val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("bucket"))
      val w = Window.partitionBy(col("id_a"))
        .orderBy(col("cos").desc, col("id_b").asc)
      val directed = a.join(b, Seq("bucket"))
        .filter(col("id_a") =!= col("id_b"))
        .withColumn("cos", cosDecl(col("va"), col("vb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("id_a"), col("id_b"))
      directed
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") === 2)
        .select(col("id_a"), col("id_b"))
    }),

    "e01_embed_neardup" -> ((s, d) => {
      val v = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("v"),
          signBucket(col("embedding"), 2).as("bucket"))
      val a = v.select(col("id").as("id_a"), col("v").as("va"), col("bucket"))
      val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("bucket"))
      a.join(b, Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .filter(cosDecl(col("va"), col("vb")) >= 0.4)
        .select(col("id_a"), col("id_b"))
    }),

    // the star join's plain formulation: unbucketed facts, so the
    // lineitem⋈orders shuffle the bucketed layout removes is paid here
    "q05_star_join" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(Tables.dsumProduct(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("line_cnt"))
    }),

    // the co-located join's plain formulation: same join+agg over the
    // unbucketed parquet — pays the fact-fact shuffle the bucketed
    // layout removes, so the bench ratio reports what bucketing buys
    "g03_colocated_join" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("line_cnt"),
          sum(col("l_quantity")).as("sum_qty"))
    }),

    // the MV query's plain-Spark formulation: the same aggregate
    // straight off the base table, no rollup machinery — so the bench
    // ratio reports what answering from the MV buys (or costs). The
    // avg is spelled as an explicit sum/count division: an aggregate
    // list containing a non-plain-AggregateExpression is never MV-
    // rewritten, so this baseline stays on the base scan even though
    // the graft run registered the rewrite rule in the shared session.
    "q40_agg_mv" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("o_orderkey")).as("sum_key"),
          (sum(col("o_orderkey")).cast("double") / count(col("o_orderkey")))
            .as("avg_key"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          count(lit(1)).as("cnt"))
    }),

    // the point lookup's plain formulation: filter the source parquet
    // (row-group stats only, no segment skipping, no bloom index)
    "g04_bloom_point_lookup" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey").isin(2L, 4L, 6L, 32L))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    }),

    // the ingest query's plain formulation: aggregate the source
    // parquet directly (no segment table between)
    "st03_stream_ingest" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          Tables.dsum(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("users"))
    }),

    // st09 (sink-API ingest): same plain formulation as st03's
    "st09_sink_ingest" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          Tables.dsum(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("users"))
    }),

    // Tables.events normalizes ts to epoch-nanos whatever the parquet
    // encoding (timestamp[us] or legacy TIMESTAMP(NANOS))
    "st01_stream_hourly" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(expr("ts div 3600000000000").as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("value")).as("total_value"))
    }),

    // the batch spelling of st22's catalog stream round trip: read the
    // events and aggregate — what a user who didn't need streaming
    // would write (the stream copy is the fixture's fixed cost)
    "st22_catalog_stream" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(expr("ts div 3600000000000").as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("value")).as("total_value"))
    }),

    // the sliding window's plain formulation: batch expansion into the
    // two overlapping hour-aligned windows (what the streaming state
    // machinery is priced against)
    "st15_sliding_window" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(expr("ts div 3600000000000").as("h"), col("event_type"),
          col("value"))
      e.select((col("h") - 1).as("win_hour"), col("event_type"), col("value"))
        .unionAll(e.select(col("h").as("win_hour"), col("event_type"),
          col("value")))
        .groupBy(col("win_hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("value")).as("total_value"))
    }),

    // the table-stream's plain formulation: the same hourly aggregate
    // as one batch over the source parquet (no snapshot+incremental
    // delivery, no segment table)
    "st07_table_stream_source" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(expr("ts div 3600000000000").as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Tables.dsum(col("value")).as("total_value"))
    }),

    // the stream-static join's plain formulation: the same batch join
    "st08_stream_static_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val spend = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(Tables.dsum(col("value")).as("spend"))
      ev.filter(col("event_type") === "error")
        .join(broadcast(spend), "user_id")
        .filter(col("spend") > 600.0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("errors"), max(col("spend")).as("spend"))
    }),

    // the correlation join's plain formulation: equi on user + range
    // condition as written — the per-user theta join the bucketed
    // composition avoids
    "q44_time_corr_join" -> ((s, d) => {
      val W = 3600000000000L
      val ev = Tables.events(s, d)
      val e = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("ets"), col("event_id").as("err_id"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("pts"))
      e.join(p, col("user_id") === col("p_uid") &&
          col("pts") > col("ets") - W && col("pts") <= col("ets"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("err_id")).as("errors_with_purchase"))
    }),

    // the change feed's plain formulation: reconstruct the same event
    // multiset from the source parquet (no catalog, no commit log)
    "g14_cdc_feed" -> ((s, d) => {
      val odds = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 2 === 1 && col("l_orderkey") % 10 =!= 3)
        .select(col("l_orderkey"))
      val ins = odds.union(odds.filter(col("l_orderkey") % 10 =!= 7))
        .agg(count(lit(1)).as("rows_changed"), sum(col("l_orderkey")).as("key_sum"))
        .select(lit("insert").as("change_type"), col("rows_changed"), col("key_sum"))
      val del = odds
        .agg(count(lit(1)).as("rows_changed"), sum(col("l_orderkey")).as("key_sum"))
        .select(lit("delete").as("change_type"), col("rows_changed"), col("key_sum"))
      ins.unionByName(del)
    }),

    // the replica's plain formulation: reconstruct the SAME change
    // feed from the source parquet (inserts for both loads, the odd
    // segment's rewrite as whole-segment deletes + kept re-inserts —
    // evens never end in 7, so only the odd segment rewrites) and net
    // it with the same fingerprint shape — pricing the apply
    // algorithm on equal feed volume, not the segment store's read
    "g17_cdc_apply" -> ((s, d) => cdcApplyBaseline(s, d)),

    // same replayed feed + netting — what the streamed delivery must
    // also reproduce
    "st11_stream_cdc_apply" -> ((s, d) => cdcApplyBaseline(s, d)),

    // the rollup's plain formulation: aggregate the source directly
    // (no MV, no streaming sink, no incremental refresh)
    "st10_stream_mv_refresh" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(sum(col("user_id")).as("sum_user_id"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          count(lit(1)).as("cnt_rows"))
    }),

    // the keyword query's plain formulation: no inverted index — the
    // whole corpus tokenizes on every query (what the materialized
    // postings table buys)
    "t21_bm25_index_serve" -> ((s, d) => bm25ServeDecl(s, d)),

    // the hybrid query's plain formulation: index-free BM25 (the t21
    // baseline) + the declarative-dot-product vector search, fused
    // with the same integer RRF arithmetic
    "t31_hybrid_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lexTop = bm25ServeDecl(s, d)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score_ppm").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("rank").as("lex_rank"),
          expr("CAST(1000000000 DIV (60 + CAST(rank AS BIGINT)) AS BIGINT)")
            .as("__c_lex"))
      val emb = Tables.embeddings(s, d)
      val vecTop = annDecl(emb, emb.filter(col("vec_id") === 0), 10, 0, None)
        .select(col("neighbor_id").as("doc_id"), col("rank").as("vec_rank"),
          expr("CAST(1000000000 DIV (60 + CAST(rank AS BIGINT)) AS BIGINT)")
            .as("__c_vec"))
      lexTop.join(vecTop, Seq("doc_id"), "full_outer")
        .withColumn("rrf_ppb",
          coalesce(col("__c_lex"), lit(0L)) + coalesce(col("__c_vec"), lit(0L)))
        .orderBy(col("rrf_ppb").desc, col("doc_id").asc)
        .limit(10)
        .select(col("doc_id"), col("lex_rank"), col("vec_rank"), col("rrf_ppb"))
    }),

    // the phrase query's plain formulation: tokenize the corpus per
    // query (what the bigram posting index buys)
    "t23_phrase_index_serve" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("__w"))
      toks.filter(size(col("__w")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(__w) - 2), i -> concat(__w[i], ' ', __w[i+1]))"))
          .as("bigram"))
        .filter(col("bigram") === "data line")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("doc_id").asc).limit(10)
    }),

    // the n-gram phrase's plain formulation: tokenize the WHOLE
    // corpus and count trigrams per query (what the bigram-index
    // candidate pruning buys)
    "t24_phrase_ngram_serve" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("__w"))
      toks.filter(size(col("__w")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(__w) - 3), i -> concat_ws(' ', __w[i], __w[i+1], __w[i+2]))"))
          .as("ngram"))
        .filter(col("ngram") === "stream table hash")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("doc_id").asc).limit(10)
    }),

    // the heavy hitters' plain formulation: full-vocabulary groupBy
    // (every distinct token shuffles) + HAVING
    "t22_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      val totals = toks.agg(count(lit(1)).as("__total"))
      toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(totals))
        .filter(col("cnt") * lit(30L) >= col("__total"))
        .select(col("token"), col("cnt"))
    })
  )

  /** Shared g17/st11 baseline: the equivalent CDC feed built from
    * plain parquet, netted with the same compound-fingerprint shape
    * as the graft apply.
    */
  private def cdcApplyBaseline(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val evens = li.filter(col("l_orderkey") % 2 === 0)
    val odds = li.filter(col("l_orderkey") % 2 === 1 &&
      col("l_orderkey") % 10 =!= 3)
    val kept = odds.filter(col("l_orderkey") % 10 =!= 7)
    val feed = evens.withColumn("_change_type", lit("insert"))
      .unionByName(odds.withColumn("_change_type", lit("insert")))
      .unionByName(odds.withColumn("_change_type", lit("delete")))
      .unionByName(kept.withColumn("_change_type", lit("insert")))
    val dataCols = li.columns
    feed
      .withColumn("__delta",
        when(col("_change_type") === "insert", 1L).otherwise(-1L))
      .withColumn("__fp", xxhash64(dataCols.map(col): _*))
      .withColumn("__fp2", hash(dataCols.map(col): _*))
      .groupBy(col("__fp"), col("__fp2"), col("l_returnflag"),
        col("l_orderkey"))
      .agg(sum(col("__delta")).as("__net"))
      .filter(col("__net") =!= 0L)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("__net")).as("cnt"),
        sum(col("__net") * col("l_orderkey")).as("key_sum"))
  }

  def queries: Map[String, Q] =
    SparkEntry.queries.map { case (name, fn) => name -> overrides.getOrElse(name, fn) }
}
