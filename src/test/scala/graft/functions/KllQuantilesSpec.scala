package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The KLL/MRL rank sketch under the t22 discipline: the tracked
  * worst-case error bound must hold for EVERY rank query after any
  * sequence of updates, splits and merges (the 200-case property the
  * MisraGriesSpec pattern established), and the
  * sketch-proposes/exact-recount composition must equal the exact
  * sort-based answer under any partitioning — including duplicate
  * -heavy streams where the bracket endpoints repeat.
  */
class KllQuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** est_rank(x) = total weight of sketch items with value <= x. */
  private def estRank(b: KllBuffer, x: Double): Long = {
    var s = 0L
    var l = 0
    while (l < b.levels.size) {
      val w = 1L << l
      b.levels(l).foreach(v => if (v <= x) s += w)
      l += 1
    }
    s
  }

  test("property: tracked error bound holds for every rank after splits and merges") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop
    import org.scalacheck.Prop.forAll
    val gen = for {
      k <- Gen.choose(8, 24)
      items <- Gen.listOfN(500,
        Gen.frequency((6, Gen.choose(0, 30)), (4, Gen.choose(0, 1000))))
      cuts <- Gen.listOfN(3, Gen.choose(0, items.size))
    } yield (k, items.map(_.toDouble), cuts.sorted)
    val prop = forAll(gen) { case (k, items, cuts) =>
      val agg = KllSketch(Literal(0.0), k)
      val parts = (0 +: cuts :+ items.size).sliding(2).map {
        case Seq(a, b) => items.slice(a, b)
      }.toList
      val merged = parts.map { part =>
        val b = agg.createAggregationBuffer()
        part.foreach { v =>
          KllSketch(Literal(v), k).update(b, InternalRow.empty)
        }
        b
      }.reduce(agg.merge)
      val sorted = items.sorted
      val exactOk = merged.n == items.size &&
        (items.isEmpty || (merged.mn == sorted.head && merged.mx == sorted.last))
      // the bound must hold at every distinct value (worst case, not
      // probabilistic — the compaction parity is deterministic)
      val boundOk = items.distinct.forall { x =>
        val truth = items.count(_ <= x).toLong
        math.abs(estRank(merged, x) - truth) <= merged.err
      }
      Prop(exactOk && boundOk) :|
        s"k=$k n=${items.size} err=${merged.err}"
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("exactQuantiles equals the exact sort answer on a duplicate-heavy stream") {
    // heavy duplication stresses the bracket-endpoint tie handling:
    // values 1..40, value v repeated v times, plus a dense plateau
    val data = (1 to 40).flatMap(v => Seq.fill(v)(v.toDouble)) ++
      Seq.fill(300)(17.0)
    val pcts = Seq(100000L, 250000L, 500000L, 750000L, 900000L, 999999L)
    val n = data.size.toLong
    val sorted = data.sorted
    val want = pcts.map { q =>
      val r = math.max(1L, (q * n + 999999L) / 1000000L)
      (q, n, r, sorted((r - 1).toInt))
    }.toSet
    for (parts <- Seq(1, 13)) {
      val got = KllQuantiles.exactQuantiles(
        data.toDF("x").repartition(parts), "x", pcts, k = 16)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("a tiny k still yields exact answers — only the bracket widens") {
    val data = (1 to 2000).map(i => ((i * 2654435761L) % 10007).toDouble)
    val sorted = data.sorted
    val got = KllQuantiles.exactQuantiles(
      data.toDF("x").repartition(29), "x", Seq(500000L), k = 8)
      .collect()(0)
    val r = got.getLong(2)
    assert(got.getDouble(3) == sorted((r - 1).toInt))
  }

  test("the recount never sorts more than sliceBudget rows in one task (iterative re-bracket)") {
    // the 100×-scale bar (r15 verdict #4): a first-pass bracket is
    // ~2·B rows with B ~ n/k·log n — at 100 TB that was a
    // multi-billion-row single-task window sort. Force the regime at
    // spec scale: at k=200 over 20k distinct values the first bracket
    // is ~2600 rows, and a 256-row budget forces the re-sketch loop
    // to narrow it (genuinely — no stall fallback involved).
    val data = (1 to 20000).map(i => ((i * 2654435761L) % 1000003).toDouble)
    val sorted = data.sorted
    val pcts = Seq(250000L, 500000L, 900000L)
    val (df, stats) = KllQuantiles.exactQuantilesWithStats(
      data.toDF("x").repartition(17), "x", pcts, sliceBudget = 256L)
    // every final window slice fits the budget — the quantity the
    // per-target window actually sorts in one task
    assert(stats.nonEmpty && stats.forall(_.finalSliceRows <= 256L),
      s"slices exceed the budget: $stats")
    // and the budget was BINDING: the first bracket is far wider than
    // 256 rows, so at least one target had to iterate — via the
    // sketch, not the sort fallback
    assert(stats.exists(s => s.iterations > 0 && !s.fallback),
      s"expected sketch re-bracket iterations under a binding budget: $stats")
    // exactness is untouched by the narrowing
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    val want = pcts.map { q =>
      val r = math.max(1L, (q * data.size + 999999L) / 1000000L)
      (q, r, sorted((r - 1).toInt))
    }.toSet
    assert(got == want)
  }

  test("a k too small to narrow stalls into the distributed-sort fallback, still exact") {
    // at k=8 the sketch's worst-case error bound exceeds the slice
    // size (err ~ 2m·log(m/k)/k ≥ m), so re-sketching can NEVER
    // shrink the bracket — the stall detector must route to the
    // range-partitioned sort instead of looping or sorting the whole
    // slice in one task
    val data = (1 to 20000).map(i => ((i * 2654435761L) % 1000003).toDouble)
    val sorted = data.sorted
    val (df, stats) = KllQuantiles.exactQuantilesWithStats(
      data.toDF("x").repartition(17), "x", Seq(500000L), k = 8,
      sliceBudget = 256L)
    val got = df.collect()(0)
    val r = math.max(1L, (500000L * data.size + 999999L) / 1000000L)
    assert(got.getDouble(3) == sorted((r - 1).toInt))
    val st = stats.find(_.q == 500000L).get
    assert(st.fallback && st.finalSliceRows == 0L,
      s"expected the stall fallback, got $st")
  }

  test("a boundary plateau wider than the budget resolves analytically, not by sorting") {
    // no bracket can split a single repeated value: a million-copy
    // plateau must fall out of the duplicate COUNTS (finalSliceRows
    // == 0), never hit a window sort wider than the budget
    val data = Seq.fill(10000)(5.0) ++ (1 to 500).map(_.toDouble / 1000.0) ++
      (1 to 500).map(i => 100.0 + i)
    val sorted = data.sorted
    val (df, stats) = KllQuantiles.exactQuantilesWithStats(
      data.toDF("x").repartition(11), "x", Seq(500000L), k = 16,
      sliceBudget = 64L)
    val got = df.collect()(0)
    val r = math.max(1L, (500000L * data.size + 999999L) / 1000000L)
    assert(got.getDouble(3) == sorted((r - 1).toInt)) // == 5.0
    val st = stats.find(_.q == 500000L).get
    assert(st.finalSliceRows == 0L,
      s"plateau target must resolve analytically, got $st")
  }

  test("duplicate pct targets dedupe to one correct answer each") {
    // ADVICE r15: duplicated targets used to multiply the slice rows
    // in the per-target window and select the wrong order statistic
    val data = (1 to 999).map(_.toDouble)
    val out = KllQuantiles.exactQuantiles(
      data.toDF("x"), "x", Seq(500000L, 500000L, 250000L), k = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1)
    assert(out.toSeq == Seq((250000L, 250.0), (500000L, 500.0)),
      s"got ${out.toSeq}")
  }

  test("NaN inputs are excluded from the population, like nulls") {
    // ADVICE r15: a NaN used to enter n and the sketch but not mn/mx,
    // silently losing high-percentile targets whose bracket landed in
    // the NaN region. The population is now non-null AND non-NaN.
    val data = (1 to 100).map(_.toDouble) ++ Seq.fill(40)(Double.NaN)
    val out = KllQuantiles.exactQuantiles(
      data.toDF("x"), "x", Seq(999999L, 500000L), k = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .sortBy(_._1)
    // n_rows = 100 (NaN excluded); p999999 exists and is the true max
    assert(out.toSeq == Seq((500000L, 100L, 50.0), (999999L, 100L, 100.0)),
      s"got ${out.toSeq}")
  }

  test("grouped: per-group order statistics match a per-group sort, groups isolated") {
    // three groups with deliberately different distributions — the
    // per-(group, target) brackets must not bleed into each other
    val data =
      (1 to 500).map(i => ("a", (i * 2654435761L % 10007).toDouble)) ++
      (1 to 300).map(i => ("b", 1000000.0 + i)) ++
      (1 to 7).map(_ => ("c", 5.0)) // tiny duplicate-only group
    val pcts = Seq(250000L, 500000L, 990000L)
    val got = KllQuantiles.exactQuantilesByGroup(
      data.toDF("g", "x").repartition(13), "g", "x", pcts, k = 32)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val want = data.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.size.toLong
      pcts.map { q =>
        val r = math.max(1L, (q * n + 999999L) / 1000000L)
        (g, q, n, r, sorted((r - 1).toInt))
      }
    }.toSet
    assert(got == want)
  }

  test("grouped: a binding budget narrows per group without touching other groups' answers") {
    val data =
      (1 to 8000).map(i => ("wide", ((i * 48271L) % 1000003).toDouble)) ++
      (1 to 50).map(i => ("narrow", i.toDouble))
    val got = KllQuantiles.exactQuantilesByGroup(
      data.toDF("g", "x").repartition(7), "g", "x", Seq(500000L),
      sliceBudget = 128L)
      .collect()
      .map(r => (r.getString(0), r.getDouble(4))).toMap
    def exact(g: String): Double = {
      val sorted = data.filter(_._1 == g).map(_._2).sorted
      val n = sorted.size.toLong
      sorted(((500000L * n + 999999L) / 1000000L - 1L).toInt)
    }
    assert(got == Map("wide" -> exact("wide"), "narrow" -> exact("narrow")))
  }

  test("grouped: null groups and NaN values are excluded; group cap fails loudly") {
    val data = Seq((Some("a"), 1.0), (Some("a"), Double.NaN),
      (None: Option[String], 9.0), (Some("a"), 3.0))
    val out = KllQuantiles.exactQuantilesByGroup(
      data.toDF("g", "x"), "g", "x", Seq(500000L))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq == Seq(("a", 2L, 1.0)), s"got ${out.toSeq}")
    val many = (1 to 30).map(i => (s"g$i", 1.0))
    val e = intercept[IllegalArgumentException] {
      KllQuantiles.exactQuantilesByGroup(
        many.toDF("g", "x"), "g", "x", Seq(500000L), maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"))
  }

  test("kll_merge: stored cube cells round-trip parquet and answer exactly via the merged sketch") {
    // per-cell sketches persisted to parquet (sketch-as-data), read
    // back, folded with kll_merge — the merged sketch's bracket must
    // recount to the same EXACT order statistics as the direct path,
    // and the merged bound must equal the sum of parts' plus the
    // merge's own compactions (validity: the property test's bound
    // check applies to the rebuilt state too)
    val data = (1 to 4000).map(i =>
      (s"cell${i % 7}", ((i * 2654435761L) % 99991).toDouble))
    val df = data.toDF("cell", "x").repartition(11)
    val cells = df.groupBy(col("cell"))
      .agg(KllSketch.kllSketch(col("x"), 64).as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("kll_cube").toString
    cells.write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(KllSketch.kllMerge(col("sk"), 64).as("sk"))
      .collect()(0).getStruct(0)
    assert(merged.getAs[Long]("n") == 4000L)
    val pcts = Seq(100000L, 500000L, 999999L)
    val got = KllQuantiles.exactQuantilesFromSketch(
      df.withColumnRenamed("x", "v"), "v", merged, pcts)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    val sorted = data.map(_._2).sorted
    val want = pcts.map { q =>
      val r = math.max(1L, (q * 4000L + 999999L) / 1000000L)
      q -> sorted((r - 1).toInt)
    }.toMap
    assert(got == want)
    // direct and cube paths agree completely
    val direct = KllQuantiles.exactQuantiles(
      df.withColumnRenamed("x", "v"), "v", pcts, k = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(direct == want)
  }

  test("grouped cube serving: per-group folds over parquet cells answer exactly, groups isolated") {
    // cube cells keyed (group, subcell) persist to parquet; serving
    // folds each group's cell slice with kll_merge and the grouped
    // recount must equal per-group sorts AND the direct grouped path —
    // with deliberately different distributions per group so a bracket
    // bleeding across groups would be caught
    val data =
      (1 to 1500).map(i => ("a", s"sub${i % 3}", ((i * 2654435761L) % 99991).toDouble)) ++
      (1 to 700).map(i => ("b", s"sub${i % 2}", 1.0e6 + i)) ++
      (1 to 9).map(_ => ("c", "sub0", 42.0))
    val df = data.toDF("g", "cell", "x").repartition(13)
    val cells = df.groupBy(col("g"), col("cell"))
      .agg(KllSketch.kllSketch(col("x"), 64).as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("kll_gcube").toString
    cells.write.mode("overwrite").parquet(dir)
    val perGroup = spark.read.parquet(dir)
      .groupBy(col("g"))
      .agg(KllSketch.kllMerge(col("sk"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    assert(perGroup.size == 3)
    val pcts = Seq(250000L, 500000L, 999999L)
    val got = KllQuantiles.exactQuantilesFromSketchByGroup(
      df.select(col("g"), col("x").as("v")), "g", "v", perGroup, pcts)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val want = data.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.map(_._3).sorted
      val n = sorted.size.toLong
      pcts.map { q =>
        val r = KllQuantiles.rankOf(q, n)
        (g, q, n, r, sorted((r - 1).toInt))
      }
    }.toSet
    assert(got == want)
    // the direct grouped path agrees completely
    val direct = KllQuantiles.exactQuantilesByGroup(
      df.select(col("g"), col("x").as("v")), "g", "v", pcts, k = 64)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(direct == want)
    // a sketch describing a DIFFERENT population fails loudly at the
    // per-group bracket invariant, never silently approximates
    val e = intercept[Exception] {
      KllQuantiles.exactQuantilesFromSketchByGroup(
        df.select(col("g"), col("x").as("v")).filter(col("v") < 50000),
        "g", "v", perGroup, Seq(999999L)).collect()
    }
    assert(e.getMessage.contains("bracket") || e.getMessage.contains("invariant") ||
      e.getMessage.contains("count row missing"), e.getMessage)
  }

  test("kll_merge: SQL surface works; a non-sketch struct fails loudly at the weight check") {
    Seq(("a", 1.0), ("a", 2.0), ("b", 9.0)).toDF("g", "x")
      .createOrReplaceTempView("kllm_src")
    val merged = spark.sql(
      """SELECT kll_merge(sk, 16) AS sk FROM
           (SELECT kll_sketch(CAST(x AS DOUBLE), 16) AS sk
            FROM kllm_src GROUP BY g)""").collect()(0).getStruct(0)
    assert(merged.getAs[Long]("n") == 3L)
    assert(merged.getAs[Double]("mn") == 1.0 && merged.getAs[Double]("mx") == 9.0)
    // a struct with a non-power-of-two weight is not a sketch
    val e = intercept[Exception] {
      spark.sql(
        """SELECT kll_merge(named_struct(
             'vs', array(1.0D), 'ws', array(3L), 'err', 0L,
             'n', 1L, 'mn', 1.0D, 'mx', 1.0D), 16)""").collect()
    }
    assert(e.getMessage.contains("power of two") ||
      Option(e.getCause).exists(_.getMessage.contains("power of two")),
      s"got: ${e.getMessage}")
  }

  test("empty and all-null inputs return an empty frame, not a crash") {
    val out = KllQuantiles.exactQuantiles(
      Seq.empty[Double].toDF("x"), "x", Seq(500000L))
    assert(out.collect().isEmpty)
    val nulls = Seq[Option[Double]](None, None).toDF("x")
    assert(KllQuantiles.exactQuantiles(nulls, "x", Seq(500000L))
      .collect().isEmpty)
  }

  test("kll_sketch is reachable from pure SQL with exact n/mn/mx and a honest bound") {
    (1 to 1000).map(i => ((i * 48271) % 10007).toDouble).toDF("x")
      .createOrReplaceTempView("kll_sql_src")
    val r = spark.sql(
      "SELECT kll_sketch(CAST(x AS DOUBLE), 16) AS s FROM kll_sql_src")
      .selectExpr("s.n", "s.mn", "s.mx", "s.err", "size(s.vs)")
      .head()
    assert(r.getLong(0) == 1000L)
    assert(r.getLong(3) > 0L, "16-capacity over 1000 rows must have compacted")
    assert(r.getInt(4) > 0 && r.getInt(4) < 1000,
      s"sketch must be a real summary, got ${r.getInt(4)} items")
    val xs = spark.table("kll_sql_src").collect().map(_.getDouble(0))
    assert(r.getDouble(1) == xs.min && r.getDouble(2) == xs.max)
  }

  test("rank arithmetic survives populations past the q*n Long-overflow bound") {
    // ADVICE r16: (q*n + 999999)/1e6 overflows a Long once n exceeds
    // ~9.2e12 at q=1e6, and math.max then silently returned rank 1 —
    // the MINIMUM — for the highest-ppm targets. The split form must
    // agree with BigInt ceiling division everywhere, overflow regime
    // included, up to n = Long.MaxValue rows.
    val ns = Seq(1L, 999999L, 1000000L, 9214364837600034815L,
      Long.MaxValue, 10000000000000L, 9223372036854775L * 1000L)
    val qs = Seq(1L, 250000L, 500000L, 999999L, 1000000L)
    for (n <- ns; q <- qs) {
      val want = (BigInt(q) * BigInt(n) + 999999) / 1000000
      val wantL = want.max(1).toLong
      assert(KllQuantiles.rankOf(q, n) == wantL, s"q=$q n=$n")
      assert(KllQuantiles.rankOf(q, n) <= n || n == 0L, s"rank must be <= n")
    }
  }

  test("the kll_sketch aggregate itself skips NaN — cube sketches match the recount population") {
    // ADVICE r16: kll_sketch used to count NaN into n (but not mn/mx)
    // while the recount passes exclude NaN — a cube built via SQL over
    // NaN-carrying data would hand exactQuantilesFromSketch a sketch
    // whose n disagrees with the population it brackets
    val data = (1 to 50).map(_.toDouble) ++ Seq.fill(20)(Double.NaN)
    import spark.implicits._
    val sk = data.toDF("x")
      .agg(KllSketch.kllSketch(col("x"), 16).as("s"))
      .selectExpr("s.n", "s.mn", "s.mx").head()
    assert(sk.getLong(0) == 50L, s"NaN must not enter n, got ${sk.getLong(0)}")
    assert(sk.getDouble(1) == 1.0 && sk.getDouble(2) == 50.0)
    // and the cube path over NaN data answers exactly (bracket
    // invariant intact because sketch n == recount population)
    val merged = data.toDF("x")
      .agg(KllSketch.kllSketch(col("x"), 16).as("s"))
      .collect()(0).getStruct(0)
    val got = KllQuantiles.exactQuantilesFromSketch(
      data.toDF("v"), "v", merged, Seq(999999L))
      .collect()(0)
    assert(got.getLong(1) == 50L && got.getDouble(3) == 50.0)
  }

  test("kll_merge rejects a struct with matching names but wrong field types at analysis") {
    // ADVICE r16: name-only validation let array<int> values through
    // to a runtime ClassCastException inside update()
    val e = intercept[Exception] {
      spark.sql(
        """SELECT kll_merge(named_struct(
             'vs', array(1), 'ws', array(1L), 'err', 0L,
             'n', 1L, 'mn', 1.0D, 'mx', 1.0D), 16)""").collect()
    }
    assert(e.getMessage.contains("kll_merge") ||
      e.getMessage.toLowerCase.contains("data type"),
      s"expected an analysis-time type error, got: ${e.getMessage}")
    assert(!e.isInstanceOf[ClassCastException])
  }

  test("non-double input fails analysis, not at runtime") {
    val e = intercept[Exception] {
      Seq("a").toDF("s").agg(KllSketch.kllSketch(col("s"), 16)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("double") ||
      e.getMessage.contains("kll_sketch"))
  }
}
