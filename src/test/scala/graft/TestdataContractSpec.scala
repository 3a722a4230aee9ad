package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The engine's contract with the driver-generated testdata: every
  * entry point assumes these columns with one of these types. The
  * round-10 incident (events.ts regenerated from TIMESTAMP(NANOS) to
  * timestamp[us], 8 gates dead at analysis) showed a silent schema
  * drift surfaces as dozens of cryptic failures — this spec makes the
  * NEXT drift fail in one place with a readable diff, and records
  * which encodings each column is allowed to arrive in (the
  * type-adaptive readers — `Tables.normalizeEventTs`, the double-
  * tolerant similarity kernels — define the accepted sets).
  */
class TestdataContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // what Tables.normalizeEventTs actually adapts: epoch-long or a real
  // timestamp — NOT DateType (the normalizer rejects it by design)
  private val eventTimeLike: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)
  // what the date queries (year(), BETWEEN date literals) analyze over
  private val dateLike: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)
  private val vecLike: Set[DataType] =
    Set(ArrayType(FloatType), ArrayType(DoubleType),
      ArrayType(FloatType, containsNull = false),
      ArrayType(DoubleType, containsNull = false))
  private def exact(t: DataType): Set[DataType] = Set(t)
  private val intLike: Set[DataType] = Set(IntegerType, LongType)

  /** table -> (column -> accepted types). */
  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> intLike, "r_name" -> exact(StringType)),
    "nation" -> Map("n_nationkey" -> intLike, "n_name" -> exact(StringType),
      "n_regionkey" -> intLike),
    "customer" -> Map("c_custkey" -> intLike, "c_name" -> exact(StringType),
      "c_nationkey" -> intLike, "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "supplier" -> Map("s_suppkey" -> intLike, "s_name" -> exact(StringType),
      "s_nationkey" -> intLike, "s_acctbal" -> exact(DoubleType)),
    "part" -> Map("p_partkey" -> intLike, "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
      "p_size" -> intLike, "p_retailprice" -> exact(DoubleType)),
    "orders" -> Map("o_orderkey" -> intLike, "o_custkey" -> intLike,
      "o_orderstatus" -> exact(StringType), "o_totalprice" -> exact(DoubleType),
      "o_orderdate" -> dateLike, "o_orderpriority" -> exact(StringType)),
    "lineitem" -> Map("l_orderkey" -> intLike, "l_partkey" -> intLike,
      "l_suppkey" -> intLike, "l_linenumber" -> intLike,
      "l_quantity" -> exact(DoubleType), "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType), "l_linestatus" -> exact(StringType),
      "l_shipdate" -> dateLike),
    "events" -> Map("event_id" -> intLike, "ts" -> eventTimeLike,
      "user_id" -> intLike, "event_type" -> exact(StringType),
      "value" -> exact(DoubleType), "props" -> exact(StringType)),
    "documents" -> Map("doc_id" -> intLike, "text" -> exact(StringType),
      "lang" -> exact(StringType), "source" -> exact(StringType),
      "n_chars" -> intLike),
    "embeddings" -> Map("vec_id" -> intLike, "embedding" -> vecLike,
      "label" -> intLike)
  )

  test("every testdata table carries the columns and accepted types the engine assumes") {
    val problems = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      // events must go through rawEvents: it sets nanosAsLong so a
      // legacy TIMESTAMP(NANOS) file reports as LongType here instead
      // of crashing schema inference (order-dependently) with
      // PARQUET_TYPE_ILLEGAL before the readable diff is produced
      val schema =
        if (table == "events") Tables.rawEvents(spark, TestSpark.sf).schema
        else Tables.load(spark, TestSpark.sf, table).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      cols.toSeq.sortBy(_._1).flatMap { case (name, accepted) =>
        byName.get(name) match {
          case None =>
            Some(s"$table.$name: MISSING (present: ${schema.fieldNames.mkString(",")})")
          case Some(dt) if !accepted.contains(dt) =>
            Some(s"$table.$name: regenerated as ${dt.simpleString}, engine accepts " +
              accepted.map(_.simpleString).mkString("{", ", ", "}") +
              " — extend the matching type-adaptive reader, don't patch call sites")
          case _ => None
        }
      }
    }
    assert(problems.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT (${problems.size}):\n${problems.mkString("\n")}\n")
  }

  test("documents text honors the ASCII payload-synth contract") {
    // the multimodal synthesizers index UTF-8 BYTES while their
    // oracles index CHARACTERS (Multimodal.scala's documented
    // ASCII-only contract) — equal only at one byte per char. A
    // regenerated corpus with multi-byte text must fail HERE with the
    // contract named, not as m02/m05/m06 hash mismatches.
    // NOTE (r13): this pins the RAW testdata only. Multibyte coverage
    // for the text family comes from the DERIVED u-corpus — t43/t46
    // substitute 2-/3-/4-byte code points in-gate (PipelineQueries
    // .utf8ify) and are oracle-gated on it, so "ASCII testdata" no
    // longer means "UTF-8 untested".
    import org.apache.spark.sql.functions.{col, length, octet_length}
    val nonAscii = Tables.documents(spark, TestSpark.sf)
      .filter(length(col("text")) =!= octet_length(col("text")))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii documents carry multi-byte text — the Multimodal " +
        "payload-synth/oracle pair assumes ASCII (see Multimodal.scala); " +
        "switch the synth fill to a byte-count column or make the " +
        "oracles index bytes")
  }

  test("documents n_chars equals text length (the dedup-gate invariant)") {
    // st04/st05 gate streaming dedup by aggregating n_chars as a pure
    // function of the dedup key md5(text) — true only while
    // n_chars == len(text). A corpus regeneration that breaks this
    // must fail here by name, not as a dedup hash mismatch.
    import org.apache.spark.sql.functions.{col, length}
    val drift = Tables.documents(spark, TestSpark.sf)
      .filter(col("n_chars") =!= length(col("text"))).count()
    assert(drift == 0,
      s"$drift documents have n_chars != len(text) — st04/st05's " +
        "arrival-order-independent gating leans on this invariant")
  }

  test("documents vocabulary has at least 25 types (the t36 coverage-curve domain)") {
    // t36 reports coverage at k = 5/10/25 — a regenerated corpus with
    // a smaller vocabulary would silently emit fewer rows on both
    // engines (still hash-green) while the gate's k=25 point vanishes;
    // fail here by name instead.
    import org.apache.spark.sql.functions.{col, explode}
    val vocab = Tables.documents(spark, TestSpark.sf)
      .select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .distinct().count()
    assert(vocab >= 25,
      s"vocabulary has only $vocab types — t36_vocab_coverage samples " +
        "the curve at k=25; shrink its k grid with the corpus")
  }

  test("events (user_id, ts) pairs are collision-free (the st14 determinism invariant)") {
    // st14's custom-state anomaly emission is made deterministic by a
    // per-group ts sort — unique (user_id, ts) pairs are what make
    // that sort total. Named failure here beats a flaky st14.
    import org.apache.spark.sql.functions.{col, count, lit}
    val dupes = Tables.events(spark, TestSpark.sf)
      .groupBy(col("user_id"), col("ts")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dupes == 0,
      s"$dupes duplicate (user_id, ts) pairs — st14's per-group sort " +
        "is no longer total; add event_id to the sort key there")
  }

  test("the normalized events surface is stable whatever the storage encoding") {
    val ev = Tables.events(spark, TestSpark.sf)
    assert(ev.schema("ts").dataType == LongType, "normalizeEventTs must yield epoch-ns longs")
    // sanity: values are plausible epoch-nanos (year 2000..2100)
    val (mn, mx) = ev.agg(org.apache.spark.sql.functions.min("ts"),
      org.apache.spark.sql.functions.max("ts"))
      .collect()(0) match { case r => (r.getLong(0), r.getLong(1)) }
    assert(mn > 946684800L * 1000000000L && mx < 4102444800L * 1000000000L,
      s"ts out of epoch-ns range: [$mn, $mx]")
  }
}
