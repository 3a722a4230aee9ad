package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch event-sequence analytics — the funnel / sessionization
  * operators behind the e06/e07 gates and the `graft_funnel` /
  * `graft_sessionize` SQL table functions. Inputs need (user_id,
  * ts epoch-nanos, event_type); route raw sources through
  * [[graft.Tables.normalizeEventTs]] first.
  *
  * Both build PURE plans (no persist/collect/checkpoint) so the SQL
  * TVF builders can call them at analysis time — the lazy-builder
  * discipline every FROM-able graft function observes.
  */
object EventAnalytics {

  /** Strict first-occurrence ORDERED FUNNEL (the e06 operator): a
    * user converts stage 2 only with an `s2` event strictly after
    * their FIRST `s1`, stage 3 only strictly after that first
    * qualifying `s2` — deterministic first-touch attribution. ALWAYS
    * emits exactly 3 rows (stage, step, n_users, conv_ppm); a stage
    * nobody reached reports 0 with NULL conv_ppm on an empty corpus
    * (x DIV 0), matching the streaming twin (st16) and the oracle.
    *
    * Scale shape: three user-keyed aggregations chained by user-keyed
    * joins, each stage's frame shrinking to its converters; the
    * closing totals join broadcasts a 1-row count. Exact integer ppm.
    */
  def funnel(events: DataFrame, s1: String, s2: String,
             s3: String): DataFrame =
    funnelImpl(events, s1, s2, s3, None)

  /** WINDOWED funnel (the e08 operator): [[funnel]] semantics plus a
    * conversion DEADLINE — each step counts only within `windowNs` of
    * the previous step's first-touch timestamp (click ≤ first view +
    * W, purchase ≤ first qualifying click + W), the "converted within
    * N days" read every product funnel actually reports. The deadline
    * binds per STEP, not end-to-end, and attribution stays strict
    * first-occurrence: the first in-window event is the conversion,
    * and a user whose only qualifying events fall past the deadline
    * drops out of that stage AND all later ones. Same scale shape as
    * the unwindowed funnel — the filter tightens the per-stage frames,
    * it never adds a shuffle.
    */
  def funnelWindowed(events: DataFrame, s1: String, s2: String,
                     s3: String, windowNs: Long): DataFrame = {
    require(windowNs > 0, s"windowNs must be positive, got $windowNs")
    funnelImpl(events, s1, s2, s3, Some(windowNs))
  }

  private def funnelImpl(events: DataFrame, s1: String, s2: String,
                         s3: String, windowNs: Option[Long]): DataFrame = {
    def within(prev: org.apache.spark.sql.Column) =
      windowNs.fold(lit(true))(w => col("ts") <= prev + lit(w))
    val e = events.select(col("user_id"), col("ts"), col("event_type"))
    val ta = e.filter(col("event_type") === s1)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ta"))
    val tb = e.filter(col("event_type") === s2)
      .join(ta, "user_id").filter(col("ts") > col("ta") && within(col("ta")))
      .groupBy(col("user_id")).agg(min(col("ts")).as("tb"))
    val tc = e.filter(col("event_type") === s3)
      .join(tb, "user_id").filter(col("ts") > col("tb") && within(col("tb")))
      .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
    def stage(df: DataFrame, n: Int, step: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(n).as("stage"), lit(step).as("step"), col("n_users"))
    val stages = stage(ta, 1, s1)
      .unionByName(stage(tb, 2, s2))
      .unionByName(stage(tc, 3, s3))
    val tot = ta.agg(count(lit(1)).as("tot"))
    stages.crossJoin(broadcast(tot))
      .select(col("stage"), col("step"), col("n_users"),
        expr("CAST(n_users * 1000000 DIV tot AS BIGINT)").as("conv_ppm"))
  }

  /** Gap-based batch SESSIONIZATION (the e07 operator): per user,
    * events closer than `gapMinutes` merge into one session; emits
    * (user_id, n_sessions, max_events, max_dur_ms). One user-keyed
    * window pass (lag-gap flags + running sum = session ids), one
    * (user, session) agg, one user agg — every shuffle keyed, and
    * durations are integral ms so the figures replay exactly.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes >= 1, s"gapMinutes must be positive, got $gapMinutes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapNs = gapMinutes * 60L * 1000000000L
    val flagged = events.select(col("user_id"), col("ts"))
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("ts") - col("__prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .select(col("user_id"), col("n_events"),
        expr("CAST((mx - mn) DIV 1000000 AS BIGINT)").as("dur_ms"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_events"),
        max(col("dur_ms")).as("max_dur_ms"))
  }
}
