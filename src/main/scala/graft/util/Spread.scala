package graft.util

import org.apache.spark.sql.DataFrame

/** Guarded task-parallelism lift for CPU-bound per-row stages, shared
  * by the dedup, similarity, and pipeline-query surfaces (one
  * implementation so the partition-count probe and threshold cannot
  * drift between copies).
  *
  * Local corpora collapse to one scan partition, starving CPU-bound
  * text/vector stages of task parallelism; at warehouse scale the
  * scan arrives with thousands of partitions and this is a no-op — it
  * can never shuffle a real corpus or REDUCE parallelism the way an
  * unconditional repartition can. `df.rdd` forces physical PLANNING
  * (not execution) to learn the partition count — a once-per-query
  * driver cost the session pays at execution anyway, accepted in
  * preference to guessing from logical-plan statistics.
  */
private[graft] object Spread {
  def toCpuParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
