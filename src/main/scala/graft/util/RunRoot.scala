package graft.util

import java.nio.file.{Files, Path, Paths}

/** Per-PROCESS scratch root for gate fixtures, segmented-table roots,
  * and streaming staging dirs: `/tmp/graft_run/<pid>/<sub>`.
  *
  * Why pid-qualified: these dirs are reset-on-build, and a stable
  * path means two concurrent JVMs on the same dataset (a bench run
  * next to a correctness run) delete/overwrite each other's staging
  * mid-query — read failures at best, silently wrong gate results at
  * worst. Qualifying by pid makes every process's scratch private.
  *
  * Why it still cannot accumulate (the reason r13 moved fixtures OFF
  * pid paths): the first use in each JVM sweeps the siblings under
  * `/tmp/graft_run` and deletes every one whose pid is no longer alive — dead
  * runs clean themselves up on the next run, no age heuristic.
  *
  * NOT for the quantizer side FILES ([[graft.queries.PipelineQueries]]
  * IvfCentroidsPath etc.): those must survive this JVM because the
  * DuckDB oracle reads them post-exit; they keep their own
  * pid-qualified top-level paths. Also not for content-fingerprinted
  * bench corpus staging (BenchFixtures.bigEventsDir), which is an
  * immutable cache keyed by source fingerprint and deliberately
  * shared across runs.
  */
object RunRoot {

  private lazy val base: Path = {
    val root = Paths.get("/tmp/graft_run")
    Files.createDirectories(root)
    // sweep siblings owned by dead processes (best-effort: a sibling
    // vanishing mid-sweep or a permission oddity must not fail the
    // caller's query)
    val ls = Files.list(root)
    try ls.forEach { p =>
      val alive = p.getFileName.toString.toLongOption.exists(pid =>
        ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false))
      if (!alive) try deleteRecursively(p) catch { case _: java.io.IOException => () }
    } finally ls.close()
    val mine = root.resolve(ProcessHandle.current().pid().toString)
    Files.createDirectories(mine)
    mine
  }

  /** Absolute path of `sub` under this process's private run root. */
  def under(sub: String): String = base.resolve(sub).toString

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
}
