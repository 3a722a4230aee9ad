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

  /** Marker file recording the OWNING process's start instant, so a
    * dir left by a dead run whose pid the OS later recycled is
    * distinguishable from the live owner's dir: same pid, different
    * start instant => stale, clear it.
    */
  private val BootMarker = ".boot_instant"

  private def startInstantOf(h: ProcessHandle): Option[String] =
    Option(h.info().startInstant().orElse(null)).map(_.toString)

  private lazy val base: Path = {
    val root = Paths.get("/tmp/graft_run")
    Files.createDirectories(root)
    val myStart = startInstantOf(ProcessHandle.current()).getOrElse("")
    // sweep siblings owned by dead processes (best-effort: a sibling
    // vanishing mid-sweep throws UncheckedIOException from the lazy
    // Files.walk, a permission oddity throws IOException — neither
    // may fail the caller's query)
    val ls = Files.list(root)
    try ls.forEach { p =>
      // the whole per-entry verdict is best-effort: a sibling (or its
      // marker) deleted by a concurrent process between the exists
      // probe and the read throws NoSuchFileException — treat an
      // unreadable entry as not-stale and skip it, never fail the
      // caller's query
      val stale = try {
        p.getFileName.toString.toLongOption.forall { pid =>
          val h = ProcessHandle.of(pid)
          if (!h.map[Boolean](_.isAlive).orElse(false)) true
          else {
            // pid is alive — but is it the run that created this dir?
            // A recycled pid's dir carries the DEAD run's boot marker.
            val marker = p.resolve(BootMarker)
            Files.exists(marker) && {
              val recorded = new String(
                Files.readAllBytes(marker), java.nio.charset.StandardCharsets.UTF_8)
              startInstantOf(h.get()).exists(_ != recorded)
            }
          }
        }
      } catch { case scala.util.control.NonFatal(_) => false }
      if (stale)
        try deleteRecursively(p)
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ls.close()
    val mine = root.resolve(ProcessHandle.current().pid().toString)
    // adopt-protection for our OWN pid: a leftover dir from a dead run
    // that happened to get our pid must not be silently inherited
    val myMarker = mine.resolve(BootMarker)
    if (Files.exists(mine) && {
      // same best-effort rule: an unreadable marker (concurrent sweep
      // deleted it mid-check) counts as not-ours => clear and recreate
      try !Files.exists(myMarker) || new String(Files.readAllBytes(myMarker),
        java.nio.charset.StandardCharsets.UTF_8) != myStart
      catch { case scala.util.control.NonFatal(_) => true }
    }) try deleteRecursively(mine) catch { case scala.util.control.NonFatal(_) => () }
    Files.createDirectories(mine)
    Files.write(myMarker, myStart.getBytes(java.nio.charset.StandardCharsets.UTF_8))
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
