package graft.table

import org.apache.hadoop.fs.Path

/** Pluggable exclusive metadata lock guarding segment-catalog commits —
  * the Spark-native analogue of the reference's CarbonLockFactory
  * (core/.../core/locks/CarbonLockFactory.java dispatching to
  * LocalFileLock, HdfsFileLock or ZooKeeperLocking by configuration).
  *
  * The commit protocol (write temp → atomic rename of status.json)
  * only needs mutual exclusion among WRITERS; readers never take the
  * lock — they see either the old or the new status file. So the lock
  * choice bounds writer concurrency semantics only:
  *
  *  - [[LocalFileLock]]: correct within one host (JVM monitor + OS
  *    file lock). The single-driver deployment default for LOCAL table
  *    roots; refuses non-local paths rather than silently not locking.
  *  - [[LeaseLock]]: correct across hosts on any filesystem with
  *    atomic create-if-absent — HDFS create(overwrite=false) is
  *    namenode-atomic (the reference's HdfsFileLock primitive), the
  *    local scheme uses O_CREAT|O_EXCL, object stores need their
  *    conditional-put equivalent. Expired leases are stolen so a
  *    crashed driver cannot wedge the table. The default for DFS
  *    table roots.
  *
  * Selected per table via the `lock.impl` property ('local' | 'lease');
  * absent the property, the table root's scheme picks the impl that is
  * actually correct there.
  */
trait MetadataLock {
  /** Run `f` holding the exclusive lock identified by `lockPath`. */
  def withExclusive[T](lockPath: Path)(f: => T): T
}

object MetadataLock {
  /** Table-property dispatch (reference CarbonLockFactory.getCarbonLockObj).
    * `root` breaks the tie when no property is set: local roots get
    * the in-process+OS file lock, DFS roots the lease protocol.
    */
  def forProperties(props: Map[String, String], root: Path): MetadataLock =
    props.get("lock.impl") match {
      case Some("local") => LocalFileLock
      case Some("lease") => new LeaseLock()
      case Some(other) => throw new IllegalArgumentException(
        s"unknown lock.impl '$other' (expected local | lease)")
      case None => forPath(root)
    }

  /** Scheme-appropriate default: see [[forProperties]]. */
  def forPath(p: Path): MetadataLock =
    if (TableIO.isLocal(p)) LocalFileLock else new LeaseLock()
}

/** Two layers: a JVM-level monitor per lock path (FileLock throws
  * OverlappingFileLockException on same-process contention) plus the
  * OS file lock for cross-process exclusion. Correct on one host;
  * drivers on different hosts are NOT excluded (use 'lease' there) —
  * and a non-local lock path is rejected outright, because an OS file
  * lock taken on some unrelated local path would not lock anything.
  */
object LocalFileLock extends MetadataLock {
  private val processLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  override def withExclusive[T](lockPath: Path)(f: => T): T = {
    require(TableIO.isLocal(lockPath),
      s"lock.impl=local cannot lock non-local path $lockPath — " +
        "use lock.impl=lease for DFS table roots")
    val local = java.nio.file.Paths.get(lockPath.toUri.getPath)
    val monitor = processLocks
      .computeIfAbsent(local.toAbsolutePath.toString, _ => new Object)
    monitor.synchronized {
      val ch = java.nio.channels.FileChannel.open(local,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val l = ch.lock()
        try f finally l.release()
      } finally ch.close()
    }
  }
}

/** Cross-host lease lock: acquisition is an atomic create of a lease
  * file holding (owner-token, expiry); contenders poll, and a lease
  * past its expiry is stolen (the crashed-holder path — the reference
  * gets the same liveness from ZooKeeper's ephemeral nodes, and its
  * HdfsFileLock from exactly this atomic-create primitive).
  *
  * Guarantees and limits, stated honestly: on a filesystem with atomic
  * create-if-absent ([[TableIO.atomicCreate]] — namenode-atomic on
  * HDFS, O_EXCL on local), two live holders are impossible while
  * leases are unexpired. A holder that stalls past `ttlMs` (GC pause,
  * partition) can lose the lock while still running — ttl must exceed
  * the longest commit critical section (catalog commits here are
  * millisecond-scale JSON renames, so the default leaves 4+ orders of
  * magnitude slack). The steal path (delete + re-create) is two steps;
  * after a steal race, exactly one contender's create succeeds, and
  * release checks the owner token so a stale holder can never delete
  * a successor's lease.
  */
final class LeaseLock(ttlMs: Long = 60000, pollMs: Long = 20,
                      acquireTimeoutMs: Long = 120000) extends MetadataLock {

  override def withExclusive[T](lockPath: Path)(f: => T): T = {
    val lease = new Path(lockPath.getParent, lockPath.getName + ".lease")
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    var acquired = false
    while (!acquired) {
      // deadline first, so EVERY contention path (including a stuck
      // steal whose delete keeps failing) times out rather than
      // spinning forever
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"timed out acquiring lease $lease after ${acquireTimeoutMs}ms")
      if (TableIO.atomicCreate(lease,
          s"$token:${System.currentTimeMillis() + ttlMs}")) {
        acquired = true
      } else {
        val observed = readContent(lease)
        if (observed.exists(isExpiredContent)) {
          // steal: re-read immediately before deleting and only
          // delete if the lease is byte-identical to the expired
          // content just observed — a fresh lease written in between
          // has a different token/expiry and aborts the steal. The
          // μs between re-read and delete remains a race this
          // primitive cannot close (delete-if-content-matches is not
          // atomic on a plain filesystem); a store with conditional
          // delete should swap that in here.
          if (readContent(lease) == observed)
            try TableIO.delete(lease)
            catch { case _: java.io.IOException => () }
        }
        Thread.sleep(pollMs)
      }
    }
    try f finally {
      // release only a lease we still own — a stolen-from holder must
      // not delete the thief's lease (same narrow re-read caveat as
      // the steal path)
      try {
        if (readContent(lease).exists(_.startsWith(token + ":")))
          TableIO.delete(lease)
      } catch { case _: java.io.IOException => () }
    }
  }

  private def readContent(lease: Path): Option[String] =
    try Some(TableIO.readString(lease))
    catch { case _: java.io.IOException => None }

  private def isExpiredContent(content: String): Boolean = {
    // malformed content is never treated as expired — let the create
    // retry decide
    val parts = content.split(':')
    parts.length == 2 &&
      (try parts(1).toLong < System.currentTimeMillis()
       catch { case _: NumberFormatException => false })
  }
}
