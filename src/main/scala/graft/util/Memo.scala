package graft.util

/** Build-once concurrent cache for the query modules' shared fixtures
  * (quantizer side tables, segmented-table fixtures, bucketed
  * warehouses).
  *
  * `TrieMap.getOrElseUpdate` can evaluate its default concurrently
  * (two threads both run the builder; one insert wins). That is
  * harmless for pure values but not for builders with filesystem side
  * effects — two concurrent Spark jobs overwriting one side-table
  * directory corrupt it. Here the cell is created atomically
  * (`ConcurrentHashMap.computeIfAbsent` of a lazy thunk) and the lazy
  * initializer serializes evaluation, so a builder runs EXACTLY once
  * per key and late callers block until it finishes. This is what
  * makes Verify's parallel dump safe.
  *
  * Same method name/shape as the TrieMap it replaces, so call sites
  * are unchanged.
  */
final class BuildOnce[T] {
  private val cells =
    new java.util.concurrent.ConcurrentHashMap[String, () => T]()

  def getOrElseUpdate(key: String, build: => T): T =
    cells.computeIfAbsent(key,
      new java.util.function.Function[String, () => T] {
        def apply(k: String): () => T = { lazy val v: T = build; () => v }
      })()
}

/** [[BuildOnce]] with a structured key — for caches keyed by plan
  * identity rather than a string (e.g. AnnSession's candidate pools).
  * Same exactly-once guarantee: the builder of a key runs once even
  * under racing callers, so side effects (persist()) never leak a
  * loser's copy.
  */
final class BuildOnceKeyed[K, T] {
  private val cells =
    new java.util.concurrent.ConcurrentHashMap[K, () => T]()

  def getOrElseUpdate(key: K, build: => T): T =
    cells.computeIfAbsent(key,
      new java.util.function.Function[K, () => T] {
        def apply(k: K): () => T = { lazy val v: T = build; () => v }
      })()

  def size: Int = cells.size

  /** Evaluated values of all cells (every inserted cell was evaluated
    * by its creator, so this forces nothing new in practice).
    */
  def values: Iterable[T] = {
    import scala.jdk.CollectionConverters._
    cells.values.asScala.map(_())
  }

  def clear(): Unit = cells.clear()
}
