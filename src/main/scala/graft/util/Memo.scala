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
