package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Release handle for persists whose lifetime outlives the function
  * that created them. Several operators (MinHash-LSH builds, k-means
  * index builds, triangle orientation) persist an intermediate frame
  * that the RETURNED lazy DataFrame still reads — the builder cannot
  * unpersist before the caller's terminal action, and the returned
  * frame gives the caller no handle to the cached blocks. Routing
  * those persists through here gives every caller (not just
  * Bench/Verify's session-wide clearCache) an explicit release:
  *
  * {{{
  *   val out = Dedup.minhashLshPairs(...)   // persists via registry
  *   out.collect()                          // terminal action
  *   CacheRegistry.releaseAll()             // drop the cached blocks
  * }}}
  *
  * Self-managed persists (a `finally unpersist` inside the builder,
  * e.g. AnnIvf/Bpe/IvfPq/LinearProbe) do NOT go through the registry.
  */
object CacheRegistry {

  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist `df` and record it for a later [[releaseAll]]. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    frames.add(p)
    p
  }

  /** Unpersist every registered frame (idempotent, thread-safe). */
  def releaseAll(): Unit = {
    var f = frames.poll()
    while (f != null) {
      f.unpersist(blocking = false)
      f = frames.poll()
    }
  }

  /** Number of registered (not yet released) frames — for specs. */
  def outstanding: Int = frames.size()

  /** `df.persistTracked()` sugar for the registry persist. */
  implicit final class TrackedPersist(private val df: DataFrame) extends AnyVal {
    def persistTracked(
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
      CacheRegistry.persist(df, level)
  }
}
