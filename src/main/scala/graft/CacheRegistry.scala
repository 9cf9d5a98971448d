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

  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[(java.lang.Long, DataFrame)]
  private val nextScope = new java.util.concurrent.atomic.AtomicLong(0L)
  private val current = new ThreadLocal[java.lang.Long] // null = unscoped

  /** Spark's CacheManager lives in SharedState and dedupes cached
    * plans by CANONICAL EQUALITY across the whole SparkContext — two
    * concurrent runners executing the SAME query persist
    * plan-identical frames that share ONE cache entry, so the first
    * scope to release would unpersist blocks the sibling's in-flight
    * job is still reading (BlockNotFoundException under QueryBench's
    * rotated mix at N ≥ 16, where same-query overlap is guaranteed).
    * This refcount over the same canonical-plan key CacheManager
    * dedupes on makes release last-scope-out: drain() only unpersists
    * a frame when no other live registration shares its plan.
    * compute() gives atomic inc/dec; the residual window (B persists
    * while A's count hits 0 mid-unpersist) re-caches from scratch —
    * a recompute, never a wrong result.
    */
  private val planRefs = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Integer]

  private def planKey(df: DataFrame) =
    df.queryExecution.analyzed.canonicalized

  /** Persist `df` and record it — under the current thread's scope if
    * one is active ([[withScope]]), else globally — for a later
    * release.
    */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    planRefs.compute(planKey(p), (_, c) => if (c == null) 1 else c + 1)
    frames.add((current.get(), p))
    p
  }

  /** Unpersist EVERY registered frame, scoped or not (idempotent,
    * thread-safe) — the serial Bench/Verify per-query hygiene, where
    * exactly one query's frames are outstanding. A CONCURRENT query
    * runner must not call this (it would drop frames a sibling query
    * still reads); wrap each query in [[withScope]] instead.
    */
  def releaseAll(): Unit = drain(_ => true)

  /** Run `body` in its own registration scope: frames registered on
    * THIS THREAD inside it are released when it completes (after the
    * terminal action, which happens inside `body`), while other
    * threads' — and enclosing scopes' — registrations stay cached.
    * This is the isolation contract concurrent query runners need;
    * scopes nest (the enclosing scope resumes on exit).
    */
  def withScope[T](body: => T): T = {
    val prev = current.get()
    val id = java.lang.Long.valueOf(nextScope.incrementAndGet())
    current.set(id)
    try body
    finally {
      current.set(prev)
      drain(owner => owner != null && owner.longValue() == id.longValue())
    }
  }

  private def drain(pred: java.lang.Long => Boolean): Unit = {
    val it = frames.iterator()
    while (it.hasNext) {
      val (owner, f) = it.next()
      if (pred(owner)) {
        // Last-scope-out: only unpersist when no sibling registration
        // shares this canonical plan (see planRefs).
        val remaining = planRefs.compute(planKey(f),
          (_, c) => if (c == null || c <= 1) null else c - 1)
        if (remaining == null) f.unpersist(blocking = false)
        it.remove()
      }
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
