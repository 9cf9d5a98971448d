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

  /** One registration. `claimed` makes the drain-side claim atomic:
    * ConcurrentLinkedQueue iterators are weakly consistent, so two
    * overlapping drains (releaseAll racing a withScope exit) can both
    * visit the same entry before either `it.remove()` lands — without
    * the CAS they would BOTH decrement planRefs for one registration
    * and prematurely unpersist a plan a third live scope still reads.
    * compareAndSet guarantees at most one thread decrements per
    * registration regardless of iterator overlap.
    */
  private final case class Reg(owner: java.lang.Long, df: DataFrame) {
    val claimed = new java.util.concurrent.atomic.AtomicBoolean(false)
  }

  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[Reg]
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
    * a frame when no other live registration shares its plan. BOTH
    * the persist+increment and the decrement+unpersist run INSIDE the
    * compute() remapping function, i.e. under the map's per-key lock:
    * a concurrent persist of the same canonical plan cannot land
    * between a sibling's decrement-to-zero and its unpersist (it
    * either re-caches after the entry is gone, or increments first
    * and the sibling never unpersists). Distinct plans use distinct
    * keys and never contend.
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
    planRefs.compute(planKey(df), (_, c) => {
      df.persist(level) // under the key lock — see planRefs doc
      if (c == null) 1 else c + 1
    })
    frames.add(Reg(current.get(), df))
    df
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
      val reg = it.next()
      // CAS claim first: at most one draining thread processes this
      // registration even if overlapping drains' weakly-consistent
      // iterators both visit it before either remove() lands.
      if (pred(reg.owner) && reg.claimed.compareAndSet(false, true)) {
        // Last-scope-out: only unpersist when no sibling registration
        // shares this canonical plan; the unpersist runs under the
        // same key lock as persist's increment (see planRefs).
        planRefs.compute(planKey(reg.df), (_, c) =>
          if (c == null || c <= 1) { reg.df.unpersist(blocking = false); null }
          else c - 1)
      }
      // Remove claimed entries regardless of which thread claimed them
      // (remove() of an already-removed node is a no-op).
      if (reg.claimed.get()) it.remove()
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
