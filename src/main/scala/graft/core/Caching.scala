package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** persist() that tolerates re-derivation of an already-cached plan —
  * WITH ownership, so release is safe.
  *
  * Operators persist intermediate frames they iterate over (shingle
  * tables, eps-cell bins, MST edge lists). When the same operator runs
  * repeatedly over the same input — the bench's median-of-5 runs, or a
  * pipeline calling two operators that share a staged frame — the
  * re-derived logical plan is ALREADY in the CacheManager, and a plain
  * `.persist()` logs `WARN CacheManager: Asked to cache already cached
  * data` on every run. `Dataset.storageLevel` performs the same
  * plan-keyed CacheManager lookup, so checking it first keeps the cache
  * hit while keeping logs quiet.
  *
  * The lookup alone is not enough: an operator that finds the plan
  * already cached did NOT create that cache, so unpersisting it on exit
  * would evict the CALLER's cache mid-pipeline (e.g. a user persists a
  * shingle frame, calls two dedup passes over it, and the first pass
  * silently drops the cache the second one needed). [[acquire]] returns
  * a [[Cached]] handle that records whether THIS call persisted;
  * `release()` unpersists only in that case.
  */
object Caching {

  /** A frame plus whether this acquisition created its cache. */
  final class Cached[T] private[Caching] (val ds: Dataset[T], val owned: Boolean) {
    /** Unpersist ONLY when this acquisition persisted the frame — never
      * evicts a cache the caller (or a sibling operator) created. */
    def release(): Unit = if (owned) { ds.unpersist(); () }
  }

  /** Persist `ds` unless an equal plan is already cached; the returned
    * handle's `owned` says whether this call created the cache (and so
    * whether `release()` will drop it). */
  def acquire[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Cached[T] =
    if (ds.storageLevel != StorageLevel.NONE) new Cached(ds, owned = false)
    else new Cached(ds.persist(level), owned = true)

  /** Deferred-release registry for operator-created caches whose result
    * frame must stay cached until the CALLER consumes it (so the operator
    * can't unpersist on return). Thread-local, same ownership rule as
    * [[Cached.release]]: only caches acquired as owned register. Wrappers
    * that fully consume results (Verify, Bench, a pipeline step boundary)
    * call [[releaseTracked]] so blocks don't accumulate over a session. */
  private val tracked = new ThreadLocal[List[Dataset[_]]] {
    override def initialValue(): List[Dataset[_]] = Nil
  }

  /** Register an owned cache for deferred release. */
  def register(ds: Dataset[_]): Unit = tracked.set(ds :: tracked.get)

  /** Persist (unless already cached) AND register for deferred release;
    * returns the cached frame. */
  def acquireTracked[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    val c = acquire(ds, level)
    if (c.owned) register(c.ds)
    c.ds
  }

  def releaseTracked(): Unit = {
    tracked.get.foreach(_.unpersist(false))
    tracked.set(Nil)
  }
}
