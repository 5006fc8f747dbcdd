package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** persist() that tolerates re-derivation of an already-cached plan.
  *
  * Operators persist intermediate frames they iterate over (shingle
  * tables, eps-cell bins, MST edge lists). When the same operator runs
  * repeatedly over the same input — the bench's median-of-5 runs, or a
  * pipeline calling two operators that share a staged frame —
  * the re-derived logical plan is ALREADY in the CacheManager, and a
  * plain `.persist()` logs `WARN CacheManager: Asked to cache already
  * cached data` on every run. `Dataset.storageLevel` performs the same
  * plan-keyed CacheManager lookup, so checking it first keeps the cache
  * hit (and the caller's unpersist discipline) while keeping logs
  * quiet.
  */
object Caching {
  def persistOnce[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
    if (ds.storageLevel != StorageLevel.NONE) ds else ds.persist(level)
}
