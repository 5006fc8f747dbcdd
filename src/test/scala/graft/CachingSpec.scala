package graft

import graft.core.Caching
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Ownership contract of Caching.acquire: release() drops ONLY caches
  * this acquisition created, so an operator can never evict a frame its
  * caller persisted (the mid-pipeline cache-loss bug). */
class CachingSpec extends SparkSpec {

  test("acquire on an uncached plan owns it; release drops it") {
    val df = spark.range(100).toDF("x").select(col("x") * 2 as "y")
    val c = Caching.acquire(df)
    assert(c.owned)
    assert(c.ds.storageLevel != StorageLevel.NONE)
    c.release()
    assert(c.ds.storageLevel == StorageLevel.NONE)
  }

  test("acquire on a caller-cached plan does NOT own it; release is a no-op") {
    val df = spark.range(100).toDF("x").select(col("x") + 1 as "y").persist()
    try {
      df.count() // materialize the caller's cache
      // the operator re-derives an EQUAL plan (the CacheManager is
      // plan-keyed, so storageLevel sees the caller's entry)
      val rederived = spark.range(100).toDF("x").select(col("x") + 1 as "y")
      val c = Caching.acquire(rederived)
      assert(!c.owned)
      c.release()
      // the caller's cache must survive the operator's exit
      assert(df.storageLevel != StorageLevel.NONE,
        "operator release evicted the caller's cache")
    } finally { df.unpersist(); () }
  }

  test("an operator over a caller-persisted input leaves the cache intact") {
    // end-to-end shape of the ADVICE defect: KMeansLloyd persists the
    // exact projection it derives; a caller who persisted that same
    // plan first must still hold the cache after fit() returns
    val pts = spark.range(40).select(
      col("id"),
      array((col("id") % 7).cast("double"), (col("id") % 3).cast("double"))
        .cast("array<double>").as("v"))
    val callerCached = pts.select(col("id").as("id"),
      col("v").cast("array<double>").as("v")).persist()
    try {
      callerCached.count()
      val (model, assigned) =
        graft.operators.KMeansLloyd.fit(pts, "id", "v", k = 2, dim = 2,
          seed = 7L, rounds = 1)
      assert(model.cents.size == 2 && assigned.count() == 40)
      assert(callerCached.storageLevel != StorageLevel.NONE,
        "KMeansLloyd.fit evicted the caller's cache")
    } finally { callerCached.unpersist(); () }
  }
}
