package graft.operators

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** LastCallCache: the one-slot persist pattern behind the expensive
  * signature subtrees (Dedup/Contamination). The subtle contract is the
  * REPEAT case — persist keys on the canonicalized plan, so two calls
  * with the same input share ONE CacheManager entry, and releasing the
  * previous frame must not evict the entry just handed out. */
class OpCacheSpec extends AnyFunSuite with SparkTestSession {

  test("a repeat call with an identical plan keeps the shared cache entry") {
    import spark.implicits._
    val slot = new LastCallCache
    def plan() = Seq(1, 2, 3).toDF("x").filter($"x" > 1)

    val first = slot(plan())
    first.count()
    assert(first.storageLevel != StorageLevel.NONE)

    // same canonical plan: the first call's cache entry must survive the
    // slot rotation (the repeat is exactly when caching pays)
    val second = slot(plan())
    assert(second.storageLevel != StorageLevel.NONE,
      "repeat call evicted the shared cache entry")
    second.count()

    // a DIFFERENT plan still releases the previous entry (bounded: one
    // cached frame per slot)
    val third = slot(Seq(9).toDF("y"))
    third.count()
    assert(third.storageLevel != StorageLevel.NONE)
    assert(first.storageLevel == StorageLevel.NONE,
      "previous entry leaked after the slot moved on")
  }
}
