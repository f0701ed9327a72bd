package graft.operators

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** Pins the lifecycle contract of the IVF serving memos (ServingMemo,
  * LlmVector.scala): LRU-bounded entries, eviction unpersists storage,
  * release drops one session's entries. The contract matters to long-lived
  * sessions sweeping many sfDirs WITHOUT an explicit release — the shipped
  * harnesses hold ≤1 live entry and never hit the cap. */
class ServingMemoSpec extends SparkSpec {

  private def cachedDf(tag: Int) = {
    val df = spark.range(tag * 10L, tag * 10L + 5).toDF("id").cache()
    df.count() // materialize so storage is really pinned
    df
  }

  test("memo caps entries at `cap` and unpersists the LRU evictee") {
    val memo = new ServingMemo(2)
    val d1 = cachedDf(1); val d2 = cachedDf(2); val d3 = cachedDf(3)
    memo.get(spark, "dir1")(d1)
    memo.get(spark, "dir2")(d2)
    assert(memo.size == 2)
    // touch dir1 so dir2 becomes least-recently-used
    memo.get(spark, "dir1")(fail("hit must not rebuild"))
    memo.get(spark, "dir3")(d3) // evicts dir2
    assert(memo.size == 2)
    assert(d2.storageLevel == StorageLevel.NONE, "evictee must be unpersisted")
    assert(d1.storageLevel != StorageLevel.NONE && d3.storageLevel != StorageLevel.NONE,
      "survivors keep their storage")
    // dir2 is gone: the next get rebuilds
    var rebuilt = false
    memo.get(spark, "dir2") { rebuilt = true; cachedDf(4) }
    assert(rebuilt, "an evicted key must rebuild on next access")
    memo.release(spark)
  }

  test("release(session) unpersists and drops all of that session's entries") {
    val memo = new ServingMemo(4)
    val d1 = cachedDf(5); val d2 = cachedDf(6)
    memo.get(spark, "a")(d1)
    memo.get(spark, "b")(d2)
    memo.release(spark)
    assert(memo.size == 0)
    assert(d1.storageLevel == StorageLevel.NONE && d2.storageLevel == StorageLevel.NONE)
  }

  test("a memo hit returns the cached plan without invoking build") {
    val memo = new ServingMemo(2)
    val d = cachedDf(7)
    assert(memo.get(spark, "x")(d) eq d)
    assert(memo.get(spark, "x")(fail("hit must not rebuild")) eq d)
    memo.release(spark)
  }
}
