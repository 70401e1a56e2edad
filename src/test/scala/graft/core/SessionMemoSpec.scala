package graft.core

import graft.SparkSpecBase

class SessionMemoSpec extends SparkSpecBase {

  test("memo: caches per key, LRU-bounds the entry count, and " +
    "evictSession clears everything the session pinned") {
    val memo = new SessionMemo[Int](maxEntries = 3)
    var computes = 0
    def get(k: String): Int =
      memo.getOrElseUpdate(spark, k, { computes += 1; k.length })
    assert(get("aa") == 2 && get("aa") == 2)
    assert(computes == 1, "second read must hit the cache")
    get("bbb"); get("cccc")
    assert(memo.size == 3 && computes == 3)
    // touch "aa" so it is most-recently-used, then overflow: the LRU
    // victim must be "bbb", not "aa"
    get("aa")
    get("ddddd")
    assert(memo.size == 3)
    assert(memo.contains(spark, "aa") && !memo.contains(spark, "bbb"))
    assert(memo.contains(spark, "ddddd"))
    // a dropped entry recomputes on next use — pure cache semantics
    val before = computes
    get("bbb")
    assert(computes == before + 1)
    // session eviction clears every entry (the application-end
    // listener calls exactly this)
    memo.evictSession(spark)
    assert(memo.size == 0)
    val b2 = computes
    get("aa")
    assert(computes == b2 + 1, "post-eviction read must recompute")
  }

  test("memo: a dropped entry's Dataset is UNPERSISTED — LRU victims, " +
    "tuple members, and session eviction all free their cache blocks " +
    "(ADVICE r11)") {
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    def cached(n: Int): DataFrame = {
      val df = (1 to n).toDF("x").persist(StorageLevel.MEMORY_ONLY)
      df.count() // materialize so storageLevel reflects a live cache
      df
    }
    val memo = new SessionMemo[DataFrame](maxEntries = 1)
    val a = memo.getOrElseUpdate(spark, "a", cached(3))
    assert(a.storageLevel != StorageLevel.NONE)
    val b = memo.getOrElseUpdate(spark, "b", cached(4))
    assert(a.storageLevel == StorageLevel.NONE,
      "LRU victim must be unpersisted")
    assert(b.storageLevel != StorageLevel.NONE)
    memo.evictSession(spark)
    assert(b.storageLevel == StorageLevel.NONE,
      "session eviction must unpersist")
    // tuple values: every Dataset member releases
    val tmemo = new SessionMemo[(DataFrame, DataFrame)](maxEntries = 1)
    val (t1, t2) =
      tmemo.getOrElseUpdate(spark, "t", (cached(2), cached(5)))
    tmemo.evictSession(spark)
    assert(t1.storageLevel == StorageLevel.NONE &&
      t2.storageLevel == StorageLevel.NONE,
      "tuple members must be unpersisted")
  }
}
