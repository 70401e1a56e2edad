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
}
