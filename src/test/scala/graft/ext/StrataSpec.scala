package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r16: the spread width is SCALE-ADAPTIVE — the configured shuffle width
  * capped by estimated input bytes per task. A fixed session-width spread
  * cost ~100 ms of plan-deserialization CPU per near-empty task at bench
  * scale (text_top_terms cpu 4.6 → 23.4 s with FLAT wall when spread at a
  * fixed 32); deriving width from plan-time size stats keeps tiny inputs
  * at few fat tasks while any real corpus saturates the configured width. */
class StrataSpec extends SparkSpec {
  import spark.implicits._

  private def parts(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("spread width caps at 1 for tiny inputs (default 8 MB/task target)") {
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("id", "text")
    // ~a few KB of input: the byte cap binds far below the shuffle width
    assert(parts(Strata.spreadById(docs, "id")) === 1)
    assert(parts(Strata.spread(docs)) === 1)
  }

  test("spread width saturates the configured shuffle width when bytes demand it") {
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("id", "text")
    spark.conf.set("spark.graft.spread.targetBytesPerTask", "16")
    try {
      // bytes/16 ≫ 4 → the shuffle-partitions cap binds (the 100 TB regime)
      val conf = spark.conf.get("spark.sql.shuffle.partitions").toInt
      assert(parts(Strata.spreadById(docs, "id")) === conf)
      assert(parts(Strata.spread(docs)) === conf)
    } finally spark.conf.unset("spark.graft.spread.targetBytesPerTask")
  }

  test("spread is a pure re-layout: row multiset unchanged at any width") {
    val docs = (1L to 500L).map(i => (i, s"text $i")).toDF("id", "text")
    for (target <- Seq("1", "1024", (8L << 20).toString)) {
      spark.conf.set("spark.graft.spread.targetBytesPerTask", target)
      try {
        assert(Strata.spreadById(docs, "id").as[(Long, String)].collect().sorted
          === docs.as[(Long, String)].collect().sorted)
      } finally spark.conf.unset("spark.graft.spread.targetBytesPerTask")
    }
  }

  test("a non-positive target disables the byte cap (falls back to shuffle width)") {
    val docs = (1L to 10L).map(i => (i, "t")).toDF("id", "text")
    spark.conf.set("spark.graft.spread.targetBytesPerTask", "0")
    try {
      val conf = spark.conf.get("spark.sql.shuffle.partitions").toInt
      assert(parts(Strata.spreadById(docs, "id")) === conf)
    } finally spark.conf.unset("spark.graft.spread.targetBytesPerTask")
  }

  test("stratumRank fails LOUD on a high-cardinality stratum (driver-row guard)") {
    // VERDICT r16 #4: phase 2 collects partitions × strata rows to the
    // driver — fine for language strata, a silent OOM for a caller who
    // passes a near-unique stratum. The guard must throw with the knob's
    // name BEFORE collecting, and a legit stratum must be unaffected.
    val docs = (1L to 2000L).map(i => (i, s"s$i", i % 7)).toDF("id", "stratum", "v")
    spark.conf.set("spark.graft.strata.maxDriverRows", "100")
    try {
      val e = intercept[IllegalStateException] {
        Strata.stratumRank(docs, "stratum", Seq(col("id"))).count()
      }
      assert(e.getMessage.contains("maxDriverRows"))
      // a 7-value stratum stays well under the same tiny bound per
      // partition count — the guard must not fire on the legit shape
      val low = (1L to 2000L).map(i => (i, s"lang${i % 7}", i)).toDF("id", "stratum", "v")
      val ranked = Strata.stratumRank(low, "stratum", Seq(col("id")))
      assert(ranked.count() === 2000L)
    } finally {
      spark.conf.unset("spark.graft.strata.maxDriverRows")
      graft.core.CacheRegistry.unpersistAll()
    }
  }
}
