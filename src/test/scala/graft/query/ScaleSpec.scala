package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of facts hit one hot key
    val facts = spark.range(0, 2000)
      .select((when($"id" % 10 === 0, $"id" % 7).otherwise(0L)).as("k"),
        $"id".as("v"))
    val dims = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"),
      (4L, "four"), (5L, "five"), (6L, "six")).toDF("k", "name")
    val plain = facts.join(dims, Seq("k")).select("k", "v", "name")
    val salted = Scale.saltedJoin(facts, dims, "k", saltFactor = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join must be row-identical to the plain join")
  }

  test("salted count equals plain count") {
    val df = spark.range(0, 5000).select(($"id" % 3).as("k"))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val salted = Scale.saltedCount(df, "k", saltFactor = 8)
      .as[(Long, Long)].collect().toMap
    assert(salted == plain)
  }

  test("dimJoin broadcasts small dims and not huge ones") {
    val facts = graft.core.Tables.lineitem(spark, sf("sf0.001"))
    val dims = graft.core.Tables.nation(spark, sf("sf0.001"))
    val joined = Scale.dimJoin(facts, dims, col("l_suppkey") % 25 === col("n_nationkey"))
    joined.collect()
    assert(joined.queryExecution.executedPlan.toString.contains("Broadcast"),
      "25-row dim must broadcast")
    // with a zeroed threshold the helper must NOT force a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val noBc = Scale.dimJoin(facts, dims, col("l_suppkey") % 25 === col("n_nationkey"))
      assert(!noBc.queryExecution.analyzed.toString.contains("hint"),
        "no broadcast hint when threshold disabled")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
