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

  test("zValue interleaves bits; z-ordered files cover bounded rectangles " +
    "in BOTH dimensions (the property min/max skipping needs)") {
    // hand-checked interleave: x=0b11 y=0b01 → z=0b0111
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(Scale.zValue($"x", $"y")).as[Long].head()
    assert(z == 7L, s"interleave(3, 1) must be 7, got $z")

    // a 64×64 grid, shuffled; z-layout into 16 files must bound EACH
    // file's x-range AND y-range (a y-sorted layout bounds only y — every
    // file then spans all of x, and x-filters can never skip files)
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
    val df = scala.util.Random.shuffle(grid).toDF("x", "y")
    val path = java.nio.file.Files.createTempDirectory("graft-z").toString + "/grid"
    Scale.writeZOrdered(df, path, $"x", $"y", files = 16)
    val spans = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
      .select($"xs", $"ys").as[(Long, Long)].collect()
    assert(spans.length >= 8, s"range partitioner produced ${spans.length} files")
    // 4096 cells / 16 files = 256-cell tiles ≈ 16×16 rectangles (+ edge
    // slack for range-boundary splits); any single-column sort would give
    // 63 for the unsorted dimension on every file
    spans.foreach { case (xs, ys) =>
      assert(xs <= 32 && ys <= 32,
        s"file spans ($xs, $ys) — not a bounded rectangle")
    }
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

  test("writeSizedFiles: file count tracks data volume and target, not input layout") {
    import spark.implicits._
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sized").toString
    val df = (1 to 50000).map(i => (i.toLong, s"payload text for row number $i"))
      .toDF("id", "text")
    // a pathological 200-partition input must still land as `files` files
    val n = Scale.writeSizedFiles(df.repartition(200), dir + "/a", 256L << 10)
    assert(parts(dir + "/a") == n, "returned count must match files on disk")
    assert(n in (2, 200), s"50k rows at 256 KB target: a few files, got $n")
    // half the target → roughly double the files (same estimate, same data)
    val n2 = Scale.writeSizedFiles(df.repartition(200), dir + "/b", 128L << 10)
    assert(n2 == 2 * n || n2 == 2 * n - 1 || n2 == 2 * n + 1,
      s"halving the target must ~double the files: $n -> $n2")
    // files land UNDER target (the estimate overshoots parquet encoding)
    val sizes = new java.io.File(dir + "/a").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length())
    assert(sizes.forall(_ <= (256L << 10)),
      s"every file must stay under target: ${sizes.toSeq}")
  }

  test("rangeJoinBinned equals the naive theta join; plan is an equi-join") {
    import spark.implicits._
    // points spread across bins; intervals of varied length incl. one
    // spanning many bins, one empty (hi == lo), one matching nothing
    val points = (0L until 500L).map(x => (x * 7 % 1000, s"p$x"))
      .toDF("x", "ptag")
    val intervals = Seq(
      (1L, 0L, 100L), (2L, 95L, 110L), (3L, 0L, 1000L), // multi-bin giant
      (4L, 500L, 500L),                                 // empty: matches nothing
      (5L, 2000L, 2100L),                               // beyond all points
      (6L, 999L, 1001L)                                 // boundary: 999 in, 1000 out
    ).toDF("iid", "lo", "hi")
    val binned = Scale.rangeJoinBinned(points, "x", intervals, "lo", "hi", 64)
      .select("iid", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        $"x" >= $"lo" && $"x" < $"hi")
      .select("iid", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive, "binned range join must equal the theta join")
    assert(naive.exists(_._1 == 3L) && !naive.exists(_._1 == 4L))
    // the whole point: candidates meet on the bin EQUI-join, not a loop
    val plan = Scale.rangeJoinBinned(points, "x", intervals, "lo", "hi", 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"binned range join must never plan a nested loop:\n$plan")
    // negative coordinates: floor (not truncate-toward-zero) binning —
    // a point at -1 and an interval [-100, 5) must still meet
    val negP = Seq(-1L, -64L, -65L, 0L, 4L).map(x => Tuple1(x)).toDF("x")
    val negI = Seq((1L, -100L, 5L), (2L, -64L, -1L)).toDF("iid", "lo", "hi")
    val negGot = Scale.rangeJoinBinned(negP, "x", negI, "lo", "hi", 64)
      .select("iid", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val negWant = negP.join(negI, $"x" >= $"lo" && $"x" < $"hi")
      .select("iid", "x").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(negGot == negWant, s"negative-coordinate parity: $negGot vs $negWant")
  }

  test("bloomSemiJoin equals the plain join; probe filters before the join") {
    import spark.implicits._
    val facts = (1L to 2000L).map(i => (i, i % 97, s"f$i")).toDF("fid", "k", "payload")
    val dims = Seq((3L, "a"), (11L, "b"), (96L, "c")).toDF("dk", "tag")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("fid", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bloomed = Scale.bloomSemiJoin(facts, "k", dims, "dk")
    val plain = facts.join(dims, $"k" === $"dk")
    assert(rows(bloomed) == rows(plain),
      "the prefilter is semantics-free: output must equal the plain join")
    // the probe must sit BELOW the join (on the fact scan side), so
    // non-matching facts never reach the join
    val plan = bloomed.queryExecution.executedPlan.toString
    // the probe spells as codegen'd builtins over the broadcast bitmap
    assert(plan.contains("element_at(__bloom"),
      s"bloom probe missing from the plan:\n$plan")
  }

  private implicit class InRange(private val n: Int) {
    def in(r: (Int, Int)): Boolean = n >= r._1 && n <= r._2
  }
}
