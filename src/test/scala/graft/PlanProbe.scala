package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.query.datalog.{DatalogCompiler, EdnDatalog}

/** Measured proof that the value-aware clause ordering (VERDICT r12 #1,
  * landed r13) pays for itself on skew — the scenario the blind
  * 0.1-per-constant guess loses: a HOT value covering 90% of an attribute
  * reads as selective and the planner builds the big side first.
  *
  *   sbt "Test/runMain graft.PlanProbe [nA]"
  *
  * Shape: a 3-entity chain A → C → B in one wide doc relation.
  *   A (1.5M): a_status = "hot" for 90% of rows; a_ref → C
  *   C (0.5M): c_flag   = "mid" for 50%;         c_ref → B
  *   B (0.2M): b_tag    = "rare" for 1%
  * Query: count A with [?a :a-status "hot"] [?a :a-ref ?c]
  *        [?c :c-flag "mid"] [?c :c-ref ?b] [?b :b-tag "rare"].
  *
  * With stats OFF the greedy fallback ties A and C (two patterns, one
  * constant each) and tie-breaks to A — the 1.35M-row hot side builds
  * first and the A⋈C intermediate carries ~0.7M rows to the B prune.
  * With stats ON the CMS point estimate ranks B ("rare" ≈ 2k) first, so
  * the chain joins B⋈C⋈A and the intermediates stay in the thousands.
  * Both orders MUST return the same count (the differential suite pins
  * order-invariance); the probe measures the wall and the one-off stats
  * pass. Results recorded in BASELINE.md. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val nA = args.headOption.map(_.toInt).getOrElse(1500000)
    val nC = nA / 3
    val nB = nA * 2 / 15
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // one wide relation, three entity types, nulls off-type (the document
    // store's wide-table face); refs land on real ids so joins have hits
    val a = spark.range(nA.toLong).select(
      concat(lit("a"), col("id")).as("id"),
      when(pmod(col("id"), lit(10)) < 9, "hot").otherwise("cold").as("a_status"),
      concat(lit("c"), pmod(col("id"), lit(nC))).as("a_ref"),
      lit(null).cast("string").as("c_flag"),
      lit(null).cast("string").as("c_ref"),
      lit(null).cast("string").as("b_tag"))
    val c = spark.range(nC.toLong).select(
      concat(lit("c"), col("id")).as("id"),
      lit(null).cast("string").as("a_status"),
      lit(null).cast("string").as("a_ref"),
      when(pmod(col("id"), lit(2)) === 0, "mid").otherwise("off").as("c_flag"),
      concat(lit("b"), pmod(col("id"), lit(nB))).as("c_ref"),
      lit(null).cast("string").as("b_tag"))
    val b = spark.range(nB.toLong).select(
      concat(lit("b"), col("id")).as("id"),
      lit(null).cast("string").as("a_status"),
      lit(null).cast("string").as("a_ref"),
      lit(null).cast("string").as("c_flag"),
      lit(null).cast("string").as("c_ref"),
      when(pmod(col("id"), lit(100)) === 0, "rare").otherwise("common").as("b_tag"))
    val docs = a.unionByName(c).unionByName(b)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // materialize once so both arms read the same cache

    val edn =
      """{:find [(count ?a)]
          :where [[?a :a-status "hot"] [?a :a-ref ?c]
                  [?c :c-flag "mid"]  [?c :c-ref ?b]
                  [?b :b-tag "rare"]]}"""

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def runArm(useStats: Boolean): (Long, Double) = {
      val compiler = new DatalogCompiler(useStats = useStats)
      val (df, _) = time(EdnDatalog.run(docs, edn, compiler)
        .fold(e => throw new IllegalStateException(e), identity))
      val (n, wall) = time(df.head().getLong(0))
      (n, wall)
    }

    // warm both arms once (JIT, codegen; stats arm also pays + caches the
    // stats aggregate — the cache is cold in this fresh JVM), then measure
    val (_, statsPass) = time(runArm(useStats = true)) // includes stats build
    runArm(useStats = false)
    val (nOn, tOn) = runArm(useStats = true)
    val (nOff, tOff) = runArm(useStats = false)
    require(nOn == nOff, s"order changed the ANSWER: $nOn vs $nOff")
    println(f"[planprobe] nA=$nA nC=$nC nB=$nB result=$nOn")
    println(f"[planprobe] stats pass (one-off, incl. first run): $statsPass%.2f s")
    println(f"[planprobe] value-aware ON : $tOn%.2f s")
    println(f"[planprobe] value-aware OFF: $tOff%.2f s  (${tOff / tOn}%.1fx)")
    spark.stop()
  }
}
