package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc decade probe (test scope): time named SparkEntry gates across
  * scale-factor directories and print a ratio table. The per-round sf10
  * probes (BASELINE.md) kept re-writing this loop by hand — now it's
  * `sbt "Test/runMain graft.ScaleProbe gate1,gate2 dirA dirB [dirC…]"`.
  * Each gate warms once per dir (JIT, codegen, footers), then one timed
  * run; ModelCache/CacheRegistry cleared between gates so timings are
  * order-independent. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val gates = args(0).split(",").toSeq
    val dirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(g: String, d: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(g)(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.CacheRegistry.unpersistAll()
      dt
    }
    println(f"${"gate"}%-24s " + dirs.map(d => f"${d.split('/').last}%10s").mkString(" ") + "  ratios")
    for (g <- gates) {
      graft.core.ModelCache.clear()
      dirs.foreach(time(g, _)) // warm
      val ts = dirs.map(time(g, _))
      val ratios = ts.sliding(2).map { case Seq(a, b) => f"${b / math.max(a, 0.05)}%5.1fx" }.mkString(" ")
      println(f"$g%-24s " + ts.map(t => f"$t%9.2fs").mkString(" ") + s"  $ratios")
    }
    spark.stop()
  }
}
