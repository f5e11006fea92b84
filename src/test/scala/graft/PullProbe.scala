package graft

import org.apache.spark.sql.SparkSession

/** Forensic probe: run one gate exactly the way Verify does (same session
  * config, same coalesce(1).write) and print the FULL stack on failure —
  * Verify itself prints only the message. */
object PullProbe {
  def main(args: Array[String]): Unit = {
    val gate = if (args.nonEmpty) args(0) else "datalog_pull_recursive"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      SparkEntry.queries(gate)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"/tmp/pullprobe_out/$gate")
      println(s"[pullprobe] $gate OK")
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
