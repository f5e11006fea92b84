package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.registry.FunctionRegistry
import graft.store.DocumentStore
import graft.stream.AlertScheduler

/** Decade probe for the alert scheduler's poll (T20): `tick` runs every
  * second forever against a version log that only grows, so its latency
  * must stay ~flat as the log grows 100× — a linearly-growing tick
  * eventually eats the whole poll period. Usage:
  *
  *   sbt "Test/runMain graft.AlertTickProbe [vol1,vol2,vol3]"
  *
  * Each leg builds a temp store with N bulk document versions spread over
  * 30 valid-date partitions (compacted — the id-clustered layout a real
  * deployment's periodic compaction produces), registers a handful of due
  * + future alerts, fires the due ones, then times STEADY-STATE ticks
  * (scan + no due work). Prints a ratio table like ScaleProbe; results
  * recorded in BASELINE.md. */
object AlertTickProbe {
  def main(args: Array[String]): Unit = {
    val volumes =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toInt).toSeq
      else Seq(20000, 200000, 2000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val registry = new FunctionRegistry
    registry.registerTransactor("noop", _ => ())
    val results = volumes.map { n =>
      val path = java.nio.file.Files
        .createTempDirectory("alert-probe").toString + "/db"
      val store = DocumentStore(spark, path)
      val days = 30
      val perDay = math.max(1, n / days)
      val nowMs = System.currentTimeMillis()
      for (k <- 0 until days) {
        val vf = new Timestamp(nowMs - (days - k).toLong * 86400000L)
        val batch = spark.range(perDay.toLong).select(
          concat(lit(s"doc/d$k/"), col("id")).as("id"),
          concat(lit("""{"seq":"""), col("id"), lit(""","day":""" + k + "}"))
            .as("doc"))
        store.putBatch(batch, validFrom = Some(vf))
      }
      store.compact() // the layout a real deployment's compaction keeps
      // control-plane-scale alert population: 5 due now, 50 scheduled
      for (i <- 1 to 5)
        store.put(s"app$i/alert",
          """{"appName":"a","alertHandler":"noop","alertParams":[]}""",
          validFrom = Some(new Timestamp(nowMs - 1000)))
      for (i <- 1 to 50)
        store.put(s"future$i/alert",
          """{"appName":"a","alertHandler":"noop","alertParams":[]}""",
          validFrom = Some(new Timestamp(nowMs + 3600000L)))
      val sched = new AlertScheduler(store, registry)
      sched.tick() // fires + deletes the 5 due alerts (untimed)
      sched.tick() // warm the steady-state plan (footers, codegen)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        sched.tick()
        (System.nanoTime() - t0) / 1e9
      }
      store.close()
      val med = times.sorted.apply(1)
      println(f"[alert-probe] versions=$n%9d steady tick median=${med}%6.3fs " +
        times.map(t => f"$t%5.3f").mkString("(", " ", ")"))
      n -> med
    }
    val ratios = results.sliding(2).map { case Seq((n0, a), (n1, b)) =>
      f"${n1.toDouble / n0}%4.0fx volume -> ${b / math.max(a, 0.005)}%5.2fx tick"
    }.mkString("; ")
    println(s"[alert-probe] $ratios")
    spark.stop()
  }
}
