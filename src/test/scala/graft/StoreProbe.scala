package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.{DocumentStore, TxOp}

/** Decade probes for the document store's two open scale questions
  * (VERDICT r12 #3/#4). Usage:
  *
  *   sbt "Test/runMain graft.StoreProbe spec"    — speculative-batch probe
  *   sbt "Test/runMain graft.StoreProbe compact" — compaction-policy probe
  *   sbt "Test/runMain graft.StoreProbe all"
  *
  * `spec`: withTx unions the op batch over the snapshot scan — r12 proved
  * the COMMITTED side at sf1; this leg grows the SPECULATIVE side to 10k
  * ops over stores 10× apart and times the full speculative read (union +
  * window + count). A healthy shape is committed-scan-dominated: wall
  * grows with the store, not with ops×store.
  *
  * `compact`: N put/claim/delete control-plane cycles leave N·2 one-row
  * parquet files in one valid_date partition; the probe times the Q10
  * snapshot read (the alert tick's shape) fragmented vs after
  * `compactIfFragmented(64)` — the threshold's value is the measured gap.
  * Results recorded in BASELINE.md. */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def newStore(tag: String): DocumentStore = DocumentStore(spark,
      java.nio.file.Files.createTempDirectory(s"store-probe-$tag").toString + "/db")

    def bulkLoad(store: DocumentStore, n: Int): Unit = {
      val days = 10
      val perDay = math.max(1, n / days)
      val nowMs = System.currentTimeMillis()
      for (k <- 0 until days) {
        val vf = new Timestamp(nowMs - (days - k).toLong * 86400000L)
        store.putBatch(
          spark.range(perDay.toLong).select(
            concat(lit(s"doc/d$k/"), col("id")).as("id"),
            concat(lit("""{"seq":"""), col("id"), lit("}")).as("doc")),
          validFrom = Some(vf))
      }
      store.compact()
    }

    if (which == "spec" || which == "all") {
      val results = for (n <- Seq(20000, 200000)) yield {
        val store = newStore(s"spec$n")
        bulkLoad(store, n)
        def batch(sz: Int): Seq[TxOp] = (0 until sz).map { i =>
          if (i % 7 == 6) TxOp.Delete(s"doc/d1/${i % 997}")
          else TxOp.Put(s"spec/$i", s"""{"s":$i}""")
        } ++ (0 until 10).filter(_ % 7 != 6) // slots 6,13,… were deletes
          .map(i => TxOp.Match(s"spec/$i", Some(s"""{"s":$i}""")))
        def time(sz: Int): Double = {
          val t0 = System.nanoTime()
          val snap = store.withTx(batch(sz)).getOrElse(sys.error("aborted"))
          val c = snap.count()
          require(c > 0)
          (System.nanoTime() - t0) / 1e9
        }
        time(100) // warm (footers, codegen)
        val t100 = Seq.fill(3)(time(100)).sorted.apply(1)
        val t10k = Seq.fill(3)(time(10000)).sorted.apply(1)
        store.close()
        println(f"[spec-probe] store=$n%7d ops=100 median=$t100%6.3fs   " +
          f"ops=10000 median=$t10k%6.3fs   batch-100x -> ${t10k / math.max(t100, 0.005)}%5.2fx wall")
        (n, t100, t10k)
      }
      results.sliding(2).foreach { case Seq((n0, _, a), (n1, _, b)) =>
        println(f"[spec-probe] 10k-op batch: ${n1 / n0}%dx store -> ${b / math.max(a, 0.005)}%5.2fx wall")
      case _ => ()
      }
    }

    // Long soak (r13 verdict item 4): alert-claim churn with the
    // maintenance DAEMON running and a concurrent reader, at 10k cycles —
    // the drill-scale swap-retry test ran seconds; this proves hours of
    // operational life. Time compression: cycles run back-to-back
    // (~5-20/s) instead of on the 1 s scheduler, and the daemon interval
    // compresses 60 s → 1 s to match — the daemon:churn ratio (one
    // maintenance pass per ~10-20 claim cycles) is the production shape,
    // just ~60× faster wall-clock. Reported: reader errors (must be 0),
    // fragmentation trajectory, /proc/self/fd count and heap at samples
    // (creep detection), and the snapshot-read floor before vs after.
    if (which == "soak") {
      val cycles = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
      val store = newStore("soak")
      bulkLoad(store, 20000)
      val daemon = store.startMaintenance(intervalMs = 1000L, maxFilesPerPartition = 32)
      val readerErrors = new java.util.concurrent.atomic.AtomicLong
      val readerRederives = new java.util.concurrent.atomic.AtomicLong
      val readerOps = new java.util.concurrent.atomic.AtomicLong
      val stopReader = new java.util.concurrent.atomic.AtomicBoolean(false)
      // the reader follows the store's documented contracts: entity() has
      // the swap retry built in; a SNAPSHOT DataFrame handed to a caller
      // keeps Spark's re-derive contract (a compaction renaming the listed
      // files away mid-action throws FAILED_READ_FILE and the caller
      // rebuilds the plan — DocumentStore.retryOnSwap scaladoc). Only a
      // failure that SURVIVES one re-derive counts as a reader error;
      // first-try transients are tallied separately as the swap-race rate.
      def isSwapTransient(e: Throwable): Boolean =
        Option(e.getMessage).exists(m =>
          m.contains("FAILED_READ_FILE") || m.contains("FILE_NOT_EXIST") ||
            m.contains("does not exist"))
      val reader = new Thread(() => {
        var i = 0L
        while (!stopReader.get()) {
          try {
            if (i % 5 == 0)
              try require(store.db().count() > 0)
              catch { case e: Exception if isSwapTransient(e) =>
                readerRederives.incrementAndGet()
                require(store.db().count() > 0) // re-derive once
              }
            else store.entity(s"doc/d${(i % 10).toInt}/${i % 997}")
            readerOps.incrementAndGet()
          } catch { case e: Exception =>
            readerErrors.incrementAndGet()
            if (readerErrors.get() <= 3)
              System.err.println(s"[soak] reader error: ${e.getMessage}")
          }
          i += 1
        }
      }, "soak-reader")
      reader.setDaemon(true)
      def fdCount: Int =
        Option(new java.io.File("/proc/self/fd").list()).map(_.length).getOrElse(-1)
      def heapMb: Long = {
        val rt = Runtime.getRuntime
        (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      }
      def snapTime(): Double = {
        val t0 = System.nanoTime()
        require(store.db().count() > 0)
        (System.nanoTime() - t0) / 1e9
      }
      snapTime() // warm
      val floor0 = Seq.fill(3)(snapTime()).sorted.apply(1)
      val fd0 = fdCount
      reader.start()
      val t0 = System.nanoTime()
      for (i <- 0 until cycles) {
        store.put(s"alert/${i % 483}", """{"due":true}""")
        store.matchPut(s"alert/${i % 483}", Some("""{"due":true}"""),
          s"""{"claimed":$i}""")
        store.delete(s"alert/${i % 483}")
        if ((i + 1) % (cycles / 40).max(1) == 0) {
          val frag = store.fragmentation().values.sum
          println(f"[soak] cycle=${i + 1}%6d files=$frag%5d fd=$fdCount%5d " +
            f"heap=${heapMb}%5dMB readerOps=${readerOps.get()}%7d " +
            f"rederives=${readerRederives.get()}%3d " +
            f"readerErrors=${readerErrors.get()}%3d " +
            f"rate=${(i + 1) / ((System.nanoTime() - t0) / 1e9)}%6.1f cyc/s")
        }
      }
      stopReader.set(true); reader.join(10000)
      val fragEnd = store.fragmentation().values.sum
      // one final maintenance pass models the daemon tick that would land
      // within the next interval; the floor must return to baseline
      store.compactIfFragmented(32)
      snapTime()
      val floor1 = Seq.fill(3)(snapTime()).sorted.apply(1)
      println(f"[soak] DONE cycles=$cycles files(end)=$fragEnd " +
        f"fd $fd0 -> $fdCount  readerOps=${readerOps.get()} " +
        f"rederives=${readerRederives.get()} " +
        f"readerErrors=${readerErrors.get()} " +
        f"snapshot floor $floor0%6.3fs -> $floor1%6.3fs " +
        f"(${floor1 / math.max(floor0, 0.005)}%4.2fx)")
      daemon.close()
      store.close()
    }

    if (which == "compact" || which == "all") {
      for (cycles <- Seq(100, 300)) {
        val store = newStore(s"frag$cycles")
        bulkLoad(store, 20000)
        // control-plane churn: put alert, claim (matchPut), delete — the
        // 1 s alert-tick pattern that fragments a long-lived store
        for (i <- 0 until cycles) {
          store.put(s"alert/$i", """{"due":true}""")
          store.delete(s"alert/$i")
        }
        val frag = store.fragmentation().values.sum
        def snapTime(): Double = {
          val t0 = System.nanoTime()
          require(store.db().count() > 0)
          (System.nanoTime() - t0) / 1e9
        }
        snapTime() // warm
        val before = Seq.fill(3)(snapTime()).sorted.apply(1)
        val ran = store.compactIfFragmented(64)
        val fragAfter = store.fragmentation().values.sum
        snapTime() // warm post-compaction footers
        val after = Seq.fill(3)(snapTime()).sorted.apply(1)
        println(f"[compact-probe] cycles=$cycles%4d files=$frag%5d -> $fragAfter%3d " +
          f"(compacted=$ran) snapshot read: fragmented=$before%6.3fs " +
          f"compacted=$after%6.3fs  gain=${before / math.max(after, 0.005)}%5.2fx")
        store.close()
      }
    }
    spark.stop()
  }
}
