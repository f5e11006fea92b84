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
