package graft.core

import java.util.concurrent.ConcurrentHashMap

/** Session-scoped cache for TRAINED MODEL STATE (coarse-quantizer
  * centroids, corpus counts) — driver-side values of a few KB that are
  * pure deterministic functions of (input dir, hyperparameters).
  *
  * Why this exists: several gates consume the same trained artifact
  * (similarity_ivf and corpus_cluster_stats share one k-means quantizer;
  * dedup_semantic re-derives its own corpus count + quantizer every call).
  * A production pipeline stages the quantizer once (`Similarity.writeIndex`)
  * and every consumer reads it; within one JVM session this cache is that
  * staging step — train once, share the exact same collected doubles.
  * Because training is deterministic in (data, params), a cache hit is
  * bit-identical to a retrain: correctness (and the DuckDB oracle replay)
  * is unchanged, only the repeated Lloyd collect jobs disappear.
  *
  * NOT for data-sized state — values must be model-sized (KB). Entries are
  * keyed by a string the caller builds from every input that determines
  * the value (directory + all hyperparameters); a key that omits one is a
  * correctness bug, so build keys with [[ModelCache.key]].
  */
object ModelCache {
  private val cache = new ConcurrentHashMap[String, AnyRef]()

  /** Canonical key: every determining input, pipe-joined. */
  def key(parts: Any*): String = parts.mkString("|")

  /** A directory-as-input key part: the path PLUS a cheap content
    * fingerprint (file count, total bytes, latest mtime, and a hash over
    * every (relative-path, length, mtime) triple). Without it, entries
    * keyed on the path alone outlive an in-place regeneration of the data
    * under it — consumers then silently serve centroids/weights trained on
    * rows that no longer exist (ADVICE r8). Metadata-only: a listing walk,
    * no data read — the same cost class as the parquet footer listing every
    * scan already pays; trainers call it once per (dir, params) miss. */
  def dirKey(dir: String): String = {
    var n = 0L; var bytes = 0L; var latest = 0L; var h = 1125899906842597L
    def add(rel: String, len: Long, mtime: Long): Unit = {
      n += 1; bytes += len; latest = math.max(latest, mtime)
      val s = rel + "|" + len + "|" + mtime
      var fh = 1469598103934665603L // FNV-1a per file…
      var i = 0; while (i < s.length) { fh = (fh ^ s.charAt(i)) * 1099511628211L; i += 1 }
      h += fh // …combined commutatively: listing order is filesystem-dependent
    }
    if (dir.contains("://")) {
      // cluster paths (hdfs://, s3a://, …): the nio walk can't see them, and
      // silently keying on the path alone would disable staleness detection
      // exactly where re-staged data is most likely — list via Hadoop
      try {
        val p = new org.apache.hadoop.fs.Path(dir)
        // the session's hadoopConfiguration, not a bare new Configuration():
        // fs credentials/settings arrive via spark.hadoop.* (s3a keys, abfs
        // auth) and a bare config can't open exactly the cluster paths this
        // branch exists for (ADVICE r9)
        val conf = org.apache.spark.sql.SparkSession.getActiveSession
          .map(_.sparkContext.hadoopConfiguration)
          .getOrElse(new org.apache.hadoop.conf.Configuration())
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) return s"$dir@absent"
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val st = it.next()
          add(st.getPath.toString.stripPrefix(p.toString), st.getLen, st.getModificationTime)
        }
      } catch { case scala.util.control.NonFatal(e) =>
        // loud, not silent: an unlistable dir disables staleness detection
        // (same model served after an in-place re-stage) — the caller should
        // know which path and why
        System.err.println(s"[graft] ModelCache.dirKey: cannot list $dir ($e); " +
          "staleness detection degraded to path-only for this entry")
        return s"$dir@unlistable"
      }
    } else {
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(root)) return s"$dir@absent"
      val stream = java.nio.file.Files.walk(root)
      try stream.forEach { p =>
        val f = p.toFile
        if (f.isFile) add(root.relativize(p).toString, f.length(), f.lastModified())
      } finally stream.close()
    }
    s"$dir@$n:$bytes:$latest:${java.lang.Long.toHexString(h)}"
  }

  /** Memoized train: computes (and caches) `train` on first use of `k`;
    * concurrent callers of the same key block until the first finishes
    * (computeIfAbsent), so a model is never trained twice. */
  def getOrTrain[A <: AnyRef](k: String)(train: => A): A =
    cache.computeIfAbsent(k, _ => train).asInstanceOf[A]

  /** Tests (and anything re-generating input data in place) drop models. */
  def clear(): Unit = cache.clear()
}
