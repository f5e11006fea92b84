package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Versioned staged-artifact directories: the atomic-swap lifecycle every
  * build-once/consume-many artifact (shingle index, LM model, DSIR ratio
  * table) shares.
  *
  * Problem it solves: `write.mode("overwrite")` at a live path deletes the
  * files a still-running consumer's captured DataFrame lists — the next
  * micro-batch of an un-restarted admission stream dies with
  * FileNotFoundException. Staging instead writes each rebuild to a fresh
  * `v-NNNNNN` subdirectory (written under a hidden tmp name, then renamed —
  * rename is atomic on HDFS and local filesystems, so readers never see a
  * half-written version) and keeps the previous version on disk, so a
  * consumer that resolved the old version keeps reading a consistent
  * snapshot through one restage cycle, and a consumer that re-resolves
  * (resident re-pin, query restart) gets the new one.
  *
  * Like [[graft.store.DocumentStore.compact]], staging is a single-writer
  * maintenance op: two concurrent stagers of one path may race to the same
  * version number (the rename of the loser fails loudly — no corruption).
  */
object Staged {

  private val VersionDir = "v-([0-9]{6})".r

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionNums(spark: SparkSession, path: String): Seq[Int] = {
    val fs = fsOf(spark, path)
    val p = new Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(_.getPath.getName match {
        case VersionDir(n) => Some(n.toInt)
        case _ => None
      })
      .sorted
  }

  private def dirFor(path: String, n: Int): String =
    new Path(path, f"v-$n%06d").toString

  /** The directory consumers should read: the newest committed version —
    * or `path` itself when no version dir exists (pre-versioning flat
    * layout, still readable). */
  def resolve(spark: SparkSession, path: String): String =
    versionNums(spark, path).lastOption.map(dirFor(path, _)).getOrElse(path)

  /** Stage a new version of the artifact at `path`: `write` receives a
    * hidden tmp directory to fill; on success it is renamed to the next
    * `v-NNNNNN` and versions older than the newest `keep` are deleted.
    * With the default keep=2 the previous version survives one full
    * restage cycle — the window the hot-swap contract allows an
    * un-restarted consumer. Returns the committed directory. */
  def stageVersion(spark: SparkSession, path: String, keep: Int = 2)
                  (write: String => Unit): String = {
    require(keep >= 1, "stageVersion: must keep at least the new version")
    val fs = fsOf(spark, path)
    val next = versionNums(spark, path).lastOption.getOrElse(0) + 1
    val tmp = new Path(path, f".tmp-v-$next%06d")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    write(tmp.toString)
    val fin = new Path(dirFor(path, next))
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(
        s"stageVersion: rename $tmp -> $fin failed (concurrent stager?); " +
          "staged data left at the tmp path")
    versionNums(spark, path).dropRight(keep)
      .foreach(n => fs.delete(new Path(dirFor(path, n)), true))
    fin.toString
  }
}
