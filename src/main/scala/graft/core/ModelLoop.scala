package graft.core

import org.apache.spark.sql.SparkSession

/** Session-conf scope for bounded MODEL-ITERATION loops — Lloyd rounds,
  * BPE merge rounds: a fixed number of micro-jobs over KB-scale model
  * state, where fixed per-job overhead IS the cost. Inside the scope AQE
  * is off (adaptive re-planning runs each 2-stage round as ~3 separate
  * jobs) and the shuffle width is sized to the model (the reduce side of
  * a model round is ≤ model-size rows — the cluster-default width just
  * schedules waves of near-empty tasks). Confs restore on every exit
  * path, so the surrounding query keeps its adaptive planning. Measured
  * on the BPE loop: 3.56 s → 2.2 s, jobs 34 → 14 (BASELINE.md round 7).
  *
  * The scope mutates SESSION confs: queries running concurrently on the
  * same session during a training loop would plan without AQE/codegen for
  * its duration. A deployment interleaving trainers with live queries
  * should give trainers their own `spark.newSession()` (shared catalog +
  * cache, independent confs) — the gates and Verify/Bench run queries
  * sequentially, where the scope is exact. */
object ModelLoop {
  /** `interpretModel`: every round embeds FRESH model literals (centroid
    * argmin trees, merge-pair replaces), so codegen can never amortize —
    * each round pays a janino compile of a new large expression (~0.3-0.5 s
    * measured) for faster per-row eval. Interpreting wins while per-round
    * work is model-bounded (rows × k × dim ≲ 10⁸ — true for samplers like
    * IVF/PQ training and for vocab-bounded BPE rounds, at any corpus
    * size); pass `false` when a loop genuinely streams corpus-bounded
    * rows through the round, where compiled eval wins back the compile. */
  def scoped[T](spark: SparkSession, shufflePartitions: Int = 8,
                interpretModel: Boolean = true)(body: => T): T = {
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val shufWas = spark.conf.get("spark.sql.shuffle.partitions", "200")
    val wscgWas = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val factWas = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    if (interpretModel) {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    }
    try body finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.shuffle.partitions", shufWas)
      spark.conf.set("spark.sql.codegen.wholeStage", wscgWas)
      spark.conf.set("spark.sql.codegen.factoryMode", factWas)
    }
  }
}
