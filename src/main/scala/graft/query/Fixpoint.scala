package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive Datalog rules (Q9, SURVEY.md §2.2) — e.g. the `depends` rule in
  * `/root/reference/src/dataworks/db/app_db.clj:122-126`:
  * `(depends d1 d2) :- edge | edge ∘ depends`.
  *
  * Spark (≤4.x) has no recursive logical plans, so recursion is a
  * driver-side semi-naive fixpoint: each iteration only extends the frontier
  * (`delta`) discovered in the previous one, never re-joins the full
  * accumulator against the edge set — the classic Datalog evaluation
  * strategy, which at 100 TB is the difference between O(depth) incremental
  * joins and O(depth) full-relation joins.
  *
  * Scale posture: per-iteration results are materialized (eager
  * checkpoint — without it the plan doubles every iteration and Catalyst
  * analysis time explodes); termination is checked with `isEmpty` (a
  * limit-1 job), never `collect`. By default materialization uses
  * `localCheckpoint` (executor-local storage — fastest, and fine on a
  * single machine); cluster runs where an executor loss mid-fixpoint must
  * not kill the query set `graft.fixpoint.checkpointDir` to an HDFS/S3
  * path and materialization switches to reliable checkpoints.
  */
object Fixpoint {

  /** Session conf key: when set to a reliable (HDFS/S3/shared-fs) path,
    * fixpoint iterations checkpoint there instead of executor-local
    * storage, surviving executor loss on a real cluster. */
  val CheckpointDirKey = "graft.fixpoint.checkpointDir"

  /** Eagerly materialize and rebase a DataFrame: the checkpoint cuts the
    * lineage, and rewrapping the checkpointed RDD mints fresh attribute ids
    * with no carried-over constraints. Both matter: checkpointed plans keep
    * their original ExprIds/constraints, and reusing them across iterations
    * trips Catalyst's Union constraint rewrite (NoSuchElementException in
    * UnionBase.rewriteConstraints) and self-join ambiguity. */
  private def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliableDir = Option(spark.conf.get(CheckpointDirKey, null)).filter(_.nonEmpty)
    val ckpt = reliableDir match {
      case Some(dir) =>
        if (!spark.sparkContext.getCheckpointDir.contains(dir))
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(true)
    }
    spark.createDataFrame(ckpt.rdd, ckpt.schema)
  }

  private def nonConverged(what: String, maxIter: Int): Nothing =
    throw new IllegalStateException(
      s"$what did not converge within maxIter=$maxIter iterations — " +
        "the result would be silently incomplete; raise maxIter")

  /** Transitive closure of `edges(src, dst)` → all reachable `(src, dst)`. */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val e = materialize(edges.select("src", "dst").distinct())
    var acc = e
    var delta = e
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      val extended = delta.as("d")
        .join(e.as("g"), col("d.dst") === col("g.src"))
        .select(col("d.src").as("src"), col("g.dst").as("dst"))
        .distinct()
      val fresh = materialize(extended.join(acc, Seq("src", "dst"), "left_anti"))
      if (fresh.isEmpty) done = true
      else {
        acc = materialize(acc.union(fresh))
        delta = fresh
      }
      i += 1
    }
    if (!done) nonConverged("transitiveClosure", maxIter)
    acc
  }

  /** General semi-naive fixpoint: `step(delta)` derives new tuples from the
    * latest frontier; iteration stops when nothing new appears. `keys` are
    * the dedup columns (rule-head variables — Datalog set semantics). */
  def fixpoint(base: DataFrame, step: DataFrame => DataFrame,
               keys: Seq[String], maxIter: Int = 50): DataFrame =
    fixpoint2(base, (delta, _) => step(delta), keys, maxIter)

  /** Semi-naive fixpoint whose step sees BOTH the frontier and the full
    * accumulator — required for NONLINEAR recursion (a rule body with two
    * self-references must join delta against acc, not only delta against
    * delta, or derivations pairing a new tuple with an old one are lost). */
  def fixpoint2(base: DataFrame, step: (DataFrame, DataFrame) => DataFrame,
                keys: Seq[String], maxIter: Int = 50): DataFrame = {
    var acc = materialize(base.select(keys.map(col): _*).distinct())
    var delta = acc
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      val fresh = materialize(
        step(delta, acc)
          .select(keys.map(col): _*).distinct()
          .join(acc, keys, "left_anti"))
      if (fresh.isEmpty) done = true
      else {
        acc = materialize(acc.union(fresh))
        delta = fresh
      }
      i += 1
    }
    if (!done) nonConverged("fixpoint", maxIter)
    acc
  }
}
