package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Internal-row materialization bridge (same role as [[ColumnBridge]]: the
  * supported APIs are package-private to org.apache.spark.sql).
  *
  * `Dataset.checkpoint(eager = true)` runs a full count job to materialize
  * and then DISCARDS the count, so a fixpoint loop pays a second job
  * (`isEmpty`) per iteration just to learn what the first job already knew.
  * This shim materializes the same way Dataset does (copy unsafe rows →
  * RDD checkpoint) but returns the count, and exposes
  * `internalCreateDataFrame` so checkpointed iterations can be re-wrapped
  * as fresh-attribute leaves WITHOUT bouncing through external `Row`
  * conversion (a per-row serialize/deserialize layer on every downstream
  * scan). */
object DatasetBridge {

  /** Materialize `df` via RDD checkpoint (local or reliable) and count it
    * in the SAME job. Returns (rebased DataFrame, row count, backing RDD).
    * The rebased frame is a fresh-attribute LogicalRDD leaf — safe to
    * self-join/union across iterations. */
  def materializeWithCount(df: DataFrame,
                           reliable: Boolean): (DataFrame, Long, RDD[InternalRow]) = {
    val spark = df.sparkSession
    // copy: toRdd iterators reuse UnsafeRow buffers; caching needs stable rows
    val internal = df.queryExecution.toRdd.map(_.copy())
    val n = if (reliable) {
      // reliable checkpointing re-runs the RDD in a second job to write the
      // checkpoint files; persisting first makes that job a cache read, and
      // once the files exist the cached copy is redundant → unpersist
      internal.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      internal.checkpoint()
      val c = internal.count()
      internal.unpersist(blocking = false)
      c
    } else {
      internal.localCheckpoint()
      internal.count()
    }
    (internalCreate(spark, internal, df.schema), n, internal)
  }

  /** Wrap an InternalRow RDD as a DataFrame with fresh attribute ids. */
  def internalCreate(spark: SparkSession, rdd: RDD[InternalRow],
                     schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Like [[materializeWithCount]] but the rebased leaf KEEPS the origin
    * plan's physical partitioning and ordering (`LogicalRDD.fromDataset`,
    * the same wrapping `Dataset.checkpoint` uses): a loop that joins or
    * aggregates the materialized frame on its existing hash key pays no
    * re-exchange per iteration. The trade-off vs `materializeWithCount`:
    * attribute ids are NOT refreshed, so callers must go through normal
    * Dataset ops (the analyzer's relation dedup handles self-joins) —
    * low-level leg unions like Fixpoint's accumulator need the fresh-id
    * variant. */
  def materializePartitioned(df: DataFrame): (DataFrame, Long) = {
    val spark = df.sparkSession
    val internal = df.queryExecution.toRdd.map(_.copy())
    internal.localCheckpoint()
    val n = internal.count()
    val classicDs = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val leaf = org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(internal, classicDs, isStreaming = false)
    (ofRows(spark, leaf), n)
  }

  /** Block until the Spark listener bus has delivered every queued event
    * (`listenerBus` is private[spark]) — metric listeners are async, so a
    * reader sampling counters right after an action races event delivery
    * and attributes jobs to the wrong query. */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long = 10000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * package-private) — how custom logical operators like
    * [[graft.plans.AsOfJoin]] enter the DataFrame API. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
