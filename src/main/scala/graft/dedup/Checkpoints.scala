package graft.dedup

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit lifecycle for `localCheckpoint`ed frames.
  *
  * `df.localCheckpoint()` is eager: it materializes the frame into persisted
  * (MEMORY_AND_DISK) blocks and returns a frame whose plan is a flat
  * [[LogicalRDD]] over exactly that RDD. Those blocks are NOT recomputable —
  * they exist only as long as they stay persisted — so releasing them is
  * only safe once nothing can reference the frame again, and identifying
  * them must not guess: [[tracked]] reads the RDD straight out of the
  * returned frame's plan, which stays correct under concurrent jobs on the
  * same SparkContext (a getPersistentRDDs before/after diff does not).
  */
object Checkpoints {

  /** Eagerly localCheckpoint `df`; return the truncated-lineage frame plus
    * the persisted RDDs backing it (to pass to [[release]] when the frame
    * is provably dead).
    */
  def tracked(df: DataFrame): (DataFrame, Seq[RDD[_]]) = {
    val out = df.localCheckpoint()
    val rdds = out.queryExecution.logical.collect { case r: LogicalRDD => r.rdd }
    (out, rdds)
  }

  /** Drop the checkpoint blocks. Only call once the owning frame can never
    * be evaluated again — the blocks are non-recomputable.
    */
  def release(rdds: Seq[RDD[_]]): Unit = rdds.foreach(_.unpersist(false))

  // ---- output ledger -------------------------------------------------------

  private val outputLedger =
    new java.util.concurrent.ConcurrentLinkedQueue[java.lang.ref.WeakReference[RDD[_]]]()

  /** [[tracked]] for FINAL query outputs: the checkpoint blocks are
    * recorded in a process-wide ledger and dropped at the next
    * [[releaseOutputs]] — the deterministic replacement for waiting on
    * driver GC + ContextCleaner, which under a long-lived session lets
    * one orphaned checkpoint per query call accumulate in the storage
    * pool (the r10 verdict's cache-pressure-roulette note). ONLY for
    * frames nothing caches across queries: session-scoped builders keep
    * plain [[tracked]] and own their blocks via their invalidate hooks.
    *
    * Ledger entries are WEAK references: the result frame itself holds
    * the only strong RDD reference, so a library consumer who never
    * calls [[releaseOutputs]] keeps the normal GC + ContextCleaner
    * lifecycle (frame unreachable → RDD unreachable → blocks reclaimed)
    * instead of the ledger pinning every query's checkpoint forever and
    * growing without bound.
    */
  def output(df: DataFrame): DataFrame = {
    val (out, blocks) = tracked(df)
    blocks.foreach(r => outputLedger.add(new java.lang.ref.WeakReference[RDD[_]](r)))
    out
  }

  /** Drop every [[output]] checkpoint recorded since the last call.
    * Callers (Bench, Verify, the lifecycle spec) invoke this AFTER fully
    * consuming a query's result; a library consumer who holds results
    * across queries simply never calls it and keeps the GC lifecycle
    * (entries whose RDD was already GC-reclaimed are skipped).
    */
  def releaseOutputs(): Unit = {
    var r = outputLedger.poll()
    while (r != null) {
      val rdd = r.get()
      if (rdd != null) rdd.unpersist(false)
      r = outputLedger.poll()
    }
  }
}
