package graft.ext

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle manager for the eager `localCheckpoint` relations the
  * pair-generators materialize ([[TextOps.minhashPairs]],
  * [[TextOps.simhashPairs]], [[TextOps.components]], ...).
  *
  * A `localCheckpoint(eager = true)` caches a materialized RDD for the
  * SESSION's lifetime: `Dataset.unpersist` does not touch it (it is not
  * a CacheManager entry), and the ContextCleaner only reclaims it after
  * the JVM garbage-collects the RDD object — which a long-lived driver
  * may not do for hours. Without explicit release, every generator call
  * leaks its corpus-sized band/edge relations until eviction pressure
  * degrades unrelated queries (observed: simhash_band_pairs drifting
  * 1.8 s → 3.9 s late in a 201-materialization bench session).
  *
  * Contract used by the generators:
  *   - big INTERMEDIATES (band relations, edge lists) are released
  *     inside the generator, immediately after the generator seals its
  *     (small) output with its own eager checkpoint — so no operator
  *     leaks corpus-sized blocks past its own return, ever;
  *   - sealed OUTPUTS back the returned DataFrame, so they must stay
  *     alive until the caller is done. They are registered here, and
  *     [[drain]] releases them all — call it between pipelines (Bench
  *     and Verify do, after each query materializes). After `drain`,
  *     previously returned generator DataFrames must not be re-executed
  *     (their lineage was truncated to the released checkpoint).
  */
object Scratch {
  private val registry =
    new ConcurrentHashMap[Int, WeakReference[RDD[_]]]()

  /** The checkpoint RDDs a DataFrame's plan scans (LogicalRDD leaves).
    * Plans with no checkpointed leaves yield nothing — safe on any DF.
    */
  private def planRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }

  /** Eagerly materialize `out` (truncating its lineage so nothing below
    * it can recompute), register it for [[drain]], then release the
    * checkpointed intermediates it was built from.
    */
  private[ext] def seal(out: DataFrame, intermediates: DataFrame*): DataFrame = {
    val pinned = out.localCheckpoint(eager = true)
    register(pinned)
    intermediates.foreach(release)
    pinned
  }

  /** Track a checkpointed DataFrame so [[drain]] can release it. Weak
    * references only — registration never pins blocks the cleaner could
    * otherwise reclaim.
    */
  private[ext] def register(df: DataFrame): Unit =
    planRdds(df).foreach(r => registry.put(r.id, new WeakReference(r)))

  /** Release the checkpoint blocks backing `df` NOW (non-blocking).
    * The DataFrame must not be re-executed afterwards.
    */
  def release(df: DataFrame): Unit =
    planRdds(df).foreach { r =>
      r.unpersist(blocking = false)
      registry.remove(r.id)
    }

  /** Release every registered scratch checkpoint. Call between
    * pipelines in a long-lived session; previously returned generator
    * DataFrames must not be re-executed after this.
    */
  def drain(): Unit = {
    val it = registry.entrySet().iterator()
    while (it.hasNext) {
      val ref = it.next().getValue.get()
      if (ref != null) ref.unpersist(blocking = false)
      it.remove()
    }
  }
}
