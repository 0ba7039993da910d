package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared helpers for iterative DataFrame loops (connected components,
  * Lloyd iterations, BPE merge rounds).
  */
object Iterate {

  /** Truncate lineage between rounds — the classic iterative-DataFrame
    * trap is a plan that grows with round count: round k's action
    * otherwise re-evaluates rounds 1..k−1 (O(k²) recompute, and worse
    * where a round references its predecessor more than once). With a
    * checkpoint dir configured (real clusters: HDFS/object store) this is
    * a RELIABLE checkpoint, so an executor loss mid-computation replays
    * from storage instead of failing the job; without one (local mode,
    * tests) it falls back to `localCheckpoint`, whose executor-local
    * blocks are acceptable only because local mode has no executor to
    * lose independently of the application.
    *
    * The result's logical plan is a leaf (scan of the materialized RDD),
    * so per-round plan size — and therefore per-round cost — stays flat
    * as the round count grows (spec-asserted in IterateSpec).
    */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(true)
    else df.localCheckpoint(true)

  /** [[truncate]] without the eager materialization job: the NEXT action
    * over the frame materializes the checkpoint as part of its own job.
    * Right for tight driver loops (the batched BPE chain) where an extra
    * scheduler round-trip per iteration is pure overhead; wrong when the
    * frame is consumed by several independent actions concurrently. */
  def truncateLazy(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(false)
    else df.localCheckpoint(false)
}
