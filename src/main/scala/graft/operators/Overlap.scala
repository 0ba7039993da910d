package graft.operators

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Concurrent-action helper for composed pipelines — the "overlap
  * independent jobs" move: Spark's scheduler happily runs several jobs
  * at once inside one application; actions are only sequential because
  * driver code calls them sequentially. When a pipeline materializes two
  * INDEPENDENT chains (two lineage cuts over the same checkpointed
  * input; a shard write beside a report rollup on a shared pinned base),
  * submitting them from two threads lets the second job's tasks
  * back-fill executor slots freed by the first job's straggler tail —
  * at 100 TB that tail is the dominant idle-capacity loss, and locally
  * it removes one full serialized job wall from the pipeline.
  *
  * Safety: both legs only READ shared inputs (checkpointed RDDs /
  * [[graft.Pinned]] caches — per-partition block locks make concurrent
  * cache materialization race-free), and default FIFO scheduling keeps
  * the first-submitted job ahead, the exact back-fill behaviour wanted.
  */
object Overlap {

  private lazy val pool: ExecutionContext =
    ExecutionContext.fromExecutor(Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-overlap")
      t.setDaemon(true)
      t
    }))

  /** Evaluate `a` and `b` concurrently (`a` on a pool thread, `b` on the
    * calling thread) and return both — blocks until BOTH complete, so
    * pins/checkpoints referenced by either leg stay live throughout.
    * `spark.graft.overlap=false` degrades to sequential evaluation
    * (a then b) for A/B measurement and contention triage. */
  def both[A, B](s: org.apache.spark.sql.SparkSession, a: => A, b: => B)
      : (A, B) = {
    if (s.conf.getOption("spark.graft.overlap").forall(_.toBoolean)) {
      val fa = Future(a)(pool)
      val rb =
        try b
        catch {
          case t: Throwable =>
            // drain the background leg before rethrowing: the caller's
            // finally/releaseAll would otherwise unpin caches the pool
            // thread is still reading (recomputation + confusing
            // concurrent failures); its own failure is secondary here
            try Await.result(fa, Duration.Inf)
            catch { case _: Throwable => () }
            throw t
        }
      (Await.result(fa, Duration.Inf), rb)
    } else (a, b)
  }
}
