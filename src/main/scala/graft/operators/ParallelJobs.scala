package graft.operators

/** Bounded CONCURRENT execution of independent Spark actions — the
  * spark_optimization_guide §2.6 discipline ("overlap independent
  * jobs"): Spark's scheduler happily runs several jobs at once inside
  * one application; composite operations that build/erase/purge many
  * INDEPENDENT stores were calling their actions sequentially, so
  * each job's straggler tail left the executors idle. Submitting them
  * from a small pool lets the next job's tasks back-fill the tail —
  * on a cluster exactly as in local mode (FIFO scheduling gives the
  * earlier job priority; later jobs use what is left).
  *
  * Contract: tasks must be INDEPENDENT (no task reads state another
  * writes — distinct store roots, or distinct batch ids under the
  * commit-protocol stores whose staging/rename/meta commits are
  * race-hardened) and individually atomic-or-retryable. Results come
  * back in input order; the FIRST failure is rethrown after every
  * task has settled (so cleanup code behind the call never races a
  * still-running task).
  *
  * The pool is small and per-call: 2-4 jobs in flight fills the
  * straggler tail without thrashing the scheduler (guide §2.6 — "2-3
  * jobs in flight is plenty"). */
private[graft] object ParallelJobs {

  /** Default jobs-in-flight bound. */
  val DefaultParallelism: Int = 4

  /** Spark job-scoped thread-local properties a pooled task must
    * inherit from the CALLER: the job group (so a composite gate's
    * concurrent jobs cancel as a unit — `cancelJobGroup` on the
    * caller's group must reach jobs submitted from pool threads; guide
    * §1.5 notes the thread-local pitfall) and the job description
    * (so the UI/profiler attributes pooled jobs to the stage that
    * spawned them, not to a bare pool-thread name). */
  private val inheritedKeys = Seq(
    "spark.jobGroup.id", "spark.job.description",
    "spark.job.interruptOnCancel")

  /** Run `tasks` concurrently (bounded), return results in input
    * order. Sequential fast path for 0/1 tasks.
    *
    * Settle-all is UNCONDITIONAL: the first failure is recorded and
    * rethrown only after every future has resolved, and a caller-
    * thread interrupt is DEFERRED the same way — the interrupt flag
    * is restored (and an InterruptedException thrown) only once every
    * task has settled. The earlier behavior let the first
    * InterruptedException poison every subsequent `get()` (each threw
    * immediately on the still-set flag) and then `shutdownNow()`
    * interrupted tasks mid-Spark-action — while the caller's `finally`
    * unpersisted pinned slices those actions were still reading. */
  def map[T](tasks: Seq[() => T],
      parallelism: Int = DefaultParallelism): Seq[T] = {
    require(parallelism >= 1, s"need parallelism >= 1, got $parallelism")
    if (tasks.size <= 1 || parallelism == 1) return tasks.map(_())
    val callerProps: Seq[(String, String)] =
      org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sparkContext).toSeq.flatMap { sc =>
          inheritedKeys.flatMap(k =>
            Option(sc.getLocalProperty(k)).map(k -> _))
        }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, tasks.size),
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger()
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      })
    try {
      val futures = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          def call(): T = {
            // explicit (not inheritance-dependent): pool threads are
            // created lazily at first submit, so InheritableThreadLocal
            // snapshots are an accident of submission order — set the
            // caller's job group/description on every task
            org.apache.spark.sql.SparkSession.getActiveSession
              .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
              .map(_.sparkContext).foreach { sc =>
                callerProps.foreach { case (k, v) => sc.setLocalProperty(k, v) }
              }
            t()
          }
        }))
      var err: Throwable = null
      var interrupted = false
      val out = futures.map { f =>
        var res: Option[T] = None
        var settled = false
        while (!settled) {
          try { res = Some(f.get()); settled = true }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              if (err == null) err = e.getCause
              settled = true
            case _: InterruptedException =>
              // defer: keep awaiting so no task outlives this call —
              // the flag is restored after everything settles
              interrupted = true
          }
        }
        res
      }
      if (interrupted) {
        Thread.currentThread().interrupt()
        if (err == null) err = new InterruptedException(
          "interrupted while awaiting parallel jobs (all tasks settled)")
      }
      if (err != null) throw err
      out.map(_.get)
    } finally pool.shutdownNow()
  }

  /** [[map]] for side-effecting actions. */
  def run(tasks: Seq[() => Unit],
      parallelism: Int = DefaultParallelism): Unit = {
    map(tasks, parallelism)
    ()
  }
}
