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

  /** Run `tasks` concurrently (bounded), return results in input
    * order. Sequential fast path for 0/1 tasks. */
  def map[T](tasks: Seq[() => T],
      parallelism: Int = DefaultParallelism): Seq[T] = {
    require(parallelism >= 1, s"need parallelism >= 1, got $parallelism")
    if (tasks.size <= 1 || parallelism == 1) return tasks.map(_())
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
          def call(): T = t()
        }))
      var err: Throwable = null
      val out = futures.map { f =>
        try Some(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (err == null) err = e.getCause
            None
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            if (err == null) err = e
            None
        }
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
