package graft.operators

/** Driver-side overlap of INDEPENDENT Spark work (optimization guide
  * §2.6): Spark happily schedules several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. Queries whose plans contain two or more independent
  * legs that each materialize internally (iterative operators with
  * per-round actions, `localCheckpoint`ed channel outputs) leave most of
  * the machine idle during each leg's stage tails; evaluating the legs on
  * a small driver pool lets the other leg's tasks back-fill those gaps.
  * Results are unchanged — each leg is the same deterministic computation,
  * just submitted from its own thread (job groups/descriptions are
  * thread-local, so UI labels stay correct). The [[graft.jobs
  * .PipelineRunner.runSubjectArea]] / [[graft.streaming.StreamWaves
  * .stageAll]] pattern, factored for query-level reuse. */
object Concurrent {

  /** Evaluate two independent thunks concurrently; rethrows the first
    * failure. Each thunk must fully materialize its own work (run its
    * driver loop / checkpoint its frame) for the overlap to be real. */
  def inParallel[A, B](a: => A, b: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[A] {
        override def call(): A = a
      })
      val fb = pool.submit(new java.util.concurrent.Callable[B] {
        override def call(): B = b
      })
      (fa.get(), fb.get())
    } catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    } finally pool.shutdown()
  }

  /** Evaluate three independent thunks concurrently. */
  def inParallel3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val ((ra, rb), rc) = inParallel(inParallel(a, b), c)
    (ra, rb, rc)
  }
}
