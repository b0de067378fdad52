package graft

/** Concurrent driver-side action execution (optimization guide §2.6:
  * "Overlap independent jobs" — Spark's scheduler happily runs several
  * jobs at once inside one application; actions are only sequential
  * because driver code calls them sequentially). The transaction-contract
  * queries (q201/q207/q210-q212/q214/q215/q220/q221) issue DOZENS of
  * small independent actions per run — 14 staged plane writes, per-plane
  * audit counts, per-generation invariant checks — and each one leaves
  * the executor pool idle while the driver round-trips job submission,
  * tiny-shuffle scheduling, and the parquet commit protocol. Measured at
  * sf0.1 (ProbeR21, r21): the 14 staged admission writes cost ~4.5 s
  * run sequentially (~0.32 s each) while the same queries run NO faster
  * on local[8] than local[32] — the cost is serialized per-action
  * latency, not compute. Submitting independent actions concurrently
  * overlaps those latencies at every core count, so the win is
  * scale-independent (it is exactly the guide's thread-pool back-fill
  * pattern, not a local[32] config tune).
  *
  * The pool is an unbounded daemon cached pool: tasks are small and
  * bounded in number (tens per query), and nested use (a per-generation
  * audit fanning out per-plane checks) must not deadlock, which rules
  * out a fixed pool. Results return in task order; the first failure BY
  * TASK ORDER rethrows its original cause, matching the sequential
  * path's error surface (later tasks may already have run — their side
  * effects are writer-tagged candidate files, the same orphan class a
  * lost manifest CAS leaves for vacuum).
  */
private[graft] object Par {
  private lazy val pool = java.util.concurrent.Executors.newCachedThreadPool(
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })

  /** Run the tasks concurrently; return results in task order. */
  def run[A](tasks: Seq[() => A]): Seq[A] =
    if (tasks.sizeIs < 2) tasks.map(_())
    else {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        })
      }
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    }

  /** Sum a per-item long computed concurrently (audit-count fan-out). */
  def sumLong[A](items: Seq[A])(f: A => Long): Long =
    run(items.map(i => () => f(i))).sum

  /** AND of independent boolean checks, all evaluated (no short-circuit
    * — the sequential `&&` only skipped work on the FAILURE path, and
    * these audits pass in every committed run).
    */
  def forallPar(checks: Seq[() => Boolean]): Boolean =
    run(checks).forall(identity)

  /** Two / three independent heterogeneous tasks (the contract-query
    * tails: generation audits ∥ per-plane counts ∥ ranked read-back).
    */
  def par2[A, B](fa: () => A, fb: () => B): (A, B) = {
    val r = run(Seq[() => Any](fa, fb))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }

  def par3[A, B, C](fa: () => A, fb: () => B, fc: () => C): (A, B, C) = {
    val r = run(Seq[() => Any](fa, fb, fc))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B], r(2).asInstanceOf[C])
  }
}
