package graft.core

/**
 * Bounded parallel map for DRIVER-SIDE metadata I/O (parquet footer
 * reads, staged-file renames, per-file listStatus): these loops are pure
 * I/O latency — a commit of N files paid N × ~10 ms serially, which at
 * wide-partition writes (an 84-month hidden-partition commit) dominated
 * the commit. Order-preserving; exceptions propagate (first failure
 * wins). Small inputs run inline — no pool churn for 1-2 files.
 */
object DriverPar {
  def map[A, B](items: Seq[A], maxThreads: Int = 16)(fn: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(fn)
    val n = math.min(items.size, math.max(2, maxThreads))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futures = items.map(a => pool.submit(new java.util.concurrent.Callable[B] {
        override def call(): B = fn(a)
      }))
      futures.map { fu =>
        try fu.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally { pool.shutdown(); () }
  }
}
