package graft.core

/** Per-gate PHASE decomposition for the bench detail line (round-18
  * verdict #6): the stream/store gates' wall is install+lifecycle
  * dominated, so a per-batch or probe regression can hide under a
  * stable total. Gates wrap their steps in [[timed]]; the bench wraps
  * each sample in [[collect]] and publishes per-phase seconds under
  * `"phases"` in BENCH_DETAIL.json. Outside a collect scope (Verify,
  * specs, user code) `timed` is a zero-allocation pass-through — the
  * instrumentation costs the production path one thread-local read.
  *
  * Thread-local because a gate builds (and for stream gates, runs) on
  * the caller's thread; phases recorded by Spark's streaming
  * micro-batch thread land via the query's awaitTermination happening
  * inside the caller's `timed` block, so attribution follows the
  * caller's wall clock, which is what the bench measures. */
object PhaseTimer {
  private val acc = new ThreadLocal[
    scala.collection.mutable.LinkedHashMap[String, Double]]()

  /** Time `f` under `phase`, accumulating (a phase entered twice sums). */
  def timed[A](phase: String)(f: => A): A = {
    val m = acc.get()
    if (m == null) f
    else {
      val t0 = System.nanoTime()
      try f
      finally {
        val dt = (System.nanoTime() - t0) / 1e9
        m.update(phase, m.getOrElse(phase, 0.0) + dt)
      }
    }
  }

  /** Run `f` with phase collection on; returns (result, phase → sec). */
  def collect[A](f: => A): (A, Map[String, Double]) = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    acc.set(m)
    try { val r = f; (r, m.toMap) }
    finally acc.remove()
  }
}
