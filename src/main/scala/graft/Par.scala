package graft

/** Shared fused-fan-out runner (the Streams.inParallel semantics,
  * hoisted so store machinery below the streaming layer can overlap
  * independent legs too — r19: taggedSegmentAppend's staging writes,
  * manifestDeltaRows' per-modality branch evaluation). The per-batch
  * fixed bill of the at-ingest capstones is Spark JOB COUNT, and the
  * scheduler is multi-thread-safe by design; legs that touch
  * DISJOINT state overlap instead of queueing.
  *
  * Failure semantics (the inParallel contract): every leg runs to
  * completion, then the FIRST failure rethrows. `GRAFT_FUSE=off`
  * keeps the sequential form as an attribution knob. Legs inherit
  * the caller's thread-locals (pool created in the calling thread;
  * Spark's localProperties are InheritableThreadLocal). */
object Par {
  def run[T](legs: Seq[() => T]): Seq[T] =
    if (legs.sizeIs <= 1 || sys.env.get("GRAFT_FUSE").contains("off"))
      legs.map(_())
    else {
      val pool =
        java.util.concurrent.Executors.newFixedThreadPool(legs.size)
      try {
        val futs = legs.map { l =>
          pool.submit(new java.util.concurrent.Callable[T] {
            def call(): T = l()
          })
        }
        var firstFailure: Throwable = null
        var interrupted: InterruptedException = null
        val out = futs.map { f =>
          try {
            // an interrupt of the CALLING thread must not abandon
            // legs mid-store-write (r19 ADVICE): remember it, keep
            // observing every remaining leg to completion, and
            // re-assert the interrupt after the walk — the
            // 'every leg runs to completion' contract holds on all
            // exits
            if (interrupted != null) Some(f.get())
            else
              try Some(f.get())
              catch {
                case ie: InterruptedException =>
                  interrupted = ie
                  Some(f.get()) // wait again, uninterrupted
              }
          } catch {
            case e: java.util.concurrent.ExecutionException =>
              if (firstFailure == null) firstFailure = e.getCause
              None
            case ie: InterruptedException =>
              // second interrupt while re-waiting: give up on THIS
              // leg's result but keep walking the rest
              if (interrupted == null) interrupted = ie
              None
          }
        }
        if (interrupted != null) {
          Thread.currentThread().interrupt()
          throw interrupted
        }
        if (firstFailure != null) throw firstFailure
        out.map(_.get)
      } finally { pool.shutdownNow(); () }
    }
}
