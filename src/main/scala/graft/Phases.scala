package graft

/** In-process phase-wall collector for queries whose single bench
  * wall hides a multi-phase lifecycle (q111: index build + N
  * micro-batch mark/append/sink rounds + checkpoint machinery).
  * Operators wrap their phases in [[time]]; Bench drains the buffer
  * after each query and embeds non-empty phase maps in the artifact,
  * so a slow driver-window figure decomposes from the JSON alone —
  * no clean-window rerun (the r9 q111 attribution gap).
  *
  * Deliberately dumb: an append-only concurrent queue of
  * (name, seconds), drained per query on the bench thread. Phases
  * recorded outside a bench run (Verify, tests) accumulate a few
  * tuples until the next drain — bounded by the tagged call sites,
  * not by data volume. */
object Phases {
  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]

  /** Record `body`'s wall seconds under `name`. */
  def time[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally buf.add(name -> (System.nanoTime() - t0) / 1e9)
  }

  /** Return and clear everything recorded since the last drain, in
    * record order. */
  def drain(): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    var e = buf.poll()
    while (e != null) { out += e; e = buf.poll() }
    out.toSeq
  }
}
