package graft.util

/** Submit independent EAGER Spark actions concurrently — the scheduler
  * happily runs several jobs at once inside one application; actions are
  * only sequential because driver code calls them sequentially (guide
  * §2.6 "overlap independent jobs"). Operators here materialize several
  * independent relations (per-pass key relations, per-side shingle
  * indexes) with eager localCheckpoints; issuing those from one thread
  * serializes the whole chain of per-job latencies. At cluster scale the
  * overlapped jobs back-fill executors freed by each other's stragglers;
  * at bench scale the wall time drops from Σ to ~max of the legs. */
object Par {

  /** Evaluate the thunks concurrently and return their results in input
    * order. NO-CANCEL semantics: a failing leg does not cancel its
    * siblings — every leg runs to completion (invokeAll), so a call site
    * whose legs WRITE to disk must gate any completion marker (stamp,
    * lineage) on Par.run returning, never inside a leg. The first
    * failure (in input order) propagates with every other leg's failure
    * attached via addSuppressed — no exception is silently dropped.
    * Pool threads are created at call time, so Spark's inheritable
    * thread-local properties (job group/description) propagate from the
    * caller into every leg. */
  def run[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      import scala.jdk.CollectionConverters._
      val futs = pool.invokeAll(thunks.map { t =>
        new java.util.concurrent.Callable[A] { def call(): A = t() }
      }.asJava)
      val results = futs.asScala.toSeq.map { f =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left(e.getCause)
        }
      }
      results.collectFirst { case Left(first) =>
        results.collect { case Left(e) if e ne first => e }
          .foreach(first.addSuppressed)
        throw first
      }
      results.collect { case Right(a) => a }
    } finally pool.shutdown()
  }
}
