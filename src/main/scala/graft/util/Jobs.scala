package graft.util

import org.apache.spark.SparkContext

/** Job-description labeling (guide §1.5) that RESTORES the caller's
  * previous description instead of clearing it: a labeled region inside
  * a Par leg or an outer labeled scope must not wipe the outer label
  * for the jobs that follow it (round-17 advisor note — the old
  * `finally setJobDescription(null)` pattern did exactly that). The
  * property is thread-local, so concurrent legs label independently. */
object Jobs {

  def labeled[A](sc: SparkContext, what: String)(body: => A): A = {
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(what)
    try body finally sc.setJobDescription(prev)
  }
}
