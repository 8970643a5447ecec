package graft.util

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Application-end cleanup hooks, ONE SparkListener per SparkContext.
  *
  * The memoized build-once-query-many caches (Tpch cubes, the shared
  * shingle index) must not pin entries for the JVM lifetime when sessions
  * cycle. Registering an anonymous listener per cache entry leaked: the
  * listener stayed on the context's bus forever, even after the entry was
  * explicitly invalidated. Here a single listener per context drains a
  * removable hook queue, so eviction (`remove`) detaches the hook and the
  * bus never accumulates per-entry objects.
  */
object SessionCleanup {

  private val hooks =
    new ConcurrentHashMap[SparkContext, ConcurrentLinkedQueue[() => Unit]]()

  /** Run `hook` when the session's application ends. Returns a handle that
    * detaches the hook (call it from an explicit invalidate path). */
  def onApplicationEnd(session: SparkSession)(hook: () => Unit): () => Unit = {
    val sc = session.sparkContext
    val q = hooks.computeIfAbsent(sc, { c =>
      c.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          // poll-drain (not forEach): removal is atomic per hook, so the
          // late-registration path below can use q.remove as a
          // did-the-drain-already-run-it test without double-running.
          Option(hooks.remove(c)).foreach { queue =>
            var h = queue.poll()
            while (h != null) { h(); h = queue.poll() }
          }
      })
      new ConcurrentLinkedQueue[() => Unit]()
    })
    q.add(hook)
    // Race: application end between computeIfAbsent and q.add orphans the
    // queue — the hook would never run and its cache entry stays pinned for
    // the JVM lifetime. If the queue is no longer registered, run the hook
    // now (q.remove succeeding proves the drain didn't).
    if (hooks.get(sc) ne q) {
      if (q.remove(hook)) hook()
    }
    () => { q.remove(hook): Unit }
  }
}
