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
          Option(hooks.remove(c)).foreach(_.forEach(h => h()))
      })
      new ConcurrentLinkedQueue[() => Unit]()
    })
    q.add(hook)
    () => { q.remove(hook): Unit }
  }
}
