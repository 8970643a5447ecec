package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Driver-side parquet METADATA census helpers shared by the stored-
  * index health report ([[graft.operators.Similarity.indexHealth]]) and
  * the streaming store health report
  * ([[graft.streaming.StoreCompaction.storeHealth]]): row counts come
  * from the parquet FOOTERS (one bounded read per file), never a data
  * scan, and the per-file reads run on a bounded thread pool — they are
  * independent latency-bound metadata fetches, so a 10⁵-file store
  * reports in seconds. Driver-side only, for metadata-sized loops —
  * never data. */
private[graft] object ParquetMeta {

  /** Pool width for the footer census. */
  val CensusThreads: Int =
    math.min(32, Runtime.getRuntime.availableProcessors)

  /** Map `f` over `items` on a bounded thread pool, preserving order.
    * Exceptions from `f` re-throw unwrapped so by-name errors surface
    * by name. */
  def mapBounded[A, B](items: Seq[A], parallelism: Int = CensusThreads)
                      (f: A => B): Seq[B] =
    if (items.sizeIs <= 1 || parallelism <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, items.size))
      try {
        val futures = items.map(a => pool.submit(
          new java.util.concurrent.Callable[B] { def call(): B = f(a) }))
        try futures.map(_.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            // failure path: CANCEL the queued reads — plain shutdown()
            // would let them keep running on non-daemon threads after
            // the exception propagates, delaying the failure and holding
            // filesystem connections open
            pool.shutdownNow(): Unit
            throw e.getCause
        }
      } finally { pool.shutdown(): Unit }
    }

  /** Row count from the file's parquet footer — never a data read. */
  def footerRows(st: FileStatus, conf: Configuration): Long = {
    val rf = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
    try rf.getRecordCount finally rf.close()
  }

  /** Recursive listing of the parquet data files under `dir` (hidden
    * dirs — `_`/`.` prefixed, e.g. an in-flight `.compact_tmp` — are
    * skipped, matching Spark's partition discovery). */
  def parquetFiles(fs: FileSystem, dir: Path): Seq[FileStatus] =
    fs.listStatus(dir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) Nil
      else if (st.isDirectory) parquetFiles(fs, st.getPath)
      else if (name.endsWith(".parquet")) Seq(st)
      else Nil
    }
}
