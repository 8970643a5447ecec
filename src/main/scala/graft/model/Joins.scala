package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Broadcast policy for dimension-side DataFrames.
  *
  * The star-schema assumption says dimensions are small, so the engine
  * prefers broadcast joins — but an unconditional `broadcast()` hint
  * FORCES the plan, and at 100 TB a monster dimension (billions of keys)
  * would OOM every executor. `maybeBroadcast` hints only when Catalyst's
  * size estimate is under the session's autoBroadcastJoinThreshold × a
  * slack factor; above it, the plan is left unhinted and Catalyst picks a
  * shuffle join (and AQE can still convert back to broadcast at runtime if
  * the real size turns out small — the safe default in both directions). */
object Joins {

  // Catalyst size estimates on derived (joined/dedup'd) plans overshoot
  // badly — the guard exists to stop multi-GB monster dimensions, not to
  // second-guess mid-size ones, so the cutoff is a wide multiple of the
  // configured threshold (default 10 MB × 16 = 160 MB estimated).
  private val Slack = 16L

  def maybeBroadcast(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      .replace("b", "").replace("B", "") match {
      case s if s.endsWith("k") || s.endsWith("K") => s.dropRight(1).toLong << 10
      case s if s.endsWith("m") || s.endsWith("M") => s.dropRight(1).toLong << 20
      case s if s.endsWith("g") || s.endsWith("G") => s.dropRight(1).toLong << 30
      case s => s.toLong
    }
    if (threshold <= 0) return df // broadcasting disabled
    // NOTE: reading stats analyzes+optimizes the dimension subplan on the
    // driver at composition time — acceptable for dimension-sized plans,
    // and the alternative (no guard) risks forced-broadcast OOM.
    val estimate =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }
    if (estimate <= BigInt(threshold) * Slack) broadcast(df) else df
  }
}
