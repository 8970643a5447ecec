package graft.util

import org.apache.spark.sql.DataFrame

/** Stage-boundary materialization policy — every eager barrier in the
  * operators routes through here (`df.transform(Stage.materialize)`).
  *
  * Default: `localCheckpoint(eager = true)` — executor-local,
  * unreplicated blocks. Fastest, and correct at bench scale, but an
  * executor loss kills the job (no lineage behind the barrier) and it
  * is incompatible with dynamic allocation (guide §5). On clusters
  * where that matters, set `spark.graft.checkpoint.reliable=true` and a
  * `SparkContext.setCheckpointDir` target: the SAME barriers become
  * reliable checkpoints (HDFS/object-store blocks) with no call-site
  * change — the round-17 verdict's "policy switch" item. */
object Stage {

  def materialize(df: DataFrame): DataFrame = {
    val reliable = scala.util.Try(df.sparkSession.conf
      .get("spark.graft.checkpoint.reliable", "false").toBoolean)
      .getOrElse(false)
    if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
  }
}
