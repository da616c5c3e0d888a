package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-strategy hints for DATA-DEPENDENT small frames — cluster
  * labels, candidate id sets, per-group keeper tables.
  *
  * An unconditional `broadcast()` on these is a scale hazard: on a
  * real web corpus, near-dup cluster MEMBERSHIP can be 30-50% of all
  * documents (the membership fraction is a property of the corpus, not
  * of the algorithm), and a forced broadcast of a corpus-fraction
  * frame OOMs the driver/executors instead of degrading to a shuffle
  * join. The fix is to make the assumption explicit and measured:
  * broadcast only when a cheap row count comes in under a tunable cap,
  * otherwise return the frame unhinted and let AQE pick the join
  * strategy from the sizes it observes at runtime.
  *
  * Call sites MUST pass a frame that is already materialized
  * (localCheckpoint/cache) or artifact-backed parquet, so the gating
  * count is a metadata read or cached scan — never a pipeline
  * recompute.
  *
  * Tunable: `spark.graft.broadcastRowCap` (rows). The default
  * 2,000,000 keeps a (long, long) label frame in the tens of MB —
  * comfortably broadcastable on any executor profile; deployments with
  * bigger driver/executor memory can raise it, skew-heavy corpora can
  * lower it.
  */
object Hints {
  val BroadcastRowCapKey = "spark.graft.broadcastRowCap"
  val DefaultBroadcastRowCap = 2000000L

  /** `broadcast(df)` iff `df.count()` ≤ the configured cap, else `df`
    * unhinted (AQE decides). Precondition: `df` is materialized or
    * artifact-backed, so the count is cheap.
    */
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val cap = df.sparkSession.conf
      .getOption(BroadcastRowCapKey)
      .map(_.toLong)
      .getOrElse(DefaultBroadcastRowCap)
    if (df.count() <= cap) broadcast(df) else df
  }
}
