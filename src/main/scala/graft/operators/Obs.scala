package graft.operators

import org.apache.spark.sql.Observation

/** Uniquely-named [[Observation]] factory for iterative loops that read a
  * driver-side scalar off a materialization job instead of running a
  * second action for it (`Dataset.observe` plants a `CollectMetrics`
  * accumulator in the plan; the metric arrives with the job's completion
  * event, so reading it after an eager checkpoint costs nothing). Names
  * must be unique within a session's live listener set — a query can run
  * many times in one session (bench min-of-N), hence the sequence. */
private[operators] object Obs {
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  def apply(tag: String): Observation =
    new Observation(s"graft_${tag}_${seq.incrementAndGet()}")

  /** The observed long metric of an already-materialized plan — returns
    * without launching anything. */
  def long(obs: Observation, key: String): Long =
    obs.get(key) match {
      case l: java.lang.Long => l.longValue()
      case other => other.toString.toLong
    }
}
