package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal persisted intermediates.
  *
  * Some operators persist a derived table that their (lazy) result keeps
  * referencing — e.g. the LSH band table self-joined for candidate
  * pairs, or the hashed token-set dimension joined twice. The operator
  * cannot unpersist it before returning (the caller has not acted yet),
  * and the caller cannot either (the table is internal). Left alone,
  * each call leaks one cached table per long-lived session.
  *
  * Contract: operators wrap such persists in [[tracked]]; any point that
  * knows the results are materialized (a pipeline run handle, a bench
  * harness between timed queries, a driver round boundary) calls
  * [[release]]. Releasing early is always safe — an unpersisted
  * intermediate is recomputed, never wrong.
  */
object Caches {
  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def tracked(df: DataFrame): DataFrame = {
    val p = df.persist()
    registered.add(p)
    p
  }

  def release(): Unit = {
    var df = registered.poll()
    while (df != null) { df.unpersist(false); df = registered.poll() }
  }
}
