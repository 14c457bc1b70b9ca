package graft

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames an operator persisted mid-plan (e.g. the shingle
  * stage inside Dedup.nearDupMinhash). Operators register the handle; the
  * harness (Verify/Bench) — or any long-lived session — calls releaseAll()
  * once the query's result is materialized, so repeated invocations never
  * accumulate cached blocks and spill files for the life of the context.
  *
  * CONTRACT: one query at a time. The registry is global JVM state —
  * releaseAll() unpersists EVERY registered frame, so two queries running
  * concurrently in one session would unpersist each other's in-flight
  * intermediates (silent recomputation, not wrong results). That matches
  * the sequential Verify/Bench harness this repo drives; a concurrent
  * caller must instead keep the handle an operator returns (pass
  * `cacheIntermediate = false` and persist/unpersist at the call site) so
  * cache lifetime is scoped per query, not per JVM.
  */
object Caches {
  private val handles = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Track a persisted frame; returns it for inline use. */
  def register(df: DataFrame): DataFrame = synchronized { handles += df; df }

  /** Unpersist (non-blocking) every tracked frame and clear the registry. */
  def releaseAll(): Unit = synchronized {
    handles.foreach(_.unpersist(false))
    handles.clear()
  }
}
