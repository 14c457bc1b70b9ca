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

  /** Scoped lifecycle for long-lived sessions: frames registered while
    * `body` runs are unpersisted when it returns, without touching frames
    * registered outside the block (nesting-safe). The body MUST
    * materialize everything it needs (collect/write/count) — the returned
    * value may not hold a lazy plan over the scope's intermediates, or
    * re-evaluation recomputes them unpersisted (for prefixSumCdf that
    * also re-samples range bounds, which its pid-stability contract
    * forbids). Library callers who invoke exactQuantiles/valueCdf
    * repeatedly wrap each compute-and-materialize step here instead of
    * calling releaseAll() (which would clobber concurrent queries'
    * intermediates).
    */
  def scoped[T](body: => T): T = {
    val before = synchronized(handles.length)
    val out = body
    synchronized {
      // only this scope's suffix; an inner scope already removed its own
      handles.drop(before).foreach(_.unpersist(false))
      handles.remove(before, handles.length - before)
    }
    out
  }
}
